"""Round-4 continuation ops: entity salience, temporal-KG validity /
snapshot, conversation canonical-text reassembly + near-dup."""

import math

from pyspark.sql import functions as F

from lamapi_spark.pipeline.convdedup import conv_canonical_text, conv_neardup_pairs
from lamapi_spark.pipeline.salience import entity_salience
from lamapi_spark.pipeline.tkg import kg_snapshot, triple_validity


def _occ(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, entity string")


class TestEntitySalience:
    def test_hand_computed(self, spark):
        # 2 convs; e1 only in conv a (tf 2, df 1), e2 in both (df 2 -> idf 0)
        occ = _occ(spark, [("a", "e1"), ("a", "e1"), ("a", "e2"),
                           ("b", "e2"), ("b", "e3")])
        out = {(r.conv_id, r.entity): r for r in
               entity_salience(occ, top_k=3).collect()}
        a_e1 = out[("a", "e1")]
        assert a_e1.rank == 1 and a_e1.tf == 2 and a_e1.df == 1
        assert a_e1.salience == round(2 * math.log(2 / 1), 6)
        # df == n_convs -> ln(1) = 0 salience, ranked below e1
        assert out[("a", "e2")].salience == 0.0
        assert out[("a", "e2")].rank == 2
        # conv b: e3 (idf ln2) outranks e2 (0)
        assert out[("b", "e3")].rank == 1
        assert out[("b", "e2")].rank == 2

    def test_tie_breaks_entity_asc_and_topk_cut(self, spark):
        # three entities with identical (tf, df) -> equal salience;
        # top_k=2 must keep the two lexicographically smallest
        occ = _occ(spark, [("a", "z"), ("a", "m"), ("a", "b"),
                           ("c", "q")])  # second conv so idf > 0
        got = entity_salience(occ, top_k=2).filter("conv_id = 'a'").collect()
        assert [(r.rank, r.entity) for r in
                sorted(got, key=lambda r: r.rank)] == [(1, "b"), (2, "m")]

    def test_partition_independent(self, spark):
        rows = [(f"c{i % 7}", f"e{(i * 3) % 11}") for i in range(200)]
        one = entity_salience(_occ(spark, rows).coalesce(1)).collect()
        many = entity_salience(_occ(spark, rows).repartition(13)).collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def _asserts(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts_us long, turn_idx long")


class TestTemporalKG:
    ROWS = [
        ("s", "p", "v1", 100, 1),
        ("s", "p", "v2", 200, 2),
        ("s", "p", "v2b", 200, 3),   # equal ts: tie column decides
        ("s", "p", "v3", 300, 4),
        ("s", "q", "w1", 150, 5),
    ]

    def test_validity_intervals(self, spark):
        out = {(r.subj, r.pred, r.obj): (r.valid_from_us, r.valid_to_us)
               for r in triple_validity(_asserts(spark, self.ROWS)).collect()}
        assert out[("s", "p", "v1")] == (100, 200)
        assert out[("s", "p", "v2")] == (200, 200)   # superseded same-ts
        assert out[("s", "p", "v2b")] == (200, 300)
        assert out[("s", "p", "v3")] == (300, None)  # still current
        assert out[("s", "q", "w1")] == (150, None)

    def test_snapshot_latest_wins_and_excludes_future(self, spark):
        a = _asserts(spark, self.ROWS)
        snap = {(r.subj, r.pred): (r.obj, r.asserted_us)
                for r in kg_snapshot(a, at_ts_us=250).collect()}
        # at T=250: v2b (ts 200, higher tie) beats v2; v3 (300) is future
        assert snap[("s", "p")] == ("v2b", 200)
        assert snap[("s", "q")] == ("w1", 150)
        assert len(snap) == 2
        # snapshot before any assertion of a key -> key absent
        early = kg_snapshot(a, at_ts_us=120).collect()
        assert {(r.subj, r.pred) for r in early} == {("s", "p")}

    def test_partition_independent(self, spark):
        a = _asserts(spark, self.ROWS)
        one = triple_validity(a.coalesce(1)).collect()
        many = triple_validity(a.repartition(8)).collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, many))

    def test_diff_all_three_change_kinds(self, spark):
        from lamapi_spark.pipeline.tkg import kg_diff

        mk = lambda rows: spark.createDataFrame(
            rows, "subj string, pred string, obj string")
        old = mk([("s", "p", "v1"), ("s", "q", "w"), ("t", "p", "x")])
        new = mk([("s", "p", "v2"), ("t", "p", "x"), ("u", "p", "y")])
        got = {(r.subj, r.pred): (r.old_obj, r.new_obj, r.change)
               for r in kg_diff(old, new).collect()}
        assert got == {
            ("s", "p"): ("v1", "v2", "changed"),
            ("s", "q"): ("w", None, "removed"),
            ("u", "p"): (None, "y", "added"),
        }  # (t, p) unchanged -> absent


class TestEntityProfile:
    def test_profile_fields_and_top_pred_tie(self, spark):
        from lamapi_spark.pipeline.tkg import entity_profile

        rows = [("s", "pz", "o", 100, 1), ("s", "pz", "o", 300, 2),
                ("s", "pa", "o", 200, 3), ("s", "pa", "o", 250, 4),
                ("s", "pq", "o", 50, 5),
                ("t", "p1", "o", 10, 6)]
        a = _asserts(spark, rows).repartition(5)
        out = {r.subj: r for r in entity_profile(a).collect()}
        s = out["s"]
        # pz and pa tie at cnt=2 -> lex-smallest pa wins
        assert (s.n_assertions, s.n_preds, s.first_us, s.last_us,
                s.top_pred) == (5, 3, 50, 300, "pa")
        t = out["t"]
        assert (t.n_assertions, t.n_preds, t.top_pred) == (1, 1, "p1")


class TestSegmentation:
    def test_boundaries_and_summary(self, spark):
        from lamapi_spark.pipeline.segments import (
            segment_summary, segment_turns)

        turns = [
            ("c", 1, "alpha beta gamma"),
            ("c", 2, "alpha beta delta"),      # J=2/4=0.5 -> same segment
            ("c", 3, "totally different words"),  # J=0 -> boundary
            ("c", 4, "different words again"),    # J=2/4=0.5 -> same
            ("d", 1, "solo"),
        ]
        df = spark.createDataFrame(
            turns, "conv_id string, turn_idx int, text string").repartition(4)
        seg = {(r.conv_id, r.turn_idx): (r.seg_id, r.sim_prev)
               for r in segment_turns(df, threshold=0.2).collect()}
        assert seg[("c", 1)] == (1, None)
        assert seg[("c", 2)][0] == 1 and seg[("c", 2)][1] == 0.5
        assert seg[("c", 3)] == (2, 0.0)
        assert seg[("c", 4)][0] == 2
        assert seg[("d", 1)] == (1, None)
        summ = {(r.conv_id, r.seg_id): (r.start_turn, r.end_turn, r.n_turns)
                for r in segment_summary(
                    segment_turns(df, threshold=0.2)).collect()}
        assert summ[("c", 1)] == (1, 2, 2)
        assert summ[("c", 2)] == (3, 4, 2)
        assert summ[("d", 1)] == (1, 1, 1)


class TestBfsDistances:
    def test_path_graph_min_distance_and_horizon(self, spark):
        from lamapi_spark.ops.graph import bfs_distances

        # a -> b -> c -> d -> e, plus a shortcut a -> c
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")],
            "src string, dst string")
        seeds = spark.createDataFrame([("a",)], "seed string")
        got = {r.node: r.dist
               for r in bfs_distances(edges, seeds, max_depth=2).collect()}
        # c is 2 hops via b but 1 via the shortcut -> min wins
        assert got == {"a": 0, "b": 1, "c": 1, "d": 2}  # e beyond horizon

    def test_multi_source_and_early_stop(self, spark):
        from lamapi_spark.ops.graph import bfs_distances

        edges = spark.createDataFrame(
            [("a", "b"), ("x", "y")], "src string, dst string")
        seeds = spark.createDataFrame([("a",), ("x",)], "seed string")
        got = {r.node: r.dist
               for r in bfs_distances(edges, seeds, max_depth=5).collect()}
        # frontier exhausts at depth 1; loop stops early, both islands labeled
        assert got == {"a": 0, "x": 0, "b": 1, "y": 1}


class TestVerbPatternTriples:
    def test_patterns_negatives_and_doubles(self, spark):
        from lamapi_spark.pipeline.triples import verb_pattern_triples

        texts = [
            ("c", 1, "c1 likes s2"),              # one triple
            ("c", 2, "c1 and s2 met today"),      # verb after both: none
            ("c", 3, "c1 visited s2 then s3"),    # double emission to s2, s3
            ("c", 4, "c1 c1 likes s2"),           # self-pair excluded
        ]
        rows = []
        for conv, turn, text in texts:
            for i, tok in enumerate(text.split()):
                rows.append((conv, turn, i + 1, tok,
                             tok if tok[0] in "cs" and tok[1:].isdigit()
                             else None))
        t = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, pos int, tok string, "
                  "entity string").repartition(6)
        got = {(r.turn_idx, r.subj, r.pred, r.obj)
               for r in verb_pattern_triples(
                   t, ("likes", "met", "visited")).collect()}
        assert got == {
            (1, "c1", "likes", "s2"),
            (3, "c1", "visited", "s2"), (3, "c1", "visited", "s3"),
            (4, "c1", "likes", "s2"),
        }
        # the zero-shuffle in-row formulation is set-equal to the
        # join formulation on the same input
        from lamapi_spark.pipeline.triples import verb_pattern_triples_inrow

        tr = spark.createDataFrame(
            [(c, t_, x) for c, t_, x in texts],
            "conv_id string, turn_idx int, text string")
        inrow = {(r.turn_idx, r.subj, r.pred, r.obj)
                 for r in verb_pattern_triples_inrow(
                     tr, ("likes", "met", "visited"),
                     "^[cs][0-9]+$").collect()}
        assert inrow == got


class TestSftPairs:
    def test_carry_skips_tools_and_staleness(self, spark):
        from lamapi_spark.pipeline.exports import sft_pairs

        rows = [
            ("c", 1, "user", "q1"),
            ("c", 2, "tool", "t"),          # skipped, not paired
            ("c", 3, "assistant", "a1"),    # pairs with q1 (2 back)
            ("c", 4, "assistant", "a2"),    # pairs with q1 (3 back)
            ("c", 5, "user", "q2"),
            ("c", 6, "assistant", "a3"),    # pairs with q2
            ("d", 1, "assistant", "cold"),  # no preceding user: dropped
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        got = {(r.conv_id, r.response_turn): (r.prompt_turn, r.prompt,
                                              r.response)
               for r in sft_pairs(df).collect()}
        assert got == {
            ("c", 3): (1, "q1", "a1"),
            ("c", 4): (1, "q1", "a2"),
            ("c", 6): (5, "q2", "a3"),
        }
        stale = {r.response_turn
                 for r in sft_pairs(df, max_turns_back=2).collect()}
        assert stale == {3, 6}  # a2 is 3 turns after q1 -> dropped


class TestStreamSftPairs:
    def test_stream_matches_batch(self, spark, tmp_path):
        """The streaming session-window SFT carry, drained with
        gap/watermark above the input's span, equals batch sft_pairs
        row for row — including the tool-skip and cold-start cases."""
        import shutil

        from lamapi_spark.pipeline.exports import sft_pairs
        from lamapi_spark.streaming.exports import stream_sft_pairs
        from lamapi_spark.streaming.sessions import run_available_now

        rows = [
            ("A", 1, "user", None, "q1"),
            ("A", 2, "tool", "search", "t"),
            ("A", 3, "assistant", None, "a1"),
            ("A", 4, "user", None, "q2"),
            ("A", 5, "assistant", None, "a2"),
            ("B", 1, "assistant", None, "cold"),
            ("B", 2, "user", None, "late"),
        ]
        tr = (spark.createDataFrame(
                  rows, "conv_id string, turn_idx int, role string, "
                        "tool string, text string")
              .withColumn("ts", F.timestamp_seconds(
                  F.lit(1700000000) + F.col("turn_idx") * 60)))
        d = str(tmp_path / "sft_feed")
        tr.write.parquet(d)
        got = run_available_now(
            stream_sft_pairs(spark, d, gap="2 hours", watermark="4 hours"),
            "t_sft_pairs", mode="complete")
        stream_rows = sorted(map(tuple, got.collect()))
        batch_rows = sorted(map(tuple, sft_pairs(tr.drop("ts")).collect()))
        assert stream_rows == batch_rows
        assert stream_rows == [("A", 1, 3, "q1", "a1"),
                               ("A", 4, 5, "q2", "a2")]
        shutil.rmtree(d, ignore_errors=True)


class TestPathPairs:
    def test_closure_bound_chain_and_attribute_hop(self, spark):
        from lamapi_spark.ops.graph import path_pairs

        # chain n1 -> n2 -> n3 -> n4 -> n5, names on all nodes
        edges = [(f"n{i}", "next", f"n{i+1}") for i in range(1, 5)]
        names = [(f"n{i}", "name", f"N{i}") for i in range(1, 6)]
        t = spark.createDataFrame(edges + names,
                                  "subj string, pred string, obj string")
        got = {(r.src, r.dst)
               for r in path_pairs(t, [("next", True), ("name", False)],
                                   max_depth=2).collect()}
        # next+ bounded at 2 hops: n1 reaches n2, n3 (not n4)
        assert got == {
            ("n1", "N2"), ("n1", "N3"),
            ("n2", "N3"), ("n2", "N4"),
            ("n3", "N4"), ("n3", "N5"),
            ("n4", "N5"),
        }

    def test_plain_steps_compose_and_dedup(self, spark):
        from lamapi_spark.ops.graph import path_pairs

        # diamond: a->b1->c, a->b2->c — set semantics collapse to one pair
        t = spark.createDataFrame(
            [("a", "p", "b1"), ("a", "p", "b2"),
             ("b1", "q", "c"), ("b2", "q", "c")],
            "subj string, pred string, obj string")
        got = [tuple(r) for r in
               path_pairs(t, [("p", False), ("q", False)]).collect()]
        assert got == [("a", "c")]


class TestMentionContexts:
    def test_windows_and_edges(self, spark):
        from lamapi_spark.pipeline.exports import mention_context_windows

        tr = spark.createDataFrame(
            [("c", 1, "e1 said hello to e2 yesterday")],
            "conv_id string, turn_idx int, text string")
        occ = spark.createDataFrame(
            [("c", 1, 1, "e1"), ("c", 1, 5, "e2")],
            "conv_id string, turn_idx int, pos int, entity string")
        got = {r.entity: (r.left_ctx, r.right_ctx)
               for r in mention_context_windows(tr, occ, window=3).collect()}
        assert got["e1"] == ("", "said hello to")      # turn start: empty left
        assert got["e2"] == ("said hello to", "yesterday")  # right truncates


class TestStreamSegmentTurns:
    def test_stream_matches_batch(self, spark, tmp_path):
        """The streaming in-array segmentation equals batch
        segment_turns row for row over the drained feed, including the
        null sim on first turns and the double similarity values."""
        import shutil

        from lamapi_spark.pipeline.segments import segment_turns
        from lamapi_spark.streaming.exports import stream_segment_turns
        from lamapi_spark.streaming.sessions import run_available_now

        rows = [
            ("c", 1, None, None, "alpha beta gamma"),
            ("c", 2, None, None, "alpha beta delta"),
            ("c", 3, None, None, "totally different words"),
            ("c", 4, None, None, "different words again"),
            ("d", 1, None, None, "solo"),
        ]
        tr = (spark.createDataFrame(
                  rows, "conv_id string, turn_idx int, role string, "
                        "tool string, text string")
              .withColumn("ts", F.timestamp_seconds(
                  F.lit(1700000000) + F.col("turn_idx") * 60)))
        d = str(tmp_path / "seg_feed")
        tr.write.parquet(d)
        got = run_available_now(
            stream_segment_turns(spark, d, threshold=0.2,
                                 gap="2 hours", watermark="4 hours"),
            "t_seg", mode="complete")
        stream_rows = sorted(map(tuple, got.collect()))
        batch_rows = sorted(map(tuple, segment_turns(
            tr.select("conv_id", "turn_idx", "text"),
            threshold=0.2).collect()))
        assert stream_rows == batch_rows
        assert len(stream_rows) == 5
        shutil.rmtree(d, ignore_errors=True)


class TestStreamKgState:
    def test_stream_matches_batch_snapshot(self, spark, tmp_path):
        """The live KG state (streaming/tkg.stream_kg_state) equals the
        batch kg_snapshot at T=infinity over the drained feed —
        max(struct) is commutative, so there is no arrival-order
        delta."""
        from lamapi_spark.queries_kg2 import _assertions
        from lamapi_spark.streaming.sessions import run_available_now
        from lamapi_spark.streaming.tkg import stream_kg_state

        a = _assertions(spark, "/root/testdata/sf0.001")
        d = str(tmp_path / "asserts")
        a.repartition(6).write.parquet(d)  # multi-file => multi-batch-ish feed
        got = run_available_now(stream_kg_state(spark, d), "t_kg_state",
                                mode="complete")
        stream_rows = {(r.subj, r.pred): (r.obj, r.asserted_us)
                       for r in got.collect()}
        batch_rows = {(r.subj, r.pred): (r.obj, r.asserted_us)
                      for r in kg_snapshot(
                          a, at_ts_us=2_000_000_000_000_000).collect()}
        assert stream_rows == batch_rows and len(batch_rows) > 0


class TestConvDedup:
    def test_reassembly_exact_and_order_invariant(self, spark):
        # multi-space text survives the split/join round-trip; rows
        # arrive shuffled across partitions
        turns = [("c1", 2, "world  twice"), ("c1", 1, "hello"),
                 ("c2", 1, "solo")]
        df = spark.createDataFrame(
            turns, "conv_id string, turn_idx int, text string").repartition(5)
        out = {r.conv_id: r.text for r in conv_canonical_text(df).collect()}
        assert out == {"c1": "hello world  twice", "c2": "solo"}

    def test_neardup_pairs_on_template_convs(self, spark):
        # twin conversations (same turns, different conv ids) pair at
        # hamming 0 even when their ROWS arrive in different orders; an
        # unrelated conversation pairs with neither. (The fuzzy-distance
        # arm is covered by the oracle-gated conv_neardup_pairs contract
        # query against the brute-force all-pairs oracle.)
        base = "alpha beta gamma delta epsilon zeta eta theta".split()
        rows = [("a", i + 1, " ".join(base[i * 4:(i + 1) * 4]))
                for i in range(2)]
        rows += [("b", i + 1, " ".join(base[i * 4:(i + 1) * 4]))
                 for i in (1, 0)]  # arrival order reversed
        rows += [("far", i + 1, " ".join("x%d" % (4 * i + j)
                                         for j in range(4)))
                 for i in range(2)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string").repartition(7)
        pairs = conv_neardup_pairs(df, max_hamming=3, n_bands=4,
                                   max_bucket=100).collect()
        assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {("a", "b", 0)}
