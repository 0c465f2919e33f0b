"""Round-4 continuation (session d): fact-support evidence aggregation,
link-score calibration, blocking-quality metrics, HyperBall-style
neighborhood function."""

from __future__ import annotations


def test_fact_support_hand_computed(spark):
    from lamapi_spark.pipeline.triples import fact_support

    ev = spark.createDataFrame(
        [
            # fact A: 3 assertions across 2 convs (c1 twice)
            ("c1", 5, "e1", "p1", "o1"),
            ("c1", 9, "e1", "p1", "o1"),
            ("c2", 1, "e1", "p1", "o1"),
            # fact B: single assertion
            ("c9", 7, "e2", "p1", "o1"),
        ],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    rows = {(r.subj, r.pred, r.obj): r for r in fact_support(ev).collect()}
    a = rows[("e1", "p1", "o1")]
    assert (a.support, a.n_convs) == (3, 2)
    # evidence pointers: struct-lexicographic min/max over (conv, turn)
    assert (a.first_conv, a.first_turn) == ("c1", 5)
    assert (a.last_conv, a.last_turn) == ("c2", 1)
    b = rows[("e2", "p1", "o1")]
    assert (b.support, b.n_convs) == (1, 1)
    assert (b.first_conv, b.first_turn) == ("c9", 7)
    assert (b.last_conv, b.last_turn) == ("c9", 7)


def test_calibration_bins_hand_computed(spark):
    from lamapi_spark.ops.metrics import calibration_bins

    scored = spark.createDataFrame(
        [(0.05, 0), (0.15, 0), (0.15, 1), (1.0, 1)],
        "score double, label int",
    )
    rows = {r.bin: r for r in calibration_bins(scored, n_bins=10).collect()}
    assert set(rows) == {0, 1, 9}  # 1.0 clamps into the top bin
    b0, b1, b9 = rows[0], rows[1], rows[9]
    assert (b0.n, b0.conf, b0.acc, b0.gap, b0.weight, b0.ece_contrib) == \
        (1, 0.05, 0.0, 0.05, 0.25, 0.0125)
    assert (b1.n, b1.conf, b1.acc, b1.gap, b1.weight, b1.ece_contrib) == \
        (2, 0.15, 0.5, 0.35, 0.5, 0.175)
    assert (b9.n, b9.conf, b9.acc, b9.gap, b9.ece_contrib) == \
        (1, 1.0, 1.0, 0.0, 0.0)
    # sum(ece_contrib) IS the ECE
    assert abs(sum(r.ece_contrib for r in rows.values()) - 0.1875) < 1e-12


def test_blocking_quality_hand_computed(spark):
    from lamapi_spark.ops.linkage import blocking_quality

    left = spark.createDataFrame(
        [("l1", "a"), ("l2", "a"), ("l3", "b"), ("l4", None)],
        "rid string, blk string")
    right = spark.createDataFrame(
        [("r1", "a"), ("r2", "b"), ("r3", "c"), ("r4", None)],
        "rid string, blk string")
    gold = spark.createDataFrame(
        [("l1", "r1"),   # covered (block a)
         ("l3", "r2"),   # covered (block b)
         ("l2", "r3"),   # both exist, different blocks -> missed
         ("l4", "r4"),   # null blocks never cover
         ("lx", "r1")],  # left id absent -> missed
        "id_l string, id_r string")
    row = blocking_quality(left, right, ("rid", "rid"), "blk", gold).head()
    # blocks: a -> 2*1, b -> 1*1; c has no left rows; nulls excluded
    assert (row.n_left, row.n_right, row.n_blocks) == (4, 4, 2)
    assert (row.cand_pairs, row.total_pairs) == (3, 16)
    assert (row.n_gold, row.gold_covered) == (5, 2)
    assert row.reduction_ratio == 0.8125
    assert row.pairs_completeness == 0.4
    assert row.pair_quality == round(2 / 3, 6)


def test_hyperball_equals_exact_ball_sketch(spark):
    """The radius-r fixpoint must be register-identical to sketching
    the EXACT r-ball member set (register max is idempotent)."""
    from lamapi_spark.ops.graph import hyperball
    from lamapi_spark.ops.sketches import hll_sketch

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    got = {r.node: r for r in hyperball(edges, radius=2, b=6).collect()}
    balls = {"a": ["a", "b", "c"], "b": ["b", "c", "d"],
             "c": ["c", "d"], "d": ["d"]}
    members = spark.createDataFrame(
        [(n, m) for n, ms in balls.items() for m in ms],
        "node string, member string")
    want = {r.node: r.regs
            for r in hll_sketch(members, ["node"], "member", b=6).collect()}
    assert set(got) == set(balls)
    for n in balls:
        assert got[n].regs == want[n], n
    # with <= 3 members and 64 registers, linear counting is near-exact
    for n, ms in balls.items():
        assert abs(got[n].est_distinct - len(ms)) < 0.2, n


def test_spearman_rho(spark):
    from lamapi_spark.ops.metrics import spearman_rho

    def rho_of(rows, n_buckets=4):
        df = spark.createDataFrame(rows, "k long, x double, y double")
        return spearman_rho(df, "k", "x", "y", n_buckets=n_buckets).head()

    # perfect agreement / perfect reversal
    up = [(i, float(i), float(i * 10)) for i in range(1, 9)]
    assert rho_of(up).rho == 1.0
    down = [(i, float(i), float(-i)) for i in range(1, 9)]
    assert rho_of(down).rho == -1.0
    # hand-computed: ranks x = 1,2,3,4 ; y-ranks = 2,1,3,4 -> d2 = 2
    # rho = 1 - 6*2 / (4*15) = 0.8
    r = rho_of([(1, 1.0, 5.0), (2, 2.0, 3.0), (3, 3.0, 7.0),
                (4, 4.0, 9.0)])
    assert (r.n, r.sum_d2, r.rho) == (4, 2.0, 0.8)
    # ties in x break by key: k=1 gets rank 1, k=2 rank 2 — matches y
    assert rho_of([(1, 5.0, 1.0), (2, 5.0, 2.0), (3, 6.0, 3.0)]).rho == 1.0
    # degenerate n=1 -> 0.0; bucket count larger than n still exact
    assert rho_of([(1, 2.0, 3.0)], n_buckets=1024).rho == 0.0


def test_label_model_vote(spark):
    from lamapi_spark.ops.classifier import label_model_vote

    votes = spark.createDataFrame(
        [(1, "a", "X"), (1, "b", "X"), (1, "c", "Y"),
         (2, "a", "Y"), (2, "c", "Z"),
         (3, "b", "X")],
        "item_id long, lf_id string, vote string")
    # gold: lf a is 2/2 correct (10000), b 1/2 (5000), c 0/2 (0)
    gold = spark.createDataFrame(
        [(1, "X"), (2, "Y"), (3, "Z")], "item_id long, label string")
    rows = {r.item_id: r for r in label_model_vote(votes, gold).collect()}
    r1 = rows[1]  # X: a+b = 15000, Y: c = 0
    assert (r1.label, r1.weight_bp, r1.n_votes, r1.n_lfs) == ("X", 15000, 2, 3)
    assert (r1.total_bp, r1.confidence_bp) == (15000, 10000)
    r2 = rows[2]  # Y: 10000 (a), Z: 0 (c)
    assert (r2.label, r2.weight_bp, r2.confidence_bp) == ("Y", 10000, 10000)
    r3 = rows[3]  # only b voted X with weight 5000
    assert (r3.label, r3.weight_bp, r3.n_lfs) == ("X", 5000, 1)

    # no gold -> pure majority at default weight; tie breaks to
    # lexicographically smallest label
    tie = spark.createDataFrame(
        [(9, "a", "B"), (9, "b", "A")], "item_id long, lf_id string, vote string")
    t = label_model_vote(tie).head()
    assert (t.label, t.weight_bp, t.total_bp) == ("A", 5000, 10000)

    # an LF with no gold overlap falls back to default_bp
    ng = spark.createDataFrame(
        [(7, "zz", "Q")], "item_id long, lf_id string, vote string")
    n = label_model_vote(ng, gold, default_bp=1234).head()
    assert (n.label, n.weight_bp) == ("Q", 1234)


def test_hyperball_harmonic_path_graph(spark):
    """On a -> b -> c -> d at radius 2: the per-radius snapshots are
    the exact-ball estimates, and the harmonic fold is the clamped
    radius-ordered sum of their deltas."""
    from lamapi_spark.ops.graph import hyperball_harmonic

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    rows = {r.node: r for r in hyperball_harmonic(edges, radius=2).collect()}
    for node, sizes in {"a": (1, 2, 3), "b": (1, 2, 3),
                        "c": (1, 2, 2), "d": (1, 1, 1)}.items():
        r = rows[node]
        assert [x.r for x in r.arr] == [0, 1, 2]
        ests = [x.est for x in r.arr]
        # linear counting at tiny cardinalities: near-exact ball sizes
        for est, true in zip(ests, sizes):
            assert abs(est - true) < 0.2, (node, est, true)
        want = max(ests[1] - ests[0], 0.0) / 1.0 \
            + max(ests[2] - ests[1], 0.0) / 2.0
        assert r.harmonic == want, node
    # d has an empty out-ball beyond itself
    assert rows["d"].harmonic == 0.0


def test_predicate_functionality(spark):
    from lamapi_spark.ops.graph import predicate_functionality

    t = spark.createDataFrame(
        [
            # p1: functional (each subj one obj) but obj shared
            ("s1", "p1", "x"), ("s2", "p1", "x"), ("s3", "p1", "y"),
            # duplicate assertion must not bias the counts
            ("s1", "p1", "x"),
            # p2: one subj, many objects -> inverse-functional
            ("s1", "p2", "a"), ("s1", "p2", "b"),
        ],
        "subj string, pred string, obj string")
    rows = {r.pred: r for r in predicate_functionality(t).collect()}
    p1 = rows["p1"]
    assert (p1.n_facts, p1.n_subj, p1.n_obj) == (3, 3, 2)
    assert (p1.functionality, p1.inv_functionality) == (1.0, round(2 / 3, 6))
    p2 = rows["p2"]
    assert (p2.n_facts, p2.n_subj, p2.n_obj) == (2, 1, 2)
    assert (p2.functionality, p2.inv_functionality) == (0.5, 1.0)


def test_hyperball_nf_path_graph(spark):
    """NF on a -> b -> c -> d: per-radius sums of the per-node ball
    estimates; last radius has frac 1.0."""
    from lamapi_spark.ops.graph import hyperball, hyperball_nf

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    rows = hyperball_nf(edges, radius=2).collect()
    assert [r.r for r in rows] == [0, 1, 2]
    # exact pair counts: r=0 -> 4 self, r=1 -> +3 edges, r=2 -> +2
    for r, true in zip(rows, (4, 7, 9)):
        assert abs(r.nf - true) < 0.5, (r.r, r.nf, true)
    assert rows[-1].frac == 1.0 and rows[-1].ge90
    assert rows[0].frac < 0.9 and not rows[0].ge90
    # NF(final) equals the sum of the final per-node estimates
    per_node = sum(x.est_distinct
                   for x in hyperball(edges, radius=2).collect())
    assert abs(rows[-1].nf - per_node) < 1e-9


def test_reciprocal_best_match(spark):
    from lamapi_spark.ops.linkage import reciprocal_best_match

    pairs = spark.createDataFrame(
        [
            # l1's best is r1 (9) and r1's best is l1 -> match
            ("l1", "r1", 9), ("l1", "r2", 5),
            # l2's best is r1 (8) but r1 prefers l1 -> NO match
            ("l2", "r1", 8),
            # l2-r2 mutual (l2: 8 vs 7 -> r1 wins... so l2 unmatched)
            ("l2", "r2", 7),
            # ties break to the smallest partner id on BOTH sides:
            # l3 -> r3 (r3 < r4); r4 -> l3 (l3 < l4), so l4-r4 is
            # NOT mutual even though r4 is l4's best
            ("l3", "r3", 4), ("l3", "r4", 4), ("l4", "r4", 4),
        ],
        "id_l string, id_r string, score_bp long")
    got = {(r.id_l, r.id_r): r.score_bp
           for r in reciprocal_best_match(pairs).collect()}
    assert got == {("l1", "r1"): 9, ("l3", "r3"): 4}
    # 1:1 property on each side
    ls = [k[0] for k in got]
    rs = [k[1] for k in got]
    assert len(ls) == len(set(ls)) and len(rs) == len(set(rs))


def test_bio_export(spark):
    from lamapi_spark.pipeline.exports import bio_export

    tr = spark.createDataFrame(
        [("A", 1, "Acme Corp hired Jane"), ("A", 2, "nothing here")],
        "conv_id string, turn_idx int, text string")
    m = spark.createDataFrame(
        [("A", 1, 1, 2),   # 'acme corp' -> B I
         ("A", 1, 4, 1)],  # 'jane' -> B
        "conv_id string, turn_idx int, start int, ntoken_span int")
    got = {(r.turn_idx, r.pos): (r.token, r.tag)
           for r in bio_export(tr, m).collect()}
    assert got[(1, 1)] == ("acme", "B")
    assert got[(1, 2)] == ("corp", "I")
    assert got[(1, 3)] == ("hired", "O")
    assert got[(1, 4)] == ("jane", "B")
    assert got[(2, 1)] == ("nothing", "O")
    assert len(got) == 6

    # overlapping spans: B wins over I on the shared token
    over = spark.createDataFrame(
        [("A", 1, 1, 2), ("A", 1, 2, 2)],
        "conv_id string, turn_idx int, start int, ntoken_span int")
    got2 = {r.pos: r.tag for r in bio_export(tr, over).collect()
            if r.turn_idx == 1}
    assert (got2[1], got2[2], got2[3]) == ("B", "B", "I")


def test_cohen_kappa(spark):
    from lamapi_spark.ops.metrics import cohen_kappa

    mk = lambda rows: spark.createDataFrame(rows, "k long, label string")
    # classic 2x2: a=(A,A,B,B), b=(A,B,B,B)
    a = mk([(1, "A"), (2, "A"), (3, "B"), (4, "B")])
    b = mk([(1, "A"), (2, "B"), (3, "B"), (4, "B")])
    r = cohen_kappa(a, b, ["k"]).head()
    # po = 3/4; pe = (2*1 + 2*3)/16 = 0.5 -> kappa = 0.5
    assert (r.n, r.agree, r.pe_num) == (4, 3, 8)
    assert r.kappa == 0.5
    # perfect agreement
    assert cohen_kappa(a, a, ["k"]).head().kappa == 1.0
    # constant identical annotators: pe = 1 -> degenerate 0.0
    c = mk([(1, "X"), (2, "X")])
    assert cohen_kappa(c, c, ["k"]).head().kappa == 0.0
    # inner-join: extra unmatched items do not count
    assert cohen_kappa(a, mk([(1, "A"), (9, "A")]), ["k"]).head().n == 1


def test_classification_report(spark):
    from lamapi_spark.ops.metrics import classification_report

    pred = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (5, "B")],
        "k long, label string")
    truth = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "B"), (4, "A")],
        "k long, label string")
    rows = {r["class"]: r
            for r in classification_report(pred, truth, ["k"]).collect()}
    a = rows["A"]
    # A: tp k1; fp k2 (truth B); fn k4 (unpredicted)
    assert (a.tp, a.fp, a.fn) == (1, 1, 1)
    assert (a.precision, a.recall, a.f1) == (0.5, 0.5, 0.5)
    b = rows["B"]
    # B: tp k3; fp k5 (no truth); fn k2
    assert (b.tp, b.fp, b.fn) == (1, 1, 1)
    m = rows["__macro__"]
    assert (m.tp, m.fp, m.fn) == (2, 2, 2)
    assert (m.precision, m.recall, m.f1) == (0.5, 0.5, 0.5)


def test_pr_curve_hand_computed(spark):
    from lamapi_spark.ops.metrics import pr_curve

    scored = spark.createDataFrame(
        [(0.95, 1), (0.85, 1), (0.75, 0), (0.65, 1), (0.55, 0),
         (0.05, 0)],
        "score double, label int")
    rows = pr_curve(scored, n_bins=10).collect()
    assert [r.threshold_bp for r in rows] == [9000, 8000, 7000, 6000,
                                              5000, 0]
    top = rows[0]  # only the 0.95 positive
    assert (top.n_at_or_above, top.pos_at_or_above) == (1, 1)
    assert (top.precision, top.recall) == (1.0, round(1 / 3, 6))
    mid = rows[3]  # >= 0.6: 4 rows, 3 positive
    assert (mid.n_at_or_above, mid.pos_at_or_above) == (4, 3)
    assert (mid.precision, mid.recall) == (0.75, 1.0)
    assert mid.f1 == round(2 * 3 / (4 + 3), 6)
    last = rows[-1]
    assert (last.n_at_or_above, last.recall) == (6, 1.0)


def test_ego_net_sample(spark):
    from lamapi_spark.ops.graph import ego_net_sample
    from lamapi_spark.ops.sketches import hash48

    import pyspark.sql.functions as F

    # star: s -> a, b, c, d (fanout 2 must pick the 2 smallest hashes);
    # a -> s (cycle back: pruned by visited); b -> e (hop 2)
    edges = spark.createDataFrame(
        [("s", x) for x in "abcd"] + [("a", "s"), ("b", "e")],
        "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "seed string")
    got = ego_net_sample(edges, seeds, hops=2, fanout=2).collect()
    hop1 = sorted((r.src, r.dst) for r in got if r.hop == 1)
    hop2 = sorted((r.src, r.dst) for r in got if r.hop == 2)
    # which two of a/b/c/d win is fixed by the md5 edge hash
    hs = {d: spark.range(1).select(F.lit(f"s|{d}").alias("c"))
          .select(hash48("c")).head()[0]
          for d in "abcd"}
    want = sorted(("s", d) for d in sorted("abcd", key=lambda d: hs[d])[:2])
    assert hop1 == want
    # hop 2 only expands sampled hop-1 nodes, never back into s
    sampled = {d for _, d in hop1}
    assert all(src in sampled for src, _ in hop2)
    assert ("a", "s") not in hop2
    if "b" in sampled:
        assert ("b", "e") in hop2
    # determinism: identical rerun
    again = ego_net_sample(edges, seeds, hops=2, fanout=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_corpus_report(spark):
    from lamapi_spark.ops.textstats import corpus_report

    docs = spark.createDataFrame(
        [("hello world",),      # 2 tokens
         ("hello world",),      # exact dup
         ("a@b.io ok!",),       # email + 4 regex tokens (a@b.io splits)
         ("",),                 # empty
         (None,)],              # null counts as empty
        "text string")
    got = {r.metric: r.value for r in corpus_report(docs).collect()}
    assert got["n_docs"] == 5.0
    assert got["empty_docs"] == 2.0
    assert got["pii_email_docs"] == 1.0
    # 5 docs, 4 distinct texts (null -> '' collides with the empty doc
    # in the md5 bucket: 'hello world', 'a@b.io ok!', '' -> 3 distinct)
    assert got["exact_dup_bp"] == ((5 - 3) * 10000 // 5) * 1.0
    # token mass: 2 + 2 + 6 + 0 + 0  ('a@b.io ok!' -> a @ b . io ok !
    # minus the joined pieces: regex (\w+|[^\w\s]) yields 7 tokens)
    assert got["regex_tokens"] == 2 + 2 + 7.0
    assert got["avg_tokens_bp"] == (11 * 10000 // 5) * 1.0


def test_verbalize_entities(spark):
    from lamapi_spark.pipeline.exports import verbalize_entities

    t = spark.createDataFrame(
        [("e1", "born", "1990"), ("e1", "cityOf", "rome"),
         ("e1", "worksAt", "acme"), ("e1", "likes", "tea"),
         ("e2", "born", "1980"),
         # duplicate fact collapses
         ("e2", "born", "1980")],
        "subj string, pred string, obj string")
    rows = {r.subj: r for r in verbalize_entities(t, k=3).collect()}
    e1 = rows["e1"]
    # k=3 of 4 facts, (pred, obj) lexicographic
    assert e1.n_facts == 4
    assert e1.text == "e1 born 1990; cityOf rome; likes tea"
    e2 = rows["e2"]
    assert (e2.n_facts, e2.text) == (1, "e2 born 1980")


def test_type_subsumption(spark):
    from lamapi_spark.ops.graph import type_subsumption

    et = spark.createDataFrame(
        [(f"e{i}", "person") for i in range(10)]
        + [(f"e{i}", "athlete") for i in range(4)]
        # synonym pair with identical extension: equal sizes -> no edge
        + [(f"e{i}", "sportsman") for i in range(4)]
        # duplicate assignment must not inflate counts
        + [("e0", "athlete")],
        "entity string, type string")
    got = {(r.sub_type, r.super_type): r
           for r in type_subsumption(et, min_sub_bp=9500,
                                     min_count=3).collect()}
    assert set(got) == {("athlete", "person"), ("sportsman", "person")}
    r = got[("athlete", "person")]
    assert (r.n_sub, r.n_super, r.common, r.sub_bp) == (4, 10, 4, 10000)
    # equal-extension aliases produce NO subsumption edge either way
    assert ("athlete", "sportsman") not in got
    assert ("sportsman", "athlete") not in got
    import datetime as dt

    from lamapi_spark.ops.temporal import funnel_analysis

    t = lambda m: dt.datetime(2024, 5, 1, 10, m)
    rows = [
        # u1 completes in order
        (1, "A", t(0)), (1, "B", t(5)), (1, "C", t(9)),
        # u2: B BEFORE A -> never chains past A
        (2, "B", t(0)), (2, "A", t(5)),
        # u3: A then B simultaneous with A -> strict > breaks the chain
        (3, "A", t(2)), (3, "B", t(2)),
        # u4: A then B, no C
        (4, "A", t(1)), (4, "B", t(3)),
        # u5: only C
        (5, "C", t(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.step_idx: r for r in
           funnel_analysis(df, ["A", "B", "C"]).collect()}
    assert (got[1].step, got[1].n_users, got[1].conv_bp) == ("A", 4, 10000)
    assert (got[2].n_users, got[2].conv_bp) == (2, 5000)  # u1, u4
    assert (got[3].n_users, got[3].conv_bp) == (1, 2500)  # u1 only


def test_cohort_retention(spark):
    import datetime as dt

    from lamapi_spark.ops.temporal import cohort_retention

    w = 86400 * 7
    t0 = dt.datetime(2024, 1, 4)  # mid-week anchor
    rows = [
        # u1: weeks 0, 1, 2 (twice in week 1 -> distinct grain)
        (1, t0), (1, t0 + dt.timedelta(days=7)),
        (1, t0 + dt.timedelta(days=8)), (1, t0 + dt.timedelta(days=14)),
        # u2: cohort week 0, returns week 2 only
        (2, t0), (2, t0 + dt.timedelta(days=14)),
        # u3: cohort week 1, never returns
        (3, t0 + dt.timedelta(days=7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort, r.week_offset): r
           for r in cohort_retention(df, bin_s=w).collect()}
    cohorts = {c for c, _ in got}
    assert len(cohorts) == 2
    c0 = min(cohorts)
    assert got[(c0, 0)].retained == 2 and got[(c0, 0)].retained_bp == 10000
    assert got[(c0, 1)].retained == 1 and got[(c0, 1)].retained_bp == 5000
    assert got[(c0, 2)].retained == 2  # both week-0 users return wk2
    c1 = max(cohorts)
    assert got[(c1, 0)].cohort_size == 1 and (c1, 1) not in got
    from lamapi_spark.ops.metrics import gini_concentration

    def gini(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "k long, v double")
        return gini_concentration(df, "k", "v", n_buckets=8).head()

    # perfect equality -> 0; ties must not perturb it
    assert gini([5, 5, 5, 5]).gini == 0.0
    # total concentration in one of n: G = (n-1)/n
    r = gini([0, 0, 0, 10])
    assert (r.n, r.total, r.gini) == (4, 10.0, 0.75)
    # hand case [1, 3]: G = 2*(1*1+2*3)/(2*4) - 3/2 = 0.25
    assert gini([1, 3]).gini == 0.25
    # degenerate single row
    assert gini([7]).gini == 0.0
    import datetime as dt

    from lamapi_spark.ops.temporal import burst_detection

    base = dt.datetime(2024, 3, 1)
    rows = []
    # steady 2/day for days 0..4, then 6 on day 5 (3x), gap day 6,
    # 1 on day 7 (post-gap, below factor vs trailing)
    for d in range(5):
        rows += [("k", base + dt.timedelta(days=d, hours=h))
                 for h in (1, 2)]
    rows += [("k", base + dt.timedelta(days=5, hours=h))
             for h in range(6)]
    rows += [("k", base + dt.timedelta(days=7, hours=1))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r.bin - 19783: r for r in burst_detection(
        df, trail_bins=7, factor_bp=20000, min_prev_bins=3).collect()}
    assert len(got) == 8  # dense grid incl. the empty day 6
    d5 = got[5]
    assert (d5.cnt, d5.prev_sum, d5.n_prev, d5.burst) == (6, 10, 5, True)
    assert got[6].cnt == 0 and not got[6].burst  # empty bin never bursts
    d7 = got[7]  # 1 * 10000 * 7 < 20000 * 16
    assert (d7.cnt, d7.prev_sum, d7.burst) == (1, 16, False)
    # first bins lack history: n_prev < 3 -> never burst
    assert not got[0].burst and not got[1].burst and not got[2].burst


def test_predicate_overlap(spark):
    from lamapi_spark.ops.graph import predicate_overlap

    t = spark.createDataFrame(
        [("a", "worksAt", "x"), ("b", "worksAt", "y"),
         ("c", "worksAt", "z"),
         ("a", "employedBy", "x"), ("b", "employedBy", "y"),
         ("q", "employedBy", "w"),
         # unrelated predicate, one shared pair only
         ("a", "visited", "x"),
         # duplicate assertion must not inflate common
         ("a", "worksAt", "x")],
        "subj string, pred string, obj string")
    got = {(r.p, r.r): r
           for r in predicate_overlap(t, min_common=2).collect()}
    assert set(got) == {("employedBy", "worksAt")}
    r = got[("employedBy", "worksAt")]
    # common 2, sizes 3/3 -> jaccard 2/4 = 5000bp
    assert (r.common, r.n_p, r.n_r, r.jaccard_bp) == (2, 3, 3, 5000)
    # the bp gate excludes the pair when raised above its value
    assert predicate_overlap(t, min_common=2,
                             min_jaccard_bp=5001).count() == 0


def test_k_truss(spark):
    import itertools

    import pytest

    from lamapi_spark.ops.graph import k_truss

    # bowtie: triangles abc + acd sharing edge ac, plus pendant d-e
    bow = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("a", "d"),
         ("d", "e")],
        "src string, dst string")
    t3 = {(r.a, r.b): r.support for r in k_truss(bow, k=3).collect()}
    # 3-truss: both triangles survive, pendant drops; ac closes 2
    assert set(t3) == {("a", "b"), ("b", "c"), ("a", "c"),
                       ("c", "d"), ("a", "d")}
    assert t3[("a", "c")] == 2 and t3[("a", "b")] == 1
    # 4-truss: the shared edge alone cannot sustain itself -> empty
    assert k_truss(bow, k=4).count() == 0

    # K5 is its own 5-truss: every edge closes 3 triangles
    k5 = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations("vwxyz", 2)],
        "src string, dst string")
    t5 = k_truss(k5, k=5).collect()
    assert len(t5) == 10 and all(r.support == 3 for r in t5)

    with pytest.raises(ValueError):
        k_truss(bow, k=2)


def test_pii_pseudonyms(spark):
    from lamapi_spark.ops.textstats import pii_pseudonyms

    tr = spark.createDataFrame(
        [
            ("A", 1, "mail a@x.com then b@y.org ok"),
            ("A", 2, "again a@x.com and 10.0.0.1"),
            ("B", 1, "only c@z.io here"),
        ],
        "conv_id string, turn_idx int, text string")
    rows = {(r.key, r.kind, r.value): r for r in pii_pseudonyms(tr).collect()}
    # first-occurrence order within (conv, kind); repeats keep ONE id
    assert rows[("A", "email", "a@x.com")].pseudo == "EMAIL_1"
    assert rows[("A", "email", "b@y.org")].pseudo == "EMAIL_2"
    assert rows[("A", "email", "a@x.com")].first_order == 1
    assert rows[("A", "ipv4", "10.0.0.1")].pseudo == "IPV4_1"
    # numbering restarts per conversation
    assert rows[("B", "email", "c@z.io")].pseudo == "EMAIL_1"
    assert len(rows) == 4


def test_cardinality_violations(spark):
    from lamapi_spark.ops.graph import cardinality_violations

    t = spark.createDataFrame(
        # born: 10 clean subjects + one double -> quasi-functional
        [(f"s{i}", "born", f"y{i}") for i in range(10)]
        + [("s3", "born", "x1800")]
        # likes: 2 subjects, 10 objects -> NOT functional, never gated
        + [(f"h{i % 2}", "likes", f"o{i}") for i in range(10)],
        "subj string, pred string, obj string")
    got = cardinality_violations(t, min_functionality_bp=9000,
                                 min_facts=10).collect()
    assert len(got) == 1
    v = got[0]
    assert (v.pred, v.subj, v.n_objects) == ("born", "s3", 2)
    assert (v.obj_a, v.obj_b) == ("x1800", "y3")
    # raising min_facts above the born fact count disables the gate
    assert cardinality_violations(t, min_facts=12).count() == 0


def test_retrieval_eval_hand_computed(spark):
    import math

    from lamapi_spark.ops.metrics import retrieval_eval

    ranked = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "x", 1), ("q2", "y", 2)],
        "query_id string, doc_id string, rk long")
    qrels = spark.createDataFrame(
        [("q1", "b", 2), ("q1", "c", 1), ("q1", "zz", 3)],
        "query_id string, doc_id string, grade int")
    rows = {r.query_id: r for r in
            retrieval_eval(ranked, qrels, k=10).collect()}
    q1 = rows["q1"]
    assert (q1.n_ret, q1.n_judged, q1.hits) == (3, 3, 2)
    assert q1.rr == 0.5  # first relevant at rank 2
    assert q1.p_at_k == 0.2 and q1.r_at_k == round(2 / 3, 6)
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert q1.dcg == round(dcg, 6)
    assert q1.idcg == round(idcg, 6)
    assert abs(q1.ndcg - dcg / idcg) < 1e-6
    # unjudged query degrades to zeros
    q2 = rows["q2"]
    assert (q2.n_judged, q2.hits, q2.rr, q2.idcg, q2.ndcg) == \
        (0, 0, 0.0, 0.0, 0.0)


def test_mine_horn_rules_hand_kg(spark):
    from lamapi_spark.ops.graph import mine_horn_rules

    t = spark.createDataFrame(
        [
            # marriedTo(x,y) & livesIn(y,z) => livesIn(x,z): 2/2 hold
            ("a", "marriedTo", "b"), ("b", "livesIn", "rome"),
            ("a", "livesIn", "rome"),
            ("c", "marriedTo", "d"), ("d", "livesIn", "oslo"),
            ("c", "livesIn", "oslo"),
            # a third marriage with NO shared city: body-only pair
            ("e", "marriedTo", "g"), ("g", "livesIn", "kyiv"),
            # duplicate assertion must not inflate counts
            ("a", "marriedTo", "b"),
        ],
        "subj string, pred string, obj string")
    got = {(r.rule, r.p, r.q, r.r): r
           for r in mine_horn_rules(t, min_support=2,
                                    min_conf_bp=5000).collect()}
    key = ("p(x,y) & q(y,z) => r(x,z)", "marriedTo", "livesIn", "livesIn")
    assert key in got
    r = got[key]
    # bodies: (a,rome), (c,oslo), (e,kyiv); heads exist for 2 of 3
    assert (r.support, r.body_n, r.conf_bp) == (2, 3, 6666)
    # no length-1 rule reaches support 2 here
    assert all(k[0].startswith("p(x,y) &") for k in got)

    # hub guard: with max_fanout 0 every join entity drops -> no chains
    none = mine_horn_rules(t, min_support=1, min_conf_bp=0,
                           max_fanout=0).collect()
    assert all(r.rule == "p(x,y) => r(x,y)" for r in none)


def test_apply_horn_rules_predicts_missing_heads(spark):
    from lamapi_spark.ops.graph import apply_horn_rules, mine_horn_rules

    t = spark.createDataFrame(
        [
            ("a", "marriedTo", "b"), ("b", "livesIn", "rome"),
            ("a", "livesIn", "rome"),
            ("c", "marriedTo", "d"), ("d", "livesIn", "oslo"),
            ("c", "livesIn", "oslo"),
            # body holds, head missing -> THE prediction
            ("e", "marriedTo", "g"), ("g", "livesIn", "kyiv"),
        ],
        "subj string, pred string, obj string")
    rules = mine_horn_rules(t, min_support=2, min_conf_bp=5000)
    got = apply_horn_rules(t, rules).collect()
    assert len(got) == 1
    p = got[0]
    assert (p.subj, p.pred, p.obj) == ("e", "livesIn", "kyiv")
    assert (p.conf_bp, p.n_rules) == (6666, 1)
    # already-known facts are never re-predicted
    assert not any(r.subj == "a" for r in got)


def test_conv_role_audit(spark):
    from lamapi_spark.pipeline.exports import conv_role_audit

    tr = spark.createDataFrame(
        [
            # A: clean user/assistant alternation
            ("A", 1, "user"), ("A", 2, "assistant"),
            ("A", 3, "user"), ("A", 4, "assistant"),
            # B: double assistant + assistant-first
            ("B", 1, "assistant"), ("B", 2, "assistant"), ("B", 3, "user"),
            # C: single user turn, no assistant
            ("C", 1, "user"),
            # D: tool turn breaks nothing if roles still alternate
            ("D", 1, "user"), ("D", 2, "tool"), ("D", 3, "assistant"),
        ],
        "conv_id string, turn_idx int, role string")
    rows = {r.conv_id: r for r in conv_role_audit(tr).collect()}
    a = rows["A"]
    assert (a.n_turns, a.n_user, a.n_assistant, a.n_other) == (4, 2, 2, 0)
    assert (a.n_same_role_adj, a.starts_user, a.ends_assistant, a.ok) == \
        (0, True, True, True)
    b = rows["B"]
    assert (b.n_same_role_adj, b.starts_user, b.ok) == (1, False, False)
    c = rows["C"]
    assert (c.n_turns, c.n_assistant, c.n_same_role_adj, c.ok) == \
        (1, 0, 0, False)
    d = rows["D"]
    assert (d.n_other, d.n_same_role_adj, d.ok) == (1, 0, True)


def test_conv_textrank_central_turn_wins(spark):
    """A turn similar to TWO others outranks turns similar to one;
    isolated turns and isolated conversations emit nothing."""
    from lamapi_spark.pipeline.salience import conv_textrank

    tr = spark.createDataFrame(
        [
            # conv A: hub turn 2 shares tokens with 1 and 3; 1 and 3
            # share nothing; turn 4 is isolated
            ("A", 1, "alpha beta gamma"),
            ("A", 2, "alpha beta delta epsilon"),
            ("A", 3, "delta epsilon zeta"),
            ("A", 4, "totally unrelated words"),
            # conv B: all turns pairwise dissimilar -> no edges at all
            ("B", 1, "one thing"),
            ("B", 2, "another matter"),
        ],
        "conv_id string, turn_idx int, text string")
    got = conv_textrank(tr, top_k=2, min_jaccard_bp=2000).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert "B" not in by_conv
    a = sorted(by_conv["A"], key=lambda r: r.rk)
    assert [r.turn_idx for r in a] == [2, 1]  # hub first; tie 1<3 by idx
    assert a[0].rank_units > a[1].rank_units
    # turn 4 never entered the graph
    assert all(r.turn_idx != 4 for r in a)


def test_stream_fact_support_matches_batch(spark, tmp_path):
    """Per-window streaming fact support == batch fact_support per
    window; facts split across windows do NOT pool."""
    import datetime as dt
    import shutil

    from lamapi_spark.pipeline.triples import fact_support
    from lamapi_spark.streaming.kg import (
        ASSERTION_SCHEMA, stream_fact_support,
    )
    from lamapi_spark.streaming.sessions import run_available_now

    d1 = dt.datetime(2026, 1, 1, 9, 0)
    d2 = dt.datetime(2026, 1, 2, 9, 0)
    rows = [
        ("c1", 5, "e1", "p1", "o1", d1),
        ("c1", 9, "e1", "p1", "o1", d1),
        ("c2", 1, "e1", "p1", "o1", d1),
        ("c9", 7, "e2", "p1", "o1", d1),
        # same fact again on day 2 -> its OWN window row
        ("c3", 2, "e1", "p1", "o1", d2),
    ]
    path = str(tmp_path / "assert_feed")
    spark.createDataFrame(rows, ASSERTION_SCHEMA) \
        .repartition(2).write.parquet(path)
    flush = spark.createDataFrame(
        [("conv-flush", 0, "zz", "pz", "oz", dt.datetime(2027, 1, 1))],
        ASSERTION_SCHEMA)
    flush.coalesce(1).write.mode("append").parquet(path)

    got = run_available_now(
        stream_fact_support(spark, path, window="1 day",
                            watermark="10 minutes"),
        "t_stream_fact_support", mode="append")
    got_set = {tuple(r) for r in got.collect()}

    def batch_day(day):
        b = spark.createDataFrame(
            [r for r in rows if r[5].date() == day.date()],
            ASSERTION_SCHEMA)
        return {(day.replace(hour=0),) + tuple(r)
                for r in fact_support(b.drop("ts")).collect()}

    want = batch_day(d1) | batch_day(d2)
    assert got_set == want
    # the day-1 multi-conversation fact kept its audit pointers
    assert (d1.replace(hour=0), "e1", "p1", "o1", 3, 2,
            "c1", 5, "c2", 1) in got_set
    shutil.rmtree(path, ignore_errors=True)
