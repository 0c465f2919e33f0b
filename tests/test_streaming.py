"""Structured Streaming twins agree with their batch counterparts."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lamapi_spark.streaming import stream_sessionize, stream_text_stats
from lamapi_spark.streaming.sessions import run_available_now


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = tmp_path_factory.mktemp("stream") / "events"
    src.withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(str(d))
    return str(d)


def test_stream_sessionize_matches_batch(spark, events_dir):
    got = run_available_now(
        stream_sessionize(spark, events_dir, gap="30 minutes"),
        "t_sessions", mode="complete")
    stream_counts = {
        r.user_id: r.n for r in
        got.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    # batch twin: the sessionize_events gaps-and-islands query
    from lamapi_spark.queries import queries
    batch = {r.user_id: r.n_sessions for r in
             queries()["sessionize_events"](spark, "/root/testdata/sf0.001").collect()}
    assert stream_counts == batch
    # session windows never overlap per user and each holds >= 1 event
    rows = got.collect()
    assert all(r.n_events >= 1 for r in rows)
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """The streaming dedup keeps exactly one row per distinct content
    hash over the drained input, and its hash set equals the batch
    exact_dedup's. (The surviving doc_id is arrival-order-dependent —
    batch pins min(id) — so only the hash set is the invariant.)"""
    from lamapi_spark.ops.dedup import exact_dedup
    from lamapi_spark.streaming.dedup import stream_exact_dedup

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # duplicate some docs so dedup has real work, synthesize event time
    feed = (
        src.select("doc_id", "text")
        .unionAll(src.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
                  .filter(F.col("doc_id") % 3 == 0))
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600))
    )
    d = str(tmp_path / "docs_dedup")
    feed.write.parquet(d)

    got = run_available_now(stream_exact_dedup(spark, d), "t_dedup", mode="append")
    rows = got.collect()
    hashes = [r.content_hash for r in rows]
    assert len(hashes) == len(set(hashes))  # exactly one row per hash
    batch_hashes = {r.content_hash
                    for r in exact_dedup(feed, "text", "doc_id").collect()}
    assert set(hashes) == batch_hashes and len(batch_hashes) > 0
    shutil.rmtree(d, ignore_errors=True)


def test_stream_text_stats_matches_batch(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "docs")
    src.select("doc_id", "text").write.parquet(d)
    got = run_available_now(
        stream_text_stats(spark, d), "t_textstats", mode="append")
    g = {r.doc_id: (r.lang_pred, r.n_chars, r.ws_tokens) for r in got.collect()}
    from lamapi_spark.ops.textstats import lang_id, quality_features, token_counts
    q = quality_features(F.col("text"))
    tc = token_counts(F.col("text"))
    want = {r.doc_id: (r.lang_pred, r.n_chars, r.ws_tokens) for r in src.select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred"),
        q["n_chars"].alias("n_chars"), tc["ws_tokens"].alias("ws_tokens"),
    ).collect()}
    assert g == want and len(g) == src.count()
    shutil.rmtree(d, ignore_errors=True)


def test_stream_simhash_pairs_matches_batch(spark, tmp_path):
    """The streaming SimHash pairing twin: over an input slice whose
    event times all fall inside the horizon, the emitted (pair, hamming)
    set equals batch simhash_pairs exactly (banding + hash expressions
    are shared; only the candidate join changes shape)."""
    from lamapi_spark.ops.dedup import simhash_pairs
    from lamapi_spark.streaming.dedup import stream_simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a very long tune about data pipelines and shuffle "
            "partitions in a distributed engine")
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, base.replace("quick", "slow").replace("tune", "song")),
        (4, "completely different text about cooking pasta with garlic "
            "and butter in a large pan on slow heat for dinner"),
        (5, "completely different text about cooking pasta with garlic "
            "and butter in a large pan on high heat for dinner"),
        (6, "unrelated short note"),
    ]
    feed = (spark.createDataFrame(rows, "doc_id bigint, text string")
            .withColumn("ts", F.timestamp_seconds(
                F.lit(1700000000) + F.col("doc_id") * 60)))
    d = str(tmp_path / "docs_simhash")
    feed.write.parquet(d)

    got = run_available_now(stream_simhash_pairs(spark, d),
                            "t_simhash_pairs", mode="append")
    gotd = {(r.id_a, r.id_b): r.hamming for r in got.collect()}
    want = {(r.id_a, r.id_b): r.hamming
            for r in simhash_pairs(feed, "doc_id", "text").collect()}
    assert gotd == want and len(want) > 0
    assert gotd[(0, 1)] == 0  # exact dup at distance 0
    shutil.rmtree(d, ignore_errors=True)


def test_stream_minhash_pairs_matches_batch(spark, tmp_path):
    """The streaming MinHash+LSH pairing twin: over an input slice whose
    event times all fall inside the horizon, the emitted
    (pair, sig_agree) set equals batch minhash_lsh_pairs exactly
    (shingling, signature, and band keys are shared column expressions;
    only the candidate join changes shape)."""
    from lamapi_spark.ops.dedup import minhash_lsh_pairs
    from lamapi_spark.streaming.dedup import stream_minhash_pairs

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a very long tune about data pipelines and shuffle "
            "partitions in a distributed engine")
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, base.replace("quick", "slow").replace("tune", "song")),
        (4, "completely different text about cooking pasta with garlic "
            "and butter in a large pan on slow heat for dinner"),
        (5, "completely different text about cooking pasta with garlic "
            "and butter in a large pan on high heat for dinner"),
        (6, "unrelated short note"),
    ]
    feed = (spark.createDataFrame(rows, "doc_id bigint, text string")
            .withColumn("ts", F.timestamp_seconds(
                F.lit(1700000000) + F.col("doc_id") * 60)))
    d = str(tmp_path / "docs_minhash")
    feed.write.parquet(d)

    got = run_available_now(stream_minhash_pairs(spark, d),
                            "t_minhash_pairs", mode="append")
    gotd = {(r.id_a, r.id_b): r.sig_agree for r in got.collect()}
    want = {(r.id_a, r.id_b): r.sig_agree
            for r in minhash_lsh_pairs(feed, "doc_id", "text").collect()}
    assert gotd == want and len(want) > 0
    assert gotd[(0, 1)] == 1.0  # exact dup agrees on every minhash


def test_stream_asof_join_matches_batch(spark, tmp_path):
    """The streaming as-of (stateless stream-static join against the
    per-key sorted state table) is ROW-FOR-ROW equal to the batch
    asof_join on the same probes — same events-derived fixture as the
    events_asof_state contract query."""
    from lamapi_spark.ops.temporal import asof_join
    from lamapi_spark.streaming.temporal import asof_state_table, stream_asof_join

    e = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
         .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp"))))
    views = (e.filter(F.col("event_type") == "view")
             .groupBy("user_id", "ts_us")
             .agg(F.max(F.struct("event_id", "value"))["value"].alias("value")))
    clicks = e.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts_us")
    d = str(tmp_path / "clicks")
    clicks.write.parquet(d)

    state = asof_state_table(views, key="user_id")
    probes = spark.readStream.schema(
        "event_id bigint, user_id bigint, ts_us bigint").parquet(d)
    got = run_available_now(
        stream_asof_join(probes, state, key="user_id"),
        "t_asof", mode="append")
    g = {r.event_id: (r.asof_ts, r.asof_value) for r in got.collect()}
    want = {r.event_id: (r.asof_ts, r.asof_value)
            for r in asof_join(clicks, views, key="user_id").collect()}
    assert g == want and len(g) == clicks.count()
    # tolerance arm agrees too (batch semantics: age > tol -> null)
    got_t = stream_asof_join(clicks, state, key="user_id",
                             tolerance_us=60_000_000)
    want_t = asof_join(clicks, views, key="user_id",
                       tolerance_us=60_000_000)
    assert ({r.event_id: (r.asof_ts, r.asof_value) for r in got_t.collect()}
            == {r.event_id: (r.asof_ts, r.asof_value) for r in want_t.collect()})
    shutil.rmtree(d, ignore_errors=True)


def test_asof_state_table_retention(spark):
    """max_versions keeps the NEWEST n versions; probes older than the
    retained horizon degrade to null (the serve-vs-backfill delta)."""
    from lamapi_spark.streaming.temporal import asof_state_table, stream_asof_join

    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 30, 3.0)],
        "k string, ts_us long, value double")
    probes = spark.createDataFrame(
        [(1, "a", 15), (2, "a", 35)], "id long, k string, ts_us long")
    state = asof_state_table(right, key="k", max_versions=2)  # keeps 20, 30
    out = {r.id: (r.asof_ts, r.asof_value)
           for r in stream_asof_join(probes, state, key="k").collect()}
    assert out[1] == (None, None)   # ts=15 predates the retained horizon
    assert out[2] == (30, 3.0)


def test_stream_latest_state_matches_batch(spark, events_dir):
    """The streaming CDC snapshot equals the batch events_latest_state
    row for row over the drained feed — max(struct) is commutative, so
    there is no arrival-order delta (unlike the dedup twin)."""
    from lamapi_spark.queries import queries
    from lamapi_spark.streaming.temporal import stream_latest_state

    got = run_available_now(
        stream_latest_state(spark, events_dir), "t_latest", mode="complete")
    stream_rows = {(r.user_id, r.event_type):
                   (r.last_ts_us, r.last_event_id, r.last_value)
                   for r in got.collect()}
    batch_rows = {(r.user_id, r.event_type):
                  (r.last_ts_us, r.last_event_id, r.last_value)
                  for r in queries()["events_latest_state"](
                      spark, "/root/testdata/sf0.001").collect()}
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_stream_dsir_score_matches_batch(spark, tmp_path):
    """The stateless streaming DSIR scorer (offline model -> in-array
    micro-unit sum) equals the batch dsir_importance row for row —
    including the final double, because the /1e6 is one correctly
    rounded IEEE division of the same exact integer sum the batch
    DECIMAL path holds."""
    import shutil

    from lamapi_spark.ops.corpus import dsir_importance, dsir_model
    from lamapi_spark.streaming.corpus import stream_dsir_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = docs.filter(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 11 == 0).select("doc_id", "text")
    d = str(tmp_path / "docs_dsir")
    raw.write.parquet(d)

    model = dsir_model(raw, target, n_buckets=256)
    got = run_available_now(
        stream_dsir_score(spark, d, model, n_buckets=256),
        "t_dsir", mode="append")
    stream_rows = {r.doc_id: (r.n_feats, r.log_ratio) for r in got.collect()}
    batch_rows = {r.doc_id: (r.n_feats, r.log_ratio)
                  for r in dsir_importance(raw, target, n_buckets=256).collect()}
    assert stream_rows == batch_rows and len(batch_rows) > 100
    shutil.rmtree(d, ignore_errors=True)


def test_stream_quality_gate_matches_batch(spark, tmp_path):
    """The streaming quality gate's per-rule verdicts and keep flag
    equal the batch quality_filter contract query row for row."""
    import shutil

    from lamapi_spark.queries import queries
    from lamapi_spark.streaming.sessions import stream_quality_gate

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "docs_gate")
    src.select("doc_id", "text").write.parquet(d)
    got = run_available_now(stream_quality_gate(spark, d), "t_gate",
                            mode="append")
    stream_rows = {r.doc_id: (r.r_len, r.r_mean, r.r_alpha, r.r_dup, r.keep)
                   for r in got.collect()}
    batch_rows = {r.doc_id: (r.r_len, r.r_mean, r.r_alpha, r.r_dup, r.keep)
                  for r in queries()["quality_filter"](
                      spark, "/root/testdata/sf0.001").collect()}
    assert stream_rows == batch_rows and len(batch_rows) == 500
    shutil.rmtree(d, ignore_errors=True)


def test_stream_classifier_score_matches_batch(spark, tmp_path):
    """The stateless streaming classifier scorer (trained weights as a
    map literal -> in-array micro-unit fold) equals the batch
    score_linear row for row including the final doubles — the
    occurrence-wise integer sum is the same number as the tf-frame's
    x*w aggregation, and the sigmoid chain repeats the same IEEE
    ops."""
    import shutil

    from lamapi_spark.ops.classifier import score_linear, train_linear
    from lamapi_spark.streaming.corpus import stream_classifier_score

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("y", (F.col("lang") == "en").cast("bigint")))
    d = str(tmp_path / "docs_clf")
    docs.select("doc_id", "text").write.parquet(d)

    w = train_linear(docs, "y", n_buckets=64, iters=2)
    got = run_available_now(
        stream_classifier_score(spark, d, w, n_buckets=64),
        "t_clf", mode="append")
    stream_rows = {r.doc_id: (r.z_micro, r.p) for r in got.collect()}
    batch_rows = {r.doc_id: (r.z_micro, r.p)
                  for r in score_linear(docs, w, n_buckets=64).collect()}
    assert stream_rows == batch_rows and len(batch_rows) > 100
    shutil.rmtree(d, ignore_errors=True)


def test_stream_cms_cells_matches_batch(spark, tmp_path):
    """The streaming Count-Min cell state, drained at any point,
    equals the batch sketch cell for cell — counter sums are
    commutative, and the state is bounded at keys x d*w cells by
    construction."""
    import shutil

    from lamapi_spark.ops.sketches import cms_sketch
    from lamapi_spark.streaming.temporal import stream_cms_cells

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "events_cms")
    ev.select("event_type", "user_id").write.parquet(d)

    got = run_available_now(
        stream_cms_cells(spark, d, ("event_type",), "user_id",
                         schema="event_type string, user_id bigint"),
        "t_cms", mode="complete")
    stream_cells = {(r.event_type, r.idx): r.cnt for r in got.collect()}

    batch = cms_sketch(ev, ["event_type"], "user_id").collect()
    batch_cells = {(r.event_type, i): c
                   for r in batch for i, c in enumerate(r.cms) if c > 0}
    assert stream_cells == batch_cells and len(batch_cells) > 100


def test_stream_transe_score_matches_batch(spark, tmp_path):
    """The stateless streaming TransE scorer (stream-static vector
    joins + in-array integer fold) equals the batch per-dim row layout
    scorer row for row — there is no float anywhere, so equality is
    exact by construction and this pins the pivot + fold."""
    import shutil

    from lamapi_spark.ops.kg_embed import (
        embedding_vectors, transe_score, transe_train,
    )
    from lamapi_spark.streaming.kg import stream_transe_score

    tn = spark.createDataFrame(
        [(str(i), "next", str(i + 1), str((i + 9) % 30))
         for i in range(29)],
        "subj string, pred string, obj string, neg_obj string")
    emb = transe_train(tn, d=4, iters=2)
    vecs = embedding_vectors(emb)
    triples = tn.select("subj", "pred", "obj")
    d = str(tmp_path / "transe_triples")
    triples.write.parquet(d)

    got = run_available_now(
        stream_transe_score(spark, d, vecs), "t_transe", mode="append")
    stream_rows = {(r.subj, r.pred, r.obj): r.score_u
                   for r in got.collect()}
    batch_rows = {(r.subj, r.pred, r.obj): r.score_u
                  for r in transe_score(triples, emb).collect()}
    assert stream_rows == batch_rows and len(batch_rows) == 29
    shutil.rmtree(d, ignore_errors=True)


def test_stream_type_violations_matches_batch(spark, tmp_path):
    """The stateless streaming QA gate (stream-static type joins +
    broadcast offline-induced schema) flags exactly the triples the
    batch type_violations flags."""
    import shutil

    from lamapi_spark.ops.graph import induce_schema, type_violations
    from lamapi_spark.streaming.kg import stream_type_violations

    tr = spark.createDataFrame(
        [("a1", "works_at", "c1"), ("a2", "works_at", "c2"),
         ("a3", "works_at", "c3"), ("x9", "works_at", "c1"),
         ("a1", "born_in", "p1"), ("a2", "born_in", "p2")],
        "subj string, pred string, obj string")
    ty = spark.createDataFrame(
        [("a1", "person"), ("a2", "person"), ("a3", "person"),
         ("x9", "robot"), ("c1", "company"), ("c2", "company"),
         ("c3", "company"), ("p1", "place"), ("p2", "place")],
        "ent string, ent_type string")
    schema_df = induce_schema(tr, ty)
    d = str(tmp_path / "qa_triples")
    tr.write.parquet(d)
    got = run_available_now(
        stream_type_violations(spark, d, ty, schema_df),
        "t_qa", mode="append")
    s_rows = sorted(map(tuple, got.collect()))
    b_rows = sorted(map(tuple, type_violations(tr, ty, schema_df).collect()))
    assert s_rows == b_rows and len(b_rows) == 1
    shutil.rmtree(d, ignore_errors=True)


def test_stream_fs_link_matches_batch(spark, tmp_path):
    """The stream-static linkage twin emits exactly the batch
    fs_link_pairs rows: every operator is stateless or stream-static,
    so arrival order and batch slicing cannot change the set."""
    import shutil

    from lamapi_spark.ops.linkage import fs_link_pairs
    from lamapi_spark.streaming.linkage import stream_fs_link

    l = spark.createDataFrame(
        [("l1", "b1", "acme", "ny"), ("l2", "b2", "zeta", None),
         ("l3", "b3", "solo", "sf")],
        "lid string, blk string, name string, city string")
    r_schema = "rid string, blk string, name string, city string"
    r = spark.createDataFrame(
        [("r1", "b1", "acme", "ny"), ("r2", "b1", "acme", "la"),
         ("r3", "b2", "other", "sf"), ("r4", "b2", "zeta", None)],
        r_schema)
    d = str(tmp_path / "fs_right")
    r.write.parquet(d)
    weights = {"name": (1000, -1000), "city": (500, -500)}
    got = run_available_now(
        stream_fs_link(spark, d, r_schema, l, ("lid", "rid"), "blk",
                       weights, 1200, -1200),
        "t_fs_link", mode="append")
    s_rows = sorted(map(tuple, got.collect()))
    b_rows = sorted(map(tuple, fs_link_pairs(
        l, r, ("lid", "rid"), "blk", weights, 1200, -1200).collect()))
    assert s_rows == b_rows and len(b_rows) == 4
    shutil.rmtree(d, ignore_errors=True)


def test_stream_jsd_drift_matches_batch(spark, tmp_path):
    """Per-window streaming JSD against the static baseline equals
    the batch js_divergence '__total__' term on each window's slice
    bit for bit (same rounded per-category terms, same DECIMAL
    rollup) — including a window with a PLANTED mix shift and a
    window containing a category the baseline never saw."""
    import datetime
    import shutil

    from lamapi_spark.ops.metrics import js_divergence
    from lamapi_spark.streaming.corpus import stream_jsd_drift

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def ts(h, m=0):
        return t0 + datetime.timedelta(hours=h, minutes=m)

    baseline = spark.createDataFrame(
        [("en", 60), ("de", 30), ("fr", 10)], "category string, c_base long")
    # window 0: baseline-like; window 1: shifted toward de + a NEW
    # category the baseline lacks; window 2: tiny tail
    rows = ([("en", ts(0, i)) for i in range(6)]
            + [("de", ts(0, 30 + i)) for i in range(3)]
            + [("fr", ts(0, 50))]
            + [("de", ts(1, i)) for i in range(7)]
            + [("xx", ts(1, 30 + i)) for i in range(2)]
            + [("en", ts(1, 40))]
            + [("en", ts(2, 5)), ("de", ts(2, 6))])
    ev = spark.createDataFrame(rows, "category string, ts timestamp")
    d = str(tmp_path / "cat_events")
    ev.write.parquet(d)
    # far-future flush row advances the watermark past every real
    # window so append mode emits them all (the fact-support pattern)
    spark.createDataFrame([("zz", ts(100))],
                          "category string, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(d)

    got = run_available_now(
        stream_jsd_drift(spark, d, baseline, window="1 hour",
                         watermark="1 minute"),
        "t_jsd", mode="append")
    stream_rows = {r.window_start: (r.n_new, r.jsd) for r in got.collect()}
    assert len(stream_rows) == 3

    for h in range(3):
        slice_df = ev.filter(
            (F.col("ts") >= ts(h)) & (F.col("ts") < ts(h + 1))
        ).select("category")
        base_df = baseline.selectExpr(
            "explode(array_repeat(category, cast(c_base as int))) AS category")
        total = {r.category: r.term
                 for r in js_divergence(base_df, slice_df).collect()}
        n_new, jsd = stream_rows[ts(h)]
        assert jsd == total["__total__"], f"window {h}"
    # the shifted window reads a LARGER divergence than the calm one
    assert stream_rows[ts(1)][1] > stream_rows[ts(0)][1]
    shutil.rmtree(d, ignore_errors=True)
