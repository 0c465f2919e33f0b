"""Round-4 tenth-part sweep: hand-pinned cases for the governance,
forecast-decomposition, sequence-analytics, robust-trend, and chrF
operators (oracle parity is the contract gate's job; these pin the
conventions on tiny inputs computed by hand)."""

from __future__ import annotations


def test_k_anonymity_census_pinned(spark):
    from lamapi_spark.ops.governance import k_anonymity_census

    # QI (seg, zip): (a,1) x3 rows all sensitive 's1' -> k=3, l=1
    #                (a,2) x2 rows s1/s2              -> k=2, l=2
    #                (b,1) x1 row                     -> k=1, l=1
    rows = [("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s1"),
            ("a", 2, "s1"), ("a", 2, "s2"),
            ("b", 1, "s1")]
    df = spark.createDataFrame(rows, "seg string, zip int, sens string")
    out = {r["k"]: r for r in
           k_anonymity_census(df, ["seg", "zip"], "sens",
                              k_threshold=3, l_threshold=2).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[3]["n_groups"], out[3]["n_rows"],
            out[3]["groups_below_k"], out[3]["groups_low_l"]) == (1, 3, 0, 1)
    assert (out[2]["n_groups"], out[2]["n_rows"],
            out[2]["groups_below_k"], out[2]["groups_low_l"]) == (1, 2, 1, 0)
    assert (out[1]["n_groups"], out[1]["n_rows"],
            out[1]["groups_below_k"], out[1]["groups_low_l"]) == (1, 1, 1, 1)


def test_brier_decomposition_identity(spark):
    from lamapi_spark.ops.metrics import brier_decomposition

    # constant forecast within each bin -> Murphy identity is EXACT:
    # p=0.25 over outcomes (1,0,0,0); p=0.75 over (1,1,1,0)
    rows = ([(0.25, 1)] + [(0.25, 0)] * 3 + [(0.75, 1)] * 3 + [(0.75, 0)])
    df = spark.createDataFrame(rows, "score double, label int")
    r = brier_decomposition(df, "score", "label", n_bins=10).collect()[0]
    assert r["n"] == 8
    assert r["brier"] == 0.1875
    assert r["reliability"] == 0.0
    assert r["resolution"] == 0.0625
    assert r["uncertainty"] == 0.25
    assert r["decomp_gap"] == 0.0


def test_acf_by_pinned(spark):
    from lamapi_spark.ops.temporal import acf_by

    # A: x=[1,2,3,4] -> c = 4x-10 = [-6,-2,2,6], den=80,
    #    num_1=20, num_2=-24, num_3=-36 -> r = .25, -.3, -.45
    # B: constant -> den=0 -> r=0.0 at every lag
    rows = ([("A", t, x) for t, x in enumerate([1, 2, 3, 4])]
            + [("B", t, 5) for t in range(3)])
    df = spark.createDataFrame(rows, "k string, t int, x long")
    out = {(r["key"], r["lag"]): r for r in
           acf_by(df, "k", ["t"], "x", max_lag=3).collect()}
    assert out[("A", 1)]["n"] == 4 and out[("A", 1)]["r"] == 0.25
    assert out[("A", 2)]["r"] == -0.3
    assert out[("A", 3)]["r"] == -0.45
    assert out[("B", 1)]["r"] == 0.0 and out[("B", 2)]["r"] == 0.0
    assert ("B", 3) not in out  # lag >= n emits nothing


def test_theil_sen_robust_to_outlier(spark):
    from lamapi_spark.ops.metrics import theil_sen_by

    # y = 2x + 1 exactly, except one gross outlier at x=3.
    rows = [("A", 0, 1), ("A", 1, 3), ("A", 2, 5), ("A", 3, 999999),
            ("A", 4, 9), ("A", 5, 11),
            # B: all x equal -> zero defined slopes -> emits nothing
            ("B", 7, 1), ("B", 7, 2)]
    df = spark.createDataFrame(rows, "k string, x int, y int")
    out = theil_sen_by(df, "k", "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert r["key"] == "A" and r["n"] == 6 and r["n_slopes"] == 15
    assert r["slope"] == 2.0       # median slope ignores the outlier
    assert r["intercept"] == 1.0   # median residual on the clean line


def test_tool_sequence_patterns_pinned(spark):
    from lamapi_spark.pipeline.triples import tool_sequence_patterns

    # conv1 tools in order: a, b, a  -> gapped pairs: a~>b (1 emb),
    # a~>a (1), b~>a (1); triple a~>b~>a (1)
    # conv2: a, b -> a~>b (1)
    rows = [("c1", 1, "tool", "a"), ("c1", 2, "user", None),
            ("c1", 3, "tool", "b"), ("c1", 5, "tool", "a"),
            ("c2", 1, "tool", "a"), ("c2", 2, "tool", "b")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")
    out = {(r["pattern"]): (r["k"], r["n_convs"], r["n_occ"])
           for r in tool_sequence_patterns(df).collect()}
    assert out["a~>b"] == (2, 2, 2)
    assert out["a~>a"] == (2, 1, 1)
    assert out["b~>a"] == (2, 1, 1)
    assert out["a~>b~>a"] == (3, 1, 1)
    assert len(out) == 4


def test_markov_stationary_pinned(spark):
    from lamapi_spark.ops.temporal import markov_stationary

    # trans: A->A 1/3, A->B 2/3, B->A 1  => stationary (0.6, 0.4)
    rows = [("c1", 1, "A"), ("c1", 2, "A"), ("c1", 3, "B"),
            ("c2", 1, "A"), ("c2", 2, "B"), ("c2", 3, "A")]
    df = spark.createDataFrame(rows, "conv string, t int, s string")
    out = {r["state"]: r for r in
           markov_stationary(df, "conv", "t", "s", rounds=40).collect()}
    assert out["A"]["n_out"] == 3 and out["B"]["n_out"] == 1
    # second eigenvalue is -2/3: residual after 40 rounds ~ (2/3)^40 ~ 1e-8
    assert abs(out["A"]["pi"] - 0.6) < 1e-6
    assert abs(out["B"]["pi"] - 0.4) < 1e-6
    assert abs(out["A"]["pi"] + out["B"]["pi"] - 1.0) < 1e-9


def test_chrf_corpus_pinned(spark):
    from lamapi_spark.ops.metrics import chrf_corpus

    # cand 'ab' vs ref 'abc' at max_n=2: P=(2/2+1/1)/2=1,
    # R=(2/3+1/2)/2=0.583333, F2=5PR/(4P+R)=0.636364
    df = spark.createDataFrame([(1, "ab", "abc")],
                               "pair_id int, cand string, ref string")
    r = chrf_corpus(df, max_n=2).collect()[0]
    assert (r["ctotal_1"], r["rtotal_1"], r["match_1"]) == (2, 3, 2)
    assert (r["ctotal_2"], r["rtotal_2"], r["match_2"]) == (1, 2, 1)
    assert r["chrp"] == 1.0 and r["chrr"] == 0.583333
    assert r["chrf"] == 0.636364

    # case + whitespace are ignored: 'A b' == 'ab'
    df2 = spark.createDataFrame([(1, "A b", "ab")],
                                "pair_id int, cand string, ref string")
    assert chrf_corpus(df2, max_n=2).collect()[0]["chrf"] == 1.0


def test_rake_keywords_pinned(spark):
    from lamapi_spark.ops.corpus import rake_keywords

    # doc: "deep learning of the deep net" ->
    # runs: ["deep learning"(x1), "deep net"(x1)]
    # freq: deep 2, learning 1, net 1; deg: deep 2+2=4, learning 2, net 2
    # wscore: deep 2.0, learning 2.0, net 2.0
    # phrase scores: both 4.0 -> tie broken phrase asc
    df = spark.createDataFrame([(1, "deep learning of the deep net")],
                               "doc_id int, text string")
    out = rake_keywords(df, k=3).orderBy("rk").collect()
    assert [(r["phrase"], r["n_words"], r["score"], r["rk"]) for r in out] \
        == [("deep learning", 2, 4.0, 1), ("deep net", 2, 4.0, 2)]


def test_err_eval_pinned(spark):
    from lamapi_spark.ops.metrics import err_eval

    # gains (3,0,1) at ranks 1..3, g_max=3: R = 7/8, 0, 1/8
    # ERR = 7/8 + 0 + (1/8)*(1/8)/3 = 0.875 + 1/192 = 0.880208
    rows = [("q1", 1, 3), ("q1", 2, 0), ("q1", 3, 1),
            ("q2", 1, 0)]  # all-zero gains -> ERR 0
    df = spark.createDataFrame(rows, "query_id string, rank int, gain int")
    out = {r["query_id"]: r for r in err_eval(df).collect()}
    assert out["q1"]["n_ranked"] == 3
    assert out["q1"]["err"] == 0.880208
    assert out["q2"]["err"] == 0.0


def test_regression_metrics_pinned(spark):
    from lamapi_spark.ops.metrics import regression_metrics

    df = spark.createDataFrame([(2.0, 1.0), (2.0, 2.0), (2.0, 3.0)],
                               "pred double, truth double")
    r = regression_metrics(df).collect()[0]
    assert r["n"] == 3
    assert r["mae"] == 0.666667
    assert r["rmse"] == 0.816497          # sqrt(2/3)
    assert r["smape"] == 0.355556         # (2/3 + 0 + 2/5)/3
    assert r["r2"] == 0.0                 # SSE == SST for the mean predictor

    perfect = spark.createDataFrame([(1.0, 1.0), (5.0, 5.0), (9.0, 9.0)],
                                    "pred double, truth double")
    p = regression_metrics(perfect).collect()[0]
    assert (p["mae"], p["rmse"], p["smape"], p["r2"]) == (0.0, 0.0, 0.0, 1.0)

    const = spark.createDataFrame([(1.0, 4.0), (2.0, 4.0)],
                                  "pred double, truth double")
    assert regression_metrics(const).collect()[0]["r2"] == 0.0


def test_log_odds_words_directions(spark):
    from lamapi_spark.ops.corpus import log_odds_words

    # 'only_a' exclusive to A, 'only_b' exclusive to B, 'shared' even.
    a = spark.createDataFrame(
        [("only_a " * 10 + "shared " * 10,)], "text string")
    b = spark.createDataFrame(
        [("only_b " * 10 + "shared " * 10,)], "text string")
    # alpha0 sized to the tiny corpus — the default 1000 is a prior for
    # real slices and would shrink a 20-token side to nothing
    out = {r["token"]: r for r in
           log_odds_words(a, b, alpha0=2.0, min_count=5).collect()}
    assert out["only_a"]["z"] > 1.0          # A-distinctive: positive z
    assert out["only_b"]["z"] < -1.0         # B-distinctive: negative z
    assert abs(out["shared"]["z"]) < 0.5     # balanced token shrinks
    assert out["only_a"]["y1"] == 10 and out["only_a"]["y2"] == 0


def test_stream_role_transitions_matches_batch(spark, tmp_path):
    """The streaming session-window transition census, drained with
    gap/watermark above the input's span, equals the batch
    consecutive-pair census row for row."""
    import shutil

    from pyspark.sql import functions as F

    from lamapi_spark.streaming.exports import stream_role_transitions
    from lamapi_spark.streaming.sessions import run_available_now

    rows = [("A", 1, "user"), ("A", 2, "tool"), ("A", 3, "tool"),
            ("A", 4, "assistant"), ("A", 5, "user"), ("A", 6, "tool"),
            ("B", 1, "user"), ("B", 2, "assistant"),
            ("C", 1, "user")]  # single turn: no pairs
    tr = (spark.createDataFrame(rows,
                                "conv_id string, turn_idx int, role string")
          .withColumn("text", F.lit("x")).withColumn("tool", F.lit(None)
                                                     .cast("string"))
          .withColumn("ts", F.timestamp_seconds(
              F.lit(1700000000) + F.col("turn_idx") * 60)))
    d = str(tmp_path / "role_feed")
    tr.select("conv_id", "turn_idx", "role", "text", "tool",
              "ts").write.parquet(d)
    got = run_available_now(
        stream_role_transitions(spark, d, gap="2 hours",
                                watermark="4 hours"),
        "t_role_trans", mode="complete")
    stream_rows = sorted(map(tuple, got.collect()))

    # independent batch census: per-conv lead() pairing
    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    batch = (tr.withColumn("_nxt", F.lead("role").over(w))
             .filter(F.col("_nxt").isNotNull())
             .groupBy("conv_id", F.col("role").alias("s_from"),
                      F.col("_nxt").alias("s_to"))
             .agg(F.count("*").alias("n")))
    batch_rows = sorted(map(tuple, batch.collect()))
    assert stream_rows == batch_rows
    assert ("A", "user", "tool", 2) in stream_rows
    shutil.rmtree(d, ignore_errors=True)


def test_mad_anomalies_pinned(spark):
    from lamapi_spark.ops.temporal import mad_anomalies

    # A: [1,2,3,4,100] -> med=3, devs sorted [0,1,1,2,97] -> mad=1,
    # gate 5*max(1,1)=5 -> only the 100 flags (dev 97)
    rows = ([("A", i + 1, x) for i, x in enumerate([1, 2, 3, 4, 100])]
            + [("B", 1, 7), ("B", 2, 9)])   # n < 3: excluded
    df = spark.createDataFrame(rows, "k string, t int, x long")
    out = mad_anomalies(df, "k", "t", "x", thresh=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["key"], r["o"], r["x"], r["med"], r["mad"], r["dev"]) \
        == ("A", 5, 100, 3, 1, 97)


def test_ngram_novelty_pinned(spark):
    from lamapi_spark.ops.corpus import ngram_novelty

    train = spark.createDataFrame([(0, "a b c d")], "doc_id int, text string")
    # gen doc 1: grams "a b c"(seen) "b c d"(seen) "c d x"(novel) -> 1/3
    # gen doc 2: "x y z" x2 occurrences, both novel -> 2/2
    # gen doc 3: two tokens -> no grams -> emits nothing
    gen = spark.createDataFrame(
        [(1, "a b c d x"), (2, "x y z x y z"), (3, "a b")],
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(gen, train, n=3).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (3, 1)
    assert out[1]["novelty"] == 0.333333
    # doc 2 grams: "x y z","y z x","z x y","x y z" -> all 4 novel
    assert (out[2]["n_grams"], out[2]["n_novel"], out[2]["novelty"]) \
        == (4, 4, 1.0)


def test_plan_shapes_of_tenth_part_operators(spark):
    """Plan audit for this batch (the test_ops discipline): no
    cartesian products anywhere; 1-row stat/matrix frames are the
    ONLY nested-loop build sides; the data-sided joins (RAKE word
    scores, novelty gram probe) stay hash joins."""
    import pyspark.sql.functions as F

    from lamapi_spark.ops.corpus import ngram_novelty, rake_keywords
    from lamapi_spark.ops.governance import k_anonymity_census
    from lamapi_spark.ops.metrics import (brier_decomposition,
                                          regression_metrics)
    from lamapi_spark.ops.temporal import mad_anomalies

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p1 = plan(rake_keywords(docs, k=3))
    assert "CartesianProduct" not in p1
    assert "BroadcastNestedLoopJoin" not in p1

    p2 = plan(ngram_novelty(docs.filter(F.col("doc_id") % 2 == 1),
                            docs.filter(F.col("doc_id") % 2 == 0)))
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2
    assert "Window" not in p2

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    p3 = plan(k_anonymity_census(
        cust, ["c_mktsegment", "c_nationkey"], "c_acctbal"))
    assert "CartesianProduct" not in p3
    assert "BroadcastNestedLoopJoin" not in p3
    assert "Window" not in p3

    scored = cust.select((F.col("c_custkey") % 100 / 100.0).alias("score"),
                         (F.col("c_custkey") % 2).alias("label"))
    p4 = plan(brier_decomposition(scored))
    assert "CartesianProduct" not in p4
    # exactly the 1-row totals frame rides the nested-loop cross join
    assert p4.count("BroadcastNestedLoopJoin") == 1

    p5 = plan(regression_metrics(
        cust.select(F.col("c_acctbal").alias("pred"),
                    F.col("c_acctbal").alias("truth"))))
    assert "CartesianProduct" not in p5
    assert "BroadcastNestedLoopJoin" not in p5

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p6 = plan(mad_anomalies(
        ev.select("event_type", "event_id",
                  F.bround(F.col("value") * 100, 0).cast("long").alias("x")),
        "event_type", "event_id", "x"))
    assert "CartesianProduct" not in p6
    assert "BroadcastNestedLoopJoin" not in p6


def test_perm_test_paired_pinned(spark):
    from lamapi_spark.ops.metrics import perm_test_paired

    # A beats B by +10 on every one of 20 items: no sign assignment
    # other than all-positive reaches |S_obs| = 200 unless it flips
    # nothing... any flip strictly lowers the sum, so only permutations
    # with zero or all flips tie; p pins near the 1/(B+1) floor.
    rows = [(f"i{k}", 20, 10) for k in range(20)]
    df = spark.createDataFrame(rows, "item_id string, score_a int, score_b int")
    r = perm_test_paired(df, n_perm=100).collect()[0]
    assert r["n_items"] == 20 and r["s_obs"] == 200
    assert r["n_ge"] <= 1          # all-flip parity could tie |S|
    assert r["p_value"] <= 0.02

    # symmetric null: d alternates +1/-1 -> S_obs = 0, every
    # permutation satisfies |S_b| >= 0 -> p = 1.0
    null_rows = [(f"i{k}", 1 + (k % 2), 2 - (k % 2)) for k in range(20)]
    d2 = spark.createDataFrame(null_rows,
                               "item_id string, score_a int, score_b int")
    r2 = perm_test_paired(d2, n_perm=100).collect()[0]
    assert r2["s_obs"] == 0 and r2["p_value"] == 1.0


def test_weighted_kappa_pinned(spark):
    from lamapi_spark.ops.metrics import weighted_kappa

    # items: three exact agreements + one 0-vs-2 miss (grades 0..2)
    a = spark.createDataFrame([(1, 0), (2, 1), (3, 2), (4, 0)],
                              "i int, label int")
    b = spark.createDataFrame([(1, 0), (2, 1), (3, 2), (4, 2)],
                              "i int, label int")
    r = weighted_kappa(a, b, ["i"]).collect()[0]
    # quadratic: ow=4, ew=26 -> kappa = 1 - 4*4/26 = 0.384615
    assert (r["n"], r["ow"], r["ew_num"]) == (4, 4, 26)
    assert r["kappa_w"] == 0.384615

    lin = weighted_kappa(a, b, ["i"], weights="linear").collect()[0]
    assert (lin["ow"], lin["ew_num"]) == (2, 16)
    assert lin["kappa_w"] == 0.5   # 1 - 4*2/16

    perfect = weighted_kappa(a, a, ["i"]).collect()[0]
    assert perfect["ow"] == 0 and perfect["kappa_w"] == 1.0


def test_holt_forecast_pinned(spark):
    from lamapi_spark.ops.temporal import holt_forecast

    # alpha=.5 beta=.25 over [10,12,11,15,14] (hand-folded):
    # l=13.923828125, b=0.694824219, forecast=14.618652(344)
    rows = [("A", i, x) for i, x in enumerate([10.0, 12.0, 11.0,
                                               15.0, 14.0])]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    r = holt_forecast(df, "k", ["t"], "x").collect()[0]
    assert r["n"] == 5
    assert r["level"] == 13.923828
    assert r["trend"] == 0.694824
    assert r["forecast"] == 14.618652

    # single point: level = x, zero trend
    one = spark.createDataFrame([("B", 1, 7.0)], "k string, t int, x double")
    r1 = holt_forecast(one, "k", ["t"], "x").collect()[0]
    assert (r1["level"], r1["trend"], r1["forecast"]) == (7.0, 0.0, 7.0)
