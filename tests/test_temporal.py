"""Temporal operators: as-of join semantics (inclusivity, ties,
tolerance, missing-prior nulls), binned range join vs a naive
inequality join (plus the no-BNLJ plan assertion), and KMV sketch
accuracy/exactness. Reference analogue: none — builder's-brief custom
operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lamapi_spark.ops.temporal import asof_join, range_join_binned


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts_us, value) — the "state" side
    rows = [
        ("a", 100, 1.0),
        ("a", 200, 2.0),
        ("a", 500, 5.0),
        ("b", 300, 30.0),
    ]
    return spark.createDataFrame(rows, "k string, ts_us long, value double")


@pytest.fixture(scope="module")
def trades(spark):
    # (id, key, ts_us) — the "probe" side
    rows = [
        (1, "a", 50),    # before any quote -> null
        (2, "a", 100),   # equal ts -> inclusive match (1.0)
        (3, "a", 250),   # between 200 and 500 -> 2.0
        (4, "a", 900),   # after last -> 5.0
        (5, "b", 299),   # before b's only quote -> null
        (6, "b", 301),   # after -> 30.0
        (7, "c", 400),   # key with no right rows -> null
    ]
    return spark.createDataFrame(rows, "id long, k string, ts_us long")


def test_asof_backward_inclusive(spark, quotes, trades):
    out = {r.id: (r.asof_ts, r.asof_value)
           for r in asof_join(trades, quotes, key="k").collect()}
    assert out[1] == (None, None)
    assert out[2] == (100, 1.0)        # equal-ts right row IS visible
    assert out[3] == (200, 2.0)
    assert out[4] == (500, 5.0)
    assert out[5] == (None, None)
    assert out[6] == (300, 30.0)
    assert out[7] == (None, None)
    # left row count preserved
    assert len(out) == 7


def test_asof_tolerance_nulls_stale(spark, quotes, trades):
    out = {r.id: (r.asof_ts, r.asof_value)
           for r in asof_join(trades, quotes, key="k",
                              tolerance_us=100).collect()}
    assert out[2] == (100, 1.0)        # age 0 <= 100
    assert out[3] == (200, 2.0)        # age 50
    assert out[4] == (None, None)      # age 400 > 100 -> stale
    assert out[6] == (300, 30.0)       # age 1 -> kept


def test_asof_tolerance_boundary(spark, quotes, trades):
    out = {r.id: r.asof_value
           for r in asof_join(trades, quotes, key="k",
                              tolerance_us=50).collect()}
    assert out[3] == 2.0               # age exactly 50: kept (<=)
    assert out[4] is None              # age 400: stale
    assert out[6] == 30.0              # age 1: kept


def test_asof_multi_payload(spark):
    right = spark.createDataFrame(
        [("a", 10, 1.0, "x")], "k string, ts_us long, v double, tag string")
    left = spark.createDataFrame([(1, "a", 20)], "id long, k string, ts_us long")
    row = asof_join(left, right, key="k", payload=("v", "tag")).collect()[0]
    assert (row.asof_v, row.asof_tag, row.asof_ts) == (1.0, "x", 10)


def _naive_range(intervals, points, key):
    return (intervals.join(points, key)
            .filter(F.col("ts_us").between(F.col("lo_us"), F.col("hi_us"))))


@pytest.mark.parametrize("bin_s", [1, 7, 1800])
def test_range_join_matches_naive(spark, bin_s):
    # intervals straddle bin boundaries at every tested width
    iv = spark.createDataFrame(
        [("a", 0, 10_000_000), ("a", 5_000_000, 5_000_000),  # degenerate lo==hi
         ("b", 2_000_000, 3_999_999)],
        "k string, lo_us long, hi_us long")
    pts = spark.createDataFrame(
        [("a", i, i * 1_000_000) for i in range(12)]
        + [("b", 100 + i, i * 1_000_000) for i in range(6)],
        "k string, event_id long, ts_us long")
    got = sorted((r.k, r.lo_us, r.event_id) for r in
                 range_join_binned(iv, pts, key="k", bin_s=bin_s).collect())
    want = sorted((r.k, r.lo_us, r.event_id) for r in
                  _naive_range(iv, pts, "k").collect())
    assert got == want and len(want) > 0
    # boundary inclusivity: point at exactly lo and exactly hi both present
    assert ("a", 0, 0) in got and ("a", 0, 10) in got
    assert ("a", 5_000_000, 5) in got  # degenerate interval keeps its point


def test_range_join_plan_has_no_bnlj(spark):
    iv = spark.createDataFrame([("a", 0, 10)], "k string, lo_us long, hi_us long")
    pts = spark.createDataFrame([("a", 1, 5)], "k string, event_id long, ts_us long")
    plan = range_join_binned(iv, pts, key="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmv_merge_equals_global_sketch(spark):
    from lamapi_spark.ops.sketches import kmv_estimate, kmv_merge, kmv_sketch
    rows = [("t", i % 5, f"v{i % 300}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, shard long, v string")
    direct = kmv_sketch(df, ["g"], "v", k=16).collect()[0]
    merged = kmv_merge(kmv_sketch(df, ["g", "shard"], "v", k=16),
                       ["g"], k=16).collect()[0]
    assert merged.kmv == direct.kmv          # bit-identical sketch
    est = kmv_estimate(kmv_merge(kmv_sketch(df, ["g", "shard"], "v", k=16),
                                 ["g"], k=16), k=16).collect()[0]
    assert est.k_used == 16
    assert abs(est.est_distinct - 300) / 300 < 1.0   # ~1/sqrt(15) sigma


def test_hist_quantiles_uniform_exact_shape(spark):
    from lamapi_spark.ops.sketches import hist_quantiles, hist_sketch
    # 1000 values uniform on [0, 100): true quantile q -> 100q; the
    # histogram estimate must land within one bin width
    df = spark.createDataFrame([("u", float(i) / 10.0) for i in range(1000)],
                               "g string, v double")
    h = hist_sketch(df, ["g"], "v", width=10.0)
    assert h.count() == 10 and all(r.cnt == 100 for r in h.collect())
    out = {r.q: r.est for r in
           hist_quantiles(h, ["g"], 10.0, (0.1, 0.5, 0.99)).collect()}
    for q, est in out.items():
        assert abs(est - 100.0 * q) <= 10.0
    # merge = counts add: splitting the input leaves estimates unchanged
    a, b = df.filter(F.col("v") < 37), df.filter(F.col("v") >= 37)
    ha, hb = (hist_sketch(x, ["g"], "v", width=10.0) for x in (a, b))
    merged = (ha.unionByName(hb).groupBy("g", "bin")
              .agg(F.sum("cnt").alias("cnt")))
    out2 = {r.q: r.est for r in
            hist_quantiles(merged, ["g"], 10.0, (0.1, 0.5, 0.99)).collect()}
    assert out2 == out


def test_kmv_exact_below_k_and_estimate_above(spark, tmp_path):
    # build an events-shaped parquet dir so the contract query runs on it
    import pyspark.sql.functions as F2
    n_small, n_big = 20, 5000
    rows = ([("small", f"u{i}", i, "2024-01-01 00:00:00", "1") for i in range(n_small)]
            + [("big", f"u{i}", 10_000 + i, "2024-01-01 00:00:00", "1")
               for i in range(n_big)])
    df = spark.createDataFrame(
        rows, "event_type string, user_id string, event_id long, ts string, value string")
    df.withColumn("ts", F2.col("ts").cast("timestamp")) \
        .write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from lamapi_spark.queries_temporal import sketch_kmv_distinct
    out = {r.event_type: r for r in sketch_kmv_distinct(spark, str(tmp_path)).collect()}
    assert out["small"].k_used == n_small
    assert out["small"].est_distinct == float(n_small)   # exact below k
    assert out["big"].k_used == 64
    # KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
    assert abs(out["big"].est_distinct - n_big) / n_big < 0.5


def test_asof_randomized_differential_vs_duckdb(spark):
    """200 seeded random keys with random probe/state histories in ONE
    Spark job vs DuckDB's NATIVE ASOF JOIN on the same rows — the
    randomized sweep between the hand-picked fixtures (tie timestamps,
    empty right sides, and pre-history probes all occur by
    construction)."""
    import random

    import duckdb

    from lamapi_spark.ops.temporal import asof_join

    rng = random.Random(20260818)
    probes, states = [], []
    for k in range(200):
        key = f"k{k}"
        for _ in range(rng.randint(1, 8)):
            probes.append((key, rng.randint(0, 50) * 10))  # ts multiples of 10
        if k % 7 != 3:  # some keys have NO state rows at all
            for j in range(rng.randint(1, 6)):
                # ~1/5 state rows collide exactly with a probe ts
                ts = rng.choice([rng.randint(0, 50) * 10,
                                 rng.randint(0, 500)])
                states.append((key, ts, float(j)))
    # contract: right unique per (key, ts)
    seen = set()
    states = [s for s in states
              if (s[0], s[1]) not in seen and not seen.add((s[0], s[1]))]

    left = spark.createDataFrame(probes, "key string, ts_us long")
    right = spark.createDataFrame(states, "key string, ts_us long, value double")
    got = sorted((r.key, r.ts_us, r.asof_ts, r.asof_value) for r in
                 asof_join(left, right, "key").collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE probes(key VARCHAR, ts BIGINT)")
    con.executemany("INSERT INTO probes VALUES (?, ?)", probes)
    con.execute("CREATE TABLE states(key VARCHAR, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO states VALUES (?, ?, ?)", states)
    want = sorted(tuple(r) for r in con.execute("""
        SELECT p.key, p.ts, s.ts, s.value
        FROM probes p ASOF LEFT JOIN states s
          ON p.key = s.key AND p.ts >= s.ts
        ORDER BY 1, 2
    """).fetchall())
    assert got == want


def test_range_join_binned_randomized_differential(spark):
    """Seeded random intervals/points (deliberately clustered around
    bin edges: bin_s=2s, timestamps near multiples of 2e6 micros) vs
    the plain inequality join computed in Python — bin replication
    must be invisible in the result."""
    import random

    from lamapi_spark.ops.temporal import range_join_binned

    rng = random.Random(31)
    bin_us = 2_000_000
    ivals, pts = [], []
    for i in range(150):
        key = f"k{rng.randint(0, 9)}"
        # half the endpoints land EXACTLY on bin boundaries
        lo = (rng.randint(0, 20) * bin_us if rng.random() < 0.5
              else rng.randint(0, 40_000_000))
        hi = lo + (0 if rng.random() < 0.1 else rng.randint(1, 3 * bin_us))
        ivals.append((i, key, lo, hi))
    for j in range(300):
        key = f"k{rng.randint(0, 9)}"
        ts = (rng.randint(0, 20) * bin_us if rng.random() < 0.5
              else rng.randint(0, 40_000_000))
        pts.append((j, key, ts))

    want = {(i, j) for (i, k, lo, hi) in ivals
            for (j, pk, ts) in pts if pk == k and lo <= ts <= hi}
    assert len(want) > 100  # the sweep actually exercises containment

    idf = spark.createDataFrame(ivals, "iid bigint, key string, lo_us long, hi_us long")
    pdf = spark.createDataFrame(pts, "pid bigint, key string, ts_us long")
    got = {(r.iid, r.pid) for r in
           range_join_binned(idf, pdf, "key", bin_s=2).collect()}
    assert got == want


def test_bloom_sketch_membership_and_merge(spark):
    """No false negatives ever; most absent probes read definitely-
    absent at this fill; shard-merge equals the direct global sketch
    word for word (deterministic bit_or)."""
    from lamapi_spark.ops.sketches import (
        bloom_contains, bloom_merge, bloom_sketch,
    )

    rows = [("g", i) for i in range(60)]
    df = spark.createDataFrame(rows, "key string, v bigint")
    sk = bloom_sketch(df, ["key"], "v")

    probes = spark.createDataFrame(
        [("g", i) for i in range(120)], "key string, v bigint")
    got = {r.v: r.maybe_present
           for r in bloom_contains(sk, probes, ["key"], "v").collect()}
    assert all(got[i] for i in range(60))           # no false negatives
    absent = [got[i] for i in range(60, 120)]
    assert absent.count(False) > 30                  # mostly definite-absent

    # merge-of-parts == sketch-of-union, word for word
    sh = bloom_sketch(df.withColumn("s", F.col("v") % 4), ["key", "s"], "v")
    merged = bloom_merge(sh, ["key"]).collect()[0].bloom
    direct = sk.collect()[0].bloom
    assert merged == direct


def test_bloom_sketch_null_and_unseen_key_degrades(spark):
    """A null value is ignored (not a job-killing null map key), and a
    probe for a key with no sketch reads definitely-absent instead of
    vanishing in the join."""
    from lamapi_spark.ops.sketches import bloom_contains, bloom_sketch

    df = spark.createDataFrame([("g", "1"), ("g", None)], "key string, v string")
    sk = bloom_sketch(df, ["key"], "v")
    probes = spark.createDataFrame(
        [("g", "1"), ("h", "1")], "key string, v string")
    got = {(r.key, r.v): r.maybe_present
           for r in bloom_contains(sk, probes, ["key"], "v").collect()}
    assert got == {("g", "1"): True, ("h", "1"): False}


def test_cms_sketch_estimate_and_merge(spark):
    """Count-Min: every estimate >= the true count (one-sided error —
    counters only ever add); with 256 cells over 8 distinct values the
    estimates are EXACT absent collisions, so at least the total mass
    bound holds; shard-merge equals the direct global sketch cell for
    cell (sums are associative/commutative)."""
    from lamapi_spark.ops.sketches import cms_estimate, cms_merge, cms_sketch

    # value i appears i+1 times
    rows = [("g", i) for i in range(8) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "key string, v bigint")
    sk = cms_sketch(df, ["key"], "v")

    probes = spark.createDataFrame(
        [("g", i, i + 1) for i in range(8)] + [("g", 99, 0)],
        "key string, v bigint, exact bigint")
    got = {r.v: (r.est, r.exact)
           for r in cms_estimate(sk, probes, ["key"], "v").collect()}
    assert all(est >= exact for est, exact in got.values())  # never under
    assert got[99][0] <= sum(i + 1 for i in range(8))        # bounded over

    # merge-of-parts == sketch-of-union, cell for cell
    sh = cms_sketch(df.withColumn("s", F.col("v") % 4), ["key", "s"], "v")
    merged = cms_merge(sh, ["key"]).collect()[0].cms
    direct = sk.collect()[0].cms
    assert merged == direct


def test_cms_sketch_null_and_unseen_key_degrades(spark):
    """Null occurrences are ignored; a probe for a key with no sketch
    reads est=0 (definitely zero occurrences), not a dropped row."""
    from lamapi_spark.ops.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [("g", "1"), ("g", "1"), ("g", None)], "key string, v string")
    sk = cms_sketch(df, ["key"], "v")
    probes = spark.createDataFrame(
        [("g", "1"), ("h", "1")], "key string, v string")
    got = {(r.key, r.v): r.est
           for r in cms_estimate(sk, probes, ["key"], "v").collect()}
    assert got[("g", "1")] == 2
    assert got[("h", "1")] == 0


def test_resample_ffill_grid_and_fill(spark):
    """Grid spans floor(min/step)..floor(max/step) per key at step
    spacing; values forward-fill between events; a leading grid point
    before the first event carries nulls; a single-event key yields a
    one-point grid."""
    from lamapi_spark.ops.temporal import resample_ffill

    rows = [
        ("a", 150, 1.0),   # key a: events at 150 and 420
        ("a", 420, 4.0),
        ("b", 777, 7.0),   # key b: single event
    ]
    e = spark.createDataFrame(rows, "k string, ts_us long, value double")
    out = {(r.k, r.grid_ts): (r.asof_ts, r.asof_value)
           for r in resample_ffill(e, key="k", step_us=100).collect()}
    assert out == {
        ("a", 100): (None, None),        # before first event
        ("a", 200): (150, 1.0),
        ("a", 300): (150, 1.0),          # gap filled
        ("a", 400): (150, 1.0),
        ("b", 700): (None, None),        # 700 < 777
    }


def test_interval_overlap_join_exact_and_once(spark):
    from lamapi_spark.ops.temporal import interval_overlap_join

    M = 1_000_000
    left = spark.createDataFrame(
        [(1, "k", 0 * M, 100 * M),       # overlaps r1, r2
         (2, "k", 500 * M, 600 * M),     # overlaps r3 (touching edge)
         (3, "k", 10_000 * M, 10_100 * M),  # overlaps nothing
         (4, "x", 0 * M, 100 * M)],      # right key, wrong group
        "lid int, grp string, l_lo_us long, l_hi_us long")
    right = spark.createDataFrame(
        [(1, "k", 50 * M, 70 * M),       # inside l1 (and spans bins)
         (2, "k", 90 * M, 5_000 * M),    # straddles l1's end, wide
         (3, "k", 600 * M, 700 * M),     # touches l2 at exactly 600s
         (4, "k", 101 * M, 200 * M)],    # just past l1
        "rid int, grp string, r_lo_us long, r_hi_us long")
    out = interval_overlap_join(left, right, key="grp", bin_s=30)
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    # l1 overlaps r1 and r2; the wide r2 [90s,5000s] also reaches l2
    # [500s,600s]; r3 touches l2 exactly at 600s (inclusive bounds)
    assert pairs == [(1, 1), (1, 2), (2, 2), (2, 3)]
    # exactly once each, despite multi-bin overlaps (no dedup pass)
    assert len(pairs) == len(set(pairs))


def test_interval_overlap_join_matches_brute_force_randomized(spark):
    import random

    from lamapi_spark.ops.temporal import interval_overlap_join

    rng = random.Random(42)
    M = 1_000_000
    lrows, rrows = [], []
    for i in range(120):
        lo = rng.randrange(0, 50_000) * M
        lrows.append((i, "g" + str(rng.randrange(3)), lo,
                      lo + rng.randrange(0, 3_000) * M))
    for j in range(150):
        lo = rng.randrange(0, 50_000) * M
        rrows.append((j, "g" + str(rng.randrange(3)), lo,
                      lo + rng.randrange(0, 3_000) * M))
    left = spark.createDataFrame(
        lrows, "lid int, grp string, l_lo_us long, l_hi_us long")
    right = spark.createDataFrame(
        rrows, "rid int, grp string, r_lo_us long, r_hi_us long")
    got = sorted((r.lid, r.rid) for r in interval_overlap_join(
        left, right, key="grp", bin_s=600).collect())
    want = sorted(
        (l[0], r[0]) for l in lrows for r in rrows
        if l[1] == r[1] and l[2] <= r[3] and r[2] <= l[3])
    assert got == want


def test_hll_merge_equals_global_sketch_and_accuracy(spark):
    from lamapi_spark.ops.sketches import hll_estimate, hll_merge, hll_sketch
    rows = [("t", i % 8, f"v{i % 900}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, shard long, v string")
    direct = hll_sketch(df, ["g"], "v").collect()[0]
    merged = hll_merge(hll_sketch(df, ["g", "shard"], "v"),
                       ["g"]).collect()[0]
    assert merged.regs == direct.regs        # register-identical
    assert len(direct.regs) == 64 and all(r >= 0 for r in direct.regs)
    est = hll_estimate(hll_merge(hll_sketch(df, ["g", "shard"], "v"),
                                 ["g"])).collect()[0]
    # sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est.est_distinct - 900) / 900 < 0.39
    # partition independence
    d2 = hll_sketch(df.repartition(13), ["g"], "v").collect()[0]
    assert d2.regs == direct.regs


def test_hll_small_range_linear_counting(spark):
    from lamapi_spark.ops.sketches import hll_estimate, hll_sketch
    # 5 distinct values over 64 registers -> many zero registers ->
    # the linear-counting branch; it is near-exact at this density
    df = spark.createDataFrame([("g", f"x{i % 5}") for i in range(50)],
                               "g string, v string")
    est = hll_estimate(hll_sketch(df, ["g"], "v")).collect()[0]
    assert est.n_zero >= 59
    assert abs(est.est_distinct - 5) <= 1.0


def test_hll_rank_extremes_and_idempotent_merge(spark):
    from lamapi_spark.ops.sketches import hll_merge, hll_sketch
    df = spark.createDataFrame([("g", f"v{i}") for i in range(200)],
                               "g string, v string")
    sk = hll_sketch(df, ["g"], "v")
    once = sk.collect()[0]
    # merging a sketch with itself changes nothing (max idempotent)
    twice = hll_merge(sk.unionByName(sk), ["g"]).collect()[0]
    assert twice.regs == once.regs
    # ranks bounded by the 42-bit suffix + 1
    assert all(0 <= r <= 43 for r in once.regs)
