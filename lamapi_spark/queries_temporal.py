"""Temporal-operator and sketch contract queries over ``events``:
as-of join (DuckDB's NATIVE ``ASOF JOIN`` as the oracle — a fully
independent implementation of the semantics), binned range join,
multi-granularity rollup, and a deterministic KMV distinct sketch.

These cover the builder's-brief custom-operator axis (as-of join,
range join, hypertable rollup, sketches) — operators Spark lacks as
built-ins, implemented as scale-shaped compositions (ops/temporal.py)
rather than UDF fallbacks. Reference analogue: none (the reference has
no temporal surface); the shapes are the standard feature-store /
event-analytics workloads a KG-over-transcripts deployment sits next
to.

Engine-parity notes: timestamps flow as integer MICROS everywhere
(epoch_us <-> unix_micros); the KMV hash is the repo's md5-hex-prefix
integer (48 bits — exact in BIGINT and DOUBLE alike); rollup nulls and
grouping ids follow the shared SQL-standard bit encoding (verified:
Spark grouping_id() == DuckDB GROUPING(a, b)).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lamapi_spark.queries import load, register

_KMV_K = 64
_HASH48_SPACE = float(2 ** 48)


def _events_us(spark, sf):
    return load(spark, sf, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp")))


@register("events_asof_state", """
WITH v AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ts_us,
         max_by(value, event_id) AS value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
c AS (
  SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts_us,
       v.ts_us AS asof_ts, v.value AS asof_value
FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts_us >= v.ts_us
ORDER BY c.event_id
""")
def events_asof_state(spark, sf):
    """Backward as-of join: every click gets the user's latest
    prior-or-simultaneous 'view' value — the point-in-time feature
    lookup. The oracle is DuckDB's NATIVE ASOF JOIN (an independent
    engine implementation of the semantics, not a reconstruction of
    ours). The view side is pre-aggregated unique per (user, ts)
    (struct-max on the unique event_id) per the operator's tie
    contract."""
    from lamapi_spark.ops.temporal import asof_join

    e = _events_us(spark, sf)
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(F.max(F.struct(F.col("event_id").alias("eid"),
                            F.col("value").alias("v"))).alias("_m"))
        .select("user_id", "ts_us", F.col("_m.v").alias("value"))
    )
    clicks = (e.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts_us"))
    return (
        asof_join(clicks, views, key="user_id", payload=("value",))
        .select("event_id", "user_id", "ts_us", "asof_ts",
                F.col("asof_value"))
        .orderBy("event_id")
    )


@register("events_range_join", """
WITH f AS (
  SELECT user_id, min(epoch_us(ts))::BIGINT AS lo_us
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT f.user_id, f.lo_us, e.event_id,
       epoch_us(e.ts)::BIGINT AS ts_us
FROM f JOIN events e
  ON e.user_id = f.user_id
 AND epoch_us(e.ts) BETWEEN f.lo_us AND f.lo_us + 7200000000
ORDER BY f.user_id, e.event_id
""")
def events_range_join(spark, sf):
    """Interval containment: all events inside the two-hour window
    opening at each user's first click — through the binned range join
    (30-min bins: the interval side replicates <= 5x, points never
    replicate, and the would-be BroadcastNestedLoopJoin becomes a
    shuffled equi-join on (user, bin)). Oracle: the plain inequality
    join DuckDB can afford at test scale."""
    from lamapi_spark.ops.temporal import range_join_binned

    e = _events_us(spark, sf)
    intervals = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id").agg(F.min("ts_us").alias("lo_us"))
        .withColumn("hi_us", F.col("lo_us") + F.lit(7_200_000_000))
    )
    return (
        range_join_binned(intervals, e.select("user_id", "event_id", "ts_us"),
                          key="user_id", bin_s=1800)
        .select("user_id", "lo_us", "event_id", "ts_us")
        .orderBy("user_id", "event_id")
    )


@register("events_rollup", """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       GROUPING(event_type, day)::BIGINT AS gid
FROM events
GROUP BY ROLLUP (event_type, day)
ORDER BY gid, event_type, day
""")
def events_rollup(spark, sf):
    """Hypertable-style multi-granularity rollup in ONE pass:
    (event_type, day) / (event_type) / grand total via ROLLUP —
    partial aggregation handles all three granularities in the same
    shuffle instead of three scans. Day renders as a string so the
    rollup NULL and the date itself are engine-portable; sums go
    through DECIMAL for order-independence (repo convention)."""
    e = load(spark, sf, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts").cast("timestamp")),
                             "yyyy-MM-dd"))
    return (
        e.rollup("event_type", "day")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("sum_value"),
             F.grouping_id().alias("gid"))
        .orderBy("gid", "event_type", "day")
    )


@register("sketch_kmv_distinct", f"""
WITH h AS (
  SELECT DISTINCT event_type,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 12))::UBIGINT)::BIGINT AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       least(n, {_KMV_K})::BIGINT AS k_used,
       max(CASE WHEN rn = least(n, {_KMV_K}) THEN h END) AS kth_hash,
       CASE WHEN n >= {_KMV_K}
            THEN ({_KMV_K} - 1) * {_HASH48_SPACE!r} / max(CASE WHEN rn = {_KMV_K} THEN h END)
            ELSE n::DOUBLE END AS est_distinct
FROM r GROUP BY event_type, n ORDER BY event_type
""")
def sketch_kmv_distinct(spark, sf):
    """KMV (k-minimum-values) distinct-count sketch per event_type —
    a DETERMINISTIC sketch (unlike HLL register layouts, which differ
    between engines): keep the k smallest 48-bit md5 hashes of the
    values; estimate = (k-1) * 2^48 / kth_min. Exactly reproducible in
    SQL, mergeable by taking the k smallest of a union (how a sketch
    rolls up across partitions/days), and exact below k values.

    Scale note: the per-type k-smallest runs as a row_number window
    over the DISTINCT (type, hash) frame — one shuffle of distinct
    hashes, <= k survivors per group reach the collect
    (ops/sketches.py:kmv_sketch)."""
    from lamapi_spark.ops.sketches import kmv_estimate, kmv_sketch

    e = load(spark, sf, "events")
    return (
        kmv_estimate(kmv_sketch(e, ["event_type"], "user_id", k=_KMV_K),
                     k=_KMV_K)
        .select("event_type", "k_used", "kth_hash", "est_distinct")
        .orderBy("event_type")
    )


@register("sketch_kmv_merge", """
WITH h AS (
  SELECT DISTINCT event_type,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 12))::UBIGINT)::BIGINT AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       least(n, {k})::BIGINT AS k_used,
       max(CASE WHEN rn = least(n, {k}) THEN h END) AS kth_hash,
       CASE WHEN n >= {k}
            THEN ({k} - 1) * {space!r} / max(CASE WHEN rn = {k} THEN h END)
            ELSE n::DOUBLE END AS est_distinct
FROM r GROUP BY event_type, n ORDER BY event_type
""".format(k=_KMV_K, space=_HASH48_SPACE))
def sketch_kmv_merge(spark, sf):
    """KMV MERGEABILITY under an independent oracle: sketch each of 8
    event_id-modulo shards separately, merge the shard sketches
    (union, re-take k smallest — ops/sketches.py:kmv_merge), estimate.
    The oracle computes the GLOBAL sketch directly from the raw table —
    green means merge-of-parts is bit-identical to sketch-of-union,
    the property that lets daily/partition sketches roll up at scale."""
    from lamapi_spark.ops.sketches import kmv_estimate, kmv_merge, kmv_sketch

    e = load(spark, sf, "events").withColumn(
        "shard", F.col("event_id") % F.lit(8))
    shards = kmv_sketch(e, ["event_type", "shard"], "user_id", k=_KMV_K)
    return (
        kmv_estimate(kmv_merge(shards, ["event_type"], k=_KMV_K), k=_KMV_K)
        .select("event_type", "k_used", "kth_hash", "est_distinct")
        .orderBy("event_type")
    )


@register("sketch_hist_quantiles", """
WITH h AS (
  SELECT event_type, floor(value / 10.0)::BIGINT AS bin,
         count(*)::BIGINT AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY event_type, bin
),
c AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM h
),
q AS (SELECT unnest([0.5, 0.95, 0.99]) AS q)
SELECT c.event_type, q.q,
       bin * 10.0 + 10.0 * (q.q * n - (cum - cnt)) / cnt AS est
FROM c JOIN q ON cum >= q.q * n AND cum - cnt < q.q * n
ORDER BY event_type, q
""")
def sketch_hist_quantiles(spark, sf):
    """Histogram-quantile sketch: fixed-width (10.0) bin counts per
    event_type (mergeable — counts add), then p50/p95/p99 by linear
    interpolation inside the first bin whose cumulative count reaches
    q*n (ops/sketches.py:hist_quantiles). Plain double arithmetic in a
    fixed order, so the oracle reproduces the estimates bit-for-bit."""
    from lamapi_spark.ops.sketches import hist_quantiles, hist_sketch

    e = load(spark, sf, "events")
    h = hist_sketch(e, ["event_type"], "value", width=10.0)
    return (hist_quantiles(h, ["event_type"], width=10.0,
                           qs=(0.5, 0.95, 0.99))
            .orderBy("event_type", "q"))


_CMS_POS = " , ".join(
    f"({r} * 64 + (('0x' || substr(md5('{r}|' || v), 1, 12))::UBIGINT % 64))::BIGINT"
    for r in range(4))


@register("sketch_cms_merge", f"""
WITH occ AS (
  SELECT event_type, user_id::VARCHAR AS v FROM events
  WHERE user_id IS NOT NULL),
pos AS (
  SELECT event_type, unnest([{_CMS_POS}]) AS idx FROM occ),
cells AS (
  SELECT event_type, idx, count(*)::BIGINT AS cnt
  FROM pos GROUP BY event_type, idx),
grid AS (
  SELECT t.event_type, r.i::INT AS i, coalesce(c.cnt, 0) AS cnt
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN range(0, 256) r(i)
  LEFT JOIN cells c ON c.event_type = t.event_type AND c.idx = r.i)
SELECT event_type,
       array_to_string(list(cnt::VARCHAR ORDER BY i), ',') AS cms_cells,
       sum(cnt)::BIGINT AS cells_total
FROM grid GROUP BY event_type ORDER BY event_type
""")
def sketch_cms_merge(spark, sf):
    """Count-Min MERGEABILITY under an independent oracle (the
    frequency member of the sketch family, ops/sketches.py:cms_sketch):
    sketch each of 8 event_id-modulo shards separately, sum-merge to
    event_type, and compare the merged 4x64 counter matrix CELL FOR
    CELL against the oracle's direct global sketch — merge-of-parts
    must be counter-identical to sketch-of-union (plain sums are
    associative/commutative, so shard rollup is exact)."""
    from lamapi_spark.ops.sketches import cms_merge, cms_sketch

    e = load(spark, sf, "events").withColumn(
        "shard", F.col("event_id") % F.lit(8))
    shards = cms_sketch(e, ["event_type", "shard"], "user_id")
    merged = cms_merge(shards, ["event_type"])
    return (
        merged.select(
            "event_type",
            F.array_join(F.transform("cms", lambda c: c.cast("string")),
                         ",").alias("cms_cells"),
            F.aggregate("cms", F.lit(0).cast("long"),
                        lambda a, c: a + c).alias("cells_total"))
        .orderBy("event_type")
    )


_CMS_PPOS = " , ".join(
    f"({r} * 64 + (('0x' || substr(md5('{r}|' || user_id::VARCHAR), 1, 12))"
    f"::UBIGINT % 64))::BIGINT"
    for r in range(4))


@register("sketch_cms_estimate", f"""
WITH occ AS (
  SELECT event_type, user_id::VARCHAR AS v FROM events
  WHERE user_id IS NOT NULL),
pos AS (
  SELECT event_type, unnest([{_CMS_POS}]) AS idx FROM occ),
cells AS (
  SELECT event_type, idx, count(*)::BIGINT AS cnt
  FROM pos GROUP BY event_type, idx),
probes AS (
  SELECT event_type, user_id, count(*)::BIGINT AS exact
  FROM events WHERE user_id % 101 = 0 GROUP BY event_type, user_id),
ppos AS (
  SELECT event_type, user_id, exact, unnest([{_CMS_PPOS}]) AS idx
  FROM probes)
SELECT p.event_type, p.user_id, p.exact,
       min(coalesce(c.cnt, 0))::BIGINT AS est
FROM ppos p
LEFT JOIN cells c ON c.event_type = p.event_type AND c.idx = p.idx
GROUP BY p.event_type, p.user_id, p.exact
ORDER BY p.event_type, p.user_id
""")
def sketch_cms_estimate(spark, sf):
    """Count-Min point estimates vs exact counts: probe every 101st
    user's per-type occurrence count against the sketch. The oracle
    rebuilds the full counter matrix AND the min-over-rows estimate;
    the pytest twin asserts est >= exact on every row (counters only
    ever add — the CMS one-sided error guarantee). The probe's exact
    count rides along so the gate also pins the overcount the 4x64
    matrix actually produces at this scale."""
    from lamapi_spark.ops.sketches import cms_estimate, cms_sketch

    e = load(spark, sf, "events")
    sketch = cms_sketch(e, ["event_type"], "user_id")
    probes = (e.filter(F.col("user_id") % 101 == 0)
              .groupBy("event_type", "user_id")
              .agg(F.count("*").alias("exact")))
    return (
        cms_estimate(sketch, probes, ["event_type"], "user_id")
        .select("event_type", "user_id", "exact", "est")
        .orderBy("event_type", "user_id")
    )


_BLOOM_POS = " , ".join(
    f"(('0x' || substr(md5('{i}|' || v), 1, 12))::UBIGINT % 256)::BIGINT"
    for i in range(4))


@register("sketch_bloom_merge", f"""
WITH vals AS (
  SELECT DISTINCT event_type, user_id::VARCHAR AS v FROM events),
pos AS (
  SELECT event_type, unnest([{_BLOOM_POS}]) AS p FROM vals),
words AS (
  SELECT event_type, (p // 32)::INT AS widx,
         bit_or(1::BIGINT << (p % 32)::INT) AS bits
  FROM pos GROUP BY event_type, (p // 32)::INT),
grid AS (
  SELECT t.event_type, r.i::INT AS i, coalesce(w.bits, 0) AS bits
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN range(0, 8) r(i)
  LEFT JOIN words w ON w.event_type = t.event_type AND w.widx = r.i)
SELECT event_type,
       array_to_string(list(bits::VARCHAR ORDER BY i), ',') AS bloom_words,
       sum(bit_count(bits))::INT AS n_set_bits
FROM grid GROUP BY event_type ORDER BY event_type
""")
def sketch_bloom_merge(spark, sf):
    """Bloom MERGEABILITY under an independent oracle (the membership
    member of the sketch family, ops/sketches.py:bloom_sketch): sketch
    each of 8 event_id-modulo shards separately, bit_or-merge to
    event_type, and compare the merged 256-bit filter WORD FOR WORD
    against the oracle's direct global sketch — merge-of-parts must be
    bit-identical to sketch-of-union."""
    from lamapi_spark.ops.sketches import bloom_merge, bloom_sketch

    e = load(spark, sf, "events").withColumn(
        "shard", F.col("event_id") % F.lit(8))
    shards = bloom_sketch(e, ["event_type", "shard"], "user_id")
    merged = bloom_merge(shards, ["event_type"])
    return (
        merged.select(
            "event_type",
            F.array_join(F.transform("bloom", lambda w: w.cast("string")),
                         ",").alias("bloom_words"),
            F.aggregate("bloom", F.lit(0),
                        lambda a, w: a + F.bit_count(w)).alias("n_set_bits"))
        .orderBy("event_type")
    )


_RESAMPLE_STEP = 7_200_000_000  # 2h in micros


@register("events_resample", f"""
WITH e AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ts_us,
         max_by(value, event_id) AS value
  FROM events WHERE event_type = 'view' AND user_id % 17 = 0
  GROUP BY user_id, ts
),
b AS (
  SELECT user_id,
         (min(ts_us) // {_RESAMPLE_STEP}) * {_RESAMPLE_STEP} AS lo,
         (max(ts_us) // {_RESAMPLE_STEP}) * {_RESAMPLE_STEP} AS hi
  FROM e GROUP BY user_id),
g AS (
  SELECT user_id, unnest(generate_series(lo, hi, {_RESAMPLE_STEP})) AS grid_ts
  FROM b)
SELECT g.user_id, g.grid_ts, e.ts_us AS asof_ts, e.value AS asof_value
FROM g ASOF LEFT JOIN e
  ON g.user_id = e.user_id AND g.grid_ts >= e.ts_us
ORDER BY g.user_id, g.grid_ts
""")
def events_resample(spark, sf):
    """Gap-fill/resample (ops/temporal.py:resample_ffill): every 17th
    user's 'view' value forward-filled onto a regular 2-hour grid
    spanning their own event range — the hypertable resample next to
    events_rollup. The oracle generates the same grid and fills it
    with DuckDB's NATIVE ASOF JOIN (an independent engine
    implementation, like events_asof_state's)."""
    from lamapi_spark.ops.temporal import resample_ffill

    e = (_events_us(spark, sf)
         .filter((F.col("event_type") == "view")
                 & (F.col("user_id") % 17 == 0))
         .groupBy("user_id", "ts_us")
         .agg(F.max(F.struct(F.col("event_id").alias("eid"),
                             F.col("value").alias("v"))).alias("_m"))
         .select("user_id", "ts_us", F.col("_m.v").alias("value")))
    return (
        resample_ffill(e, key="user_id", ts="ts_us",
                       payload=("value",), step_us=_RESAMPLE_STEP)
        .select("user_id", "grid_ts", "asof_ts", "asof_value")
        .orderBy("user_id", "grid_ts")
    )


# ------------------------------------- interval x interval overlap join

_IVJ_DAY = 86_400_000_000  # one day in micros

@register("events_interval_join", f"""
WITH lo AS (
  SELECT o_orderkey, o_custkey % 50 AS grp,
         epoch_us(o_orderdate)::BIGINT AS l_lo_us,
         epoch_us(o_orderdate)::BIGINT + 14 * {_IVJ_DAY} AS l_hi_us
  FROM orders WHERE o_orderkey % 13 = 0),
ro AS (
  SELECT l_orderkey, l_linenumber, l_suppkey % 50 AS grp,
         epoch_us(l_shipdate)::BIGINT AS r_lo_us,
         epoch_us(l_shipdate)::BIGINT
           + l_linenumber * 2 * {_IVJ_DAY} AS r_hi_us
  FROM lineitem WHERE l_orderkey % 7 = 0)
SELECT l.o_orderkey, l.grp, l.l_lo_us, l.l_hi_us,
       r.l_orderkey, r.l_linenumber, r.r_lo_us, r.r_hi_us
FROM lo l JOIN ro r
  ON l.grp = r.grp AND l.l_lo_us <= r.r_hi_us AND r.r_lo_us <= l.l_hi_us
ORDER BY l.o_orderkey, r.l_orderkey, r.l_linenumber
""")
def events_interval_join_q(spark, sf):
    """Interval x interval overlap join
    (ops/temporal.py:interval_overlap_join): order windows [orderdate,
    +14d] against shipment windows [shipdate, +linenumber*2d] on a
    50-way key — coarse-bin replication turns the would-be
    BroadcastNestedLoopJoin into an equi-join on (key, bin), and each
    overlapping pair is emitted exactly once from the bin holding
    max(lo). The oracle is the INDEPENDENT formulation: DuckDB's
    native inequality join over the same intervals."""
    from lamapi_spark.ops.temporal import interval_overlap_join

    lo = (load(spark, sf, "orders")
          .filter(F.col("o_orderkey") % 13 == 0)
          .select(
              "o_orderkey",
              (F.col("o_custkey") % 50).alias("grp"),
              F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("l_lo_us"))
          .withColumn("l_hi_us", F.col("l_lo_us") + 14 * _IVJ_DAY))
    ro = (load(spark, sf, "lineitem")
          .filter(F.col("l_orderkey") % 7 == 0)
          .select(
              "l_orderkey", "l_linenumber",
              (F.col("l_suppkey") % 50).alias("grp"),
              F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("r_lo_us"))
          .withColumn(
              "r_hi_us",
              F.col("r_lo_us") + F.col("l_linenumber").cast("long")
              * F.lit(2 * _IVJ_DAY)))
    # one-day bins: order windows span 15 bins, shipment windows <= 15
    return (interval_overlap_join(lo, ro, key="grp",
                                  bin_s=_IVJ_DAY // 1_000_000)
            .select("o_orderkey", "grp", "l_lo_us", "l_hi_us",
                    "l_orderkey", "l_linenumber", "r_lo_us", "r_hi_us")
            .orderBy("o_orderkey", "l_orderkey", "l_linenumber"))


# -------------------------------------------------------- HyperLogLog

_HLL_B, _HLL_M = 6, 64
_HLL_ALPHA_M = 0.709  # Flajolet et al. alpha_64

_HLL_EST_SQL = f"""round_even(
  CASE WHEN {_HLL_ALPHA_M!r} * {_HLL_M * _HLL_M} / list_reduce(
         list_prepend(0.0::DOUBLE,
           list_transform(regs, v -> power(2.0, -v))), (x, y) -> x + y)
       <= {2.5 * _HLL_M!r}
       AND len(list_filter(regs, v -> v = 0)) > 0
  THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r}
       / len(list_filter(regs, v -> v = 0)))
  ELSE {_HLL_ALPHA_M!r} * {_HLL_M * _HLL_M} / list_reduce(
         list_prepend(0.0::DOUBLE,
           list_transform(regs, v -> power(2.0, -v))), (x, y) -> x + y)
  END, 6)"""

_HLL_REGS_SQL = f"""hx AS (
  SELECT DISTINCT event_type,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 12))::UBIGINT)::BIGINT AS h
  FROM events),
hr AS (
  SELECT event_type, (h % {_HLL_M})::INT AS reg,
         h // {_HLL_M} AS w
  FROM hx),
rk AS (
  SELECT event_type, reg,
         max(CASE WHEN w = 0 THEN {48 - _HLL_B + 1}
             ELSE {48 - _HLL_B + 1} - length(to_base(w, 2)) END)::INT AS rank
  FROM hr GROUP BY event_type, reg),
dense AS (
  SELECT g.event_type, s.reg, coalesce(r.rank, 0) AS rank
  FROM (SELECT DISTINCT event_type FROM events) g
  CROSS JOIN (SELECT reg::INT AS reg FROM range(0, {_HLL_M}) t(reg)) s
  LEFT JOIN rk r ON r.event_type = g.event_type AND r.reg = s.reg),
hll AS (
  SELECT event_type, list(rank ORDER BY reg) AS regs
  FROM dense GROUP BY event_type)"""


@register("sketch_hll_merge", f"""
WITH {_HLL_REGS_SQL}
SELECT event_type, array_to_string(regs, ' ') AS regs_str,
       len(list_filter(regs, v -> v = 0))::INT AS n_zero,
       {_HLL_EST_SQL} AS est_distinct
FROM hll ORDER BY event_type
""")
def sketch_hll_merge(spark, sf):
    """HLL MERGEABILITY under an independent oracle: sketch each of 8
    event_id-modulo shards separately, merge by register max
    (ops/sketches.py:hll_merge), estimate. The oracle computes the
    GLOBAL register array directly from the raw table — green means
    merge-of-parts is register-for-register identical to
    sketch-of-union, and the estimate chain (exact power-of-two fold,
    small-range linear counting, round-even 6) reproduces bit-for-bit
    in DuckDB."""
    from lamapi_spark.ops.sketches import hll_estimate, hll_merge, hll_sketch

    e = load(spark, sf, "events").withColumn(
        "shard", F.col("event_id") % F.lit(8))
    shards = hll_sketch(e, ["event_type", "shard"], "user_id", b=_HLL_B)
    merged = hll_estimate(hll_merge(shards, ["event_type"], b=_HLL_B),
                          b=_HLL_B)
    return (
        merged.select(
            "event_type",
            F.array_join(F.col("regs").cast("array<string>"),
                         " ").alias("regs_str"),
            "n_zero", "est_distinct")
        .orderBy("event_type")
    )
