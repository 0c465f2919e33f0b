"""Temporal join operators Spark's built-ins don't provide directly:
as-of join and interval/range join — the builder's-brief "custom
operator" axis (reference analogue: none; the reference has no temporal
queries). Both are compositions of existing DataFrame ops chosen for
their SCALE shape, not mapInPandas fallbacks:

- as-of join: the union + partitioned-sort + last-non-null carry —
  ONE shuffle on the key, one in-partition sort, state O(1) per row
  (the classic merge-join formulation; a point-in-time join per left
  row would be a per-row subquery, and Spark's own inequality join
  would fall back to a broadcast-nested-loop).
- range join: coarse time-bin replication + equi-join + exact filter —
  turns an inequality join (BroadcastNestedLoopJoin: O(|L|*|R|) work,
  single-node build side) into a shuffled hash join on (key, bin).
  ``bin_s`` trades replication of the interval side (ceil(len/bin)
  copies) against join selectivity; points are never replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame, right: DataFrame, key: str,
    left_ts: str = "ts_us", right_ts: str = "ts_us",
    payload: tuple[str, ...] = ("value",),
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` on the same key (backward as-of, inclusive
    — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics), as columns
    ``asof_<payload>...`` plus ``asof_ts`` (null when no prior right
    row, or when it is older than ``tolerance_us``).

    CONTRACT: right must be unique per (key, right_ts) — pre-aggregate
    ties away (a duplicate would make the carried payload depend on
    sort-tie order). Timestamps are integer micros (engine-portable).

    Implementation: tag and union both sides, sort each key partition
    by (ts, right-first-on-ties), carry the right payload forward with
    last(ignorenulls) over an unbounded-preceding window, keep left
    rows. One exchange, one sort; the window state is a single row.
    """
    lcols = [c for c in left.columns]
    l = (left.withColumn("_ts", F.col(left_ts).cast("long"))
         .withColumn("_is_r", F.lit(0)))
    for p in payload:
        l = l.withColumn(f"_p_{p}", F.lit(None).cast(
            dict(right.dtypes)[p]))
    r = (right.withColumn("_ts", F.col(right_ts).cast("long"))
         .withColumn("_is_r", F.lit(1)))
    for p in payload:
        r = r.withColumn(f"_p_{p}", F.col(p))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [key, "_ts", "_is_r", *[f"_p_{p}" for p in payload],
            *[c for c in lcols if c != key]]
    u = l.select(*cols).unionByName(r.select(*cols))

    # right rows sort before left rows at the same timestamp, so an
    # equal-ts right row IS visible to the left row (inclusive >=)
    w = (Window.partitionBy(key).orderBy(F.col("_ts"), F.desc("_is_r"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"asof_{p}")
               for p in payload]
    m_ts = F.last(F.when(F.col("_is_r") == 1, F.col("_ts")),
                  ignorenulls=True).over(w).alias("asof_ts")
    out = (u.select(*cols, *carried, m_ts)
           .filter(F.col("_is_r") == 0))
    if tolerance_us is not None:
        stale = (F.col("asof_ts").isNull()
                 | (F.col("_ts") - F.col("asof_ts") > tolerance_us))
        out = out.select(
            *cols, "asof_ts",
            *[F.when(stale, F.lit(None)).otherwise(F.col(f"asof_{p}"))
              .alias(f"asof_{p}") for p in payload]
        ).withColumn("asof_ts",
                     F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")))
    return out.select(*lcols, "asof_ts",
                      *[f"asof_{p}" for p in payload])


def range_join_binned(
    intervals: DataFrame, points: DataFrame, key: str,
    lo: str = "lo_us", hi: str = "hi_us", pt_ts: str = "ts_us",
    bin_s: int = 1800,
) -> DataFrame:
    """All (interval, point) pairs on the same key with
    ``lo <= pt_ts <= hi`` — via coarse-bin replication: each interval
    explodes to its covered bins, each point maps to its ONE bin, the
    pair space shrinks to an equi-join on (key, bin) plus the exact
    containment filter. No pair duplicates by construction (a point
    lives in exactly one bin). Returns intervals' columns + points'.

    Bins are floor(ts / bin) in integer micros; intervals must satisfy
    lo <= hi. Skewed bins (a hot key x time window) are ordinary
    equi-join skew — AQE splits them like any other.
    """
    bw = F.lit(int(bin_s) * 1_000_000)
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(lo) / bw),
                             F.floor(F.col(hi) / bw))))
    pt = points.withColumn("_bin", F.floor(F.col(pt_ts) / bw))
    return (
        iv.join(pt, [key, "_bin"])
        .filter(F.col(pt_ts).between(F.col(lo), F.col(hi)))
        .drop("_bin")
    )


def resample_ffill(
    events: DataFrame, key: str, ts: str = "ts_us",
    payload: tuple[str, ...] = ("value",), step_us: int = 3_600_000_000,
) -> DataFrame:
    """Hypertable-style gap-fill/resample: per key, a regular grid of
    timestamps at ``step_us`` spacing (aligned to epoch multiples,
    spanning floor(min/step)*step .. floor(max/step)*step of the key's
    own event range) with the latest at-or-before payload carried onto
    every grid point (forward fill; a leading grid point with no prior
    event carries nulls). CONTRACT: events unique per (key, ts), same
    as asof_join.

    Composition, not new machinery: the grid is a bounded sequence()
    explode off the per-key min/max aggregate (grid size = span/step
    BY CONSTRUCTION — the resample contract), and the fill is exactly
    the proven asof_join (one shuffle + one in-partition sort, O(1)
    window state). Returns (key, grid_ts, asof_ts, asof_<payload>...).
    """
    step = F.lit(int(step_us))
    bounds = events.groupBy(key).agg(
        (F.floor(F.min(F.col(ts).cast("long")) / step) * step).alias("_lo"),
        (F.floor(F.max(F.col(ts).cast("long")) / step) * step).alias("_hi"))
    grid = bounds.select(
        key, F.explode(F.sequence("_lo", "_hi", step)).alias("grid_ts"))
    return asof_join(grid, events, key=key, left_ts="grid_ts",
                     right_ts=ts, payload=payload)


def interval_overlap_join(
    left: DataFrame, right: DataFrame, key: str,
    l_lo: str = "l_lo_us", l_hi: str = "l_hi_us",
    r_lo: str = "r_lo_us", r_hi: str = "r_hi_us",
    bin_s: int = 1800,
) -> DataFrame:
    """All (left, right) interval pairs on the same key that OVERLAP
    (inclusive: ``l_lo <= r_hi AND r_lo <= l_hi``) — the
    interval x interval generalization of range_join_binned, and the
    other join Catalyst would plan as a BroadcastNestedLoopJoin.

    Both sides explode to their covered coarse bins and the pair space
    becomes an equi-join on (key, bin). An overlapping pair shares
    EVERY bin between max(lo) and min(hi), so emitting the pair only
    from the bin that contains max(l_lo, r_lo) — a bin both sides
    provably cover — yields each pair EXACTLY once with no distinct
    pass (the dedup-free trick range_join_binned gets for free from
    points living in one bin). Returns left's columns + right's.

    Bounds are integer micros with lo <= hi on both sides; bin_s
    trades replication factor (interval_span/bin) against per-bin
    join fan-in, exactly as in range_join_binned; hot (key, bin)
    cells are ordinary equi-join skew for AQE."""
    bw = F.lit(int(bin_s) * 1_000_000)
    lv = left.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(l_lo) / bw),
                             F.floor(F.col(l_hi) / bw))))
    rv = right.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(r_lo) / bw),
                             F.floor(F.col(r_hi) / bw))))
    return (
        lv.join(rv, [key, "_bin"])
        .filter((F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi)))
        .filter(F.col("_bin")
                == F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / bw))
        .drop("_bin")
    )


def burst_detection(events: DataFrame, key_col: str = "event_type",
                    ts_col: str = "ts", bin_s: int = 86400,
                    trail_bins: int = 7, factor_bp: int = 20000,
                    min_prev_bins: int = 3) -> DataFrame:
    """Per-key rate-spike detection over fixed time bins — the ingest
    anomaly monitor a transcript/event feed runs continuously (a
    tool's call rate tripling overnight is either an incident or a
    data bug; both need flagging before the corpus absorbs them).
    Reference analogue: none; builder's-brief temporal QC beside
    gap_fill.

    A bin bursts when its count exceeds ``factor_bp``/10000 times the
    trailing-``trail_bins`` mean, decided by the EXACT integer product
    ``cnt * 10000 * n_prev >= factor_bp * prev_sum`` (no float mean),
    requiring >= ``min_prev_bins`` of history and a non-empty bin; a
    first-activity bin after a fully quiet trailing window bursts by
    convention (0-baseline = infinite ratio).

    Scale shape: one (key, bin) count agg; the dense per-key grid
    comes from ONE sequence explode bounded by each key's own active
    span / bin_s (the gap_fill bound — a key active for a year at
    daily bins adds 365 rows); trailing stats are a ROWS window
    per key over that bounded grid. -> (key, bin, cnt, prev_sum,
    n_prev, burst) for every dense bin.
    """
    b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bin_s) * 1_000_000)).cast("long")
    cnt = (events.select(F.col(key_col).alias("key"), b.alias("bin"))
           .groupBy("key", "bin").agg(F.count("*").alias("cnt")))
    span = cnt.groupBy("key").agg(F.min("bin").alias("_lo"),
                                  F.max("bin").alias("_hi"))
    grid = span.select(
        "key", F.explode(F.sequence("_lo", "_hi")).alias("bin"))
    dense = (grid.join(cnt, ["key", "bin"], "left")
             .withColumn("cnt", F.coalesce("cnt", F.lit(0)).cast("long")))
    w = (Window.partitionBy("key").orderBy("bin")
         .rowsBetween(-int(trail_bins), -1))
    out = dense.select(
        "key", "bin", "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
        .alias("prev_sum"),
        F.count("cnt").over(w).cast("long").alias("n_prev"))
    burst = ((F.col("cnt") > 0)
             & (F.col("n_prev") >= F.lit(int(min_prev_bins)))
             & (F.col("cnt") * 10000 * F.col("n_prev")
                >= F.lit(int(factor_bp)) * F.col("prev_sum")))
    return out.withColumn("burst", burst)


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bin_s: int = 86400 * 7) -> DataFrame:
    """Cohort retention matrix over an activity stream: users cohort
    by their FIRST-activity period; each later period counts how many
    of that cohort came back — the standard retention triangle every
    usage dashboard draws, as one distributed job (reference
    analogue: none; builder's-brief temporal analytics beside
    burst_detection).

    Periods are fixed ``bin_s`` buckets of the epoch (default weekly)
    — calendar-free integer arithmetic both engines share (month
    arithmetic differs between engines; epoch division does not).
    retained_bp = retained * 10000 div cohort_size, exact integer.
    offset 0 rows are the cohort sizes themselves (retained_bp =
    10000 by construction — a cheap self-check the oracle hashes too).

    Scale shape: one distinct on (user, period) — the activity grain
    — one min-agg per user for the cohort (map-side combinable), one
    broadcast-sized cohort-size frame, one (cohort, offset) count
    agg. No window. -> (cohort, week_offset, retained, cohort_size,
    retained_bp) for observed (cohort, offset) pairs; the offset
    column is named week_offset at the default weekly bin (OFFSET is
    a reserved word in several engines).
    """
    per = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                  / F.lit(int(bin_s) * 1_000_000)).cast("long")
    act = (events.select(F.col(user_col).alias("u"), per.alias("p"))
           .distinct())
    first = act.groupBy("u").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    ret = (act.join(first, "u")
           .groupBy("cohort",
                    (F.col("p") - F.col("cohort")).alias("week_offset"))
           .agg(F.count("*").alias("retained")))
    return (ret.join(F.broadcast(sizes), "cohort")
            .select("cohort", "week_offset", "retained", "cohort_size",
                    F.expr("retained * 10000L div cohort_size")
                    .alias("retained_bp")))


def funnel_analysis(events: DataFrame, steps: list[str],
                    user_col: str = "user_id", type_col: str = "event_type",
                    ts_col: str = "ts") -> DataFrame:
    """Ordered-funnel conversion: how many users performed step 1,
    then step 2 STRICTLY AFTER it, then step 3 after that — the
    sequential-pattern query sessionization feeds (reference
    analogue: none; builder's-brief temporal analytics beside
    cohort_retention).

    Sequential-min semantics: t_1 = the user's earliest step-1 event;
    t_k = the earliest step-k event with ts STRICTLY greater than
    t_{k-1} (a simultaneous-timestamp pair does not chain — the
    deterministic reading of 'then'; ties inside one step resolve by
    the (ts, type) struct sort). A user reaches step k iff t_k
    exists.

    Scale shape: events filtered to the step types FIRST (column
    prune + pushed filter), then ONE per-user aggregation collecting
    the sorted (ts, type) array — bounded by the user's own
    step-event count — and the chain evaluated as in-row filter/
    element_at expressions (the in-array fold idiom; no k-way
    non-equi self-join, which is the classic funnel-query trap at
    10^12 events). Final rollup is one tiny per-step aggregate.

    -> (step_idx, step, n_users, conv_bp) with conv_bp the exact
    integer share of step-1 reachers (step 1 row reads 10000).
    """
    tps = [str(s) for s in steps]
    ev = (events.filter(F.col(type_col).isin(tps))
          .select(F.col(user_col).alias("u"),
                  F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
                  F.col(type_col).alias("tp")))
    per = ev.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("t", "tp"))).alias("_a"))
    cur = per
    prev_t = None
    flags = []
    def _first(step):
        return lambda x: x.tp == step

    def _next(step, prev):
        return lambda x: (x.tp == step) & (x.t > F.col(prev))

    for i, s in enumerate(tps):
        col = f"_t{i}"
        pred = _first(s) if prev_t is None else _next(s, prev_t)
        # F.get is 0-based and NULL on out-of-bounds (element_at
        # throws under ANSI mode when the filtered array is empty)
        expr = F.get(F.filter("_a", pred), 0).t
        cur = cur.withColumn(col, expr)
        flags.append(F.sum(F.col(col).isNotNull().cast("long"))
                     .alias(f"_n{i}"))
        prev_t = col
    agg = cur.agg(*flags)
    rows = None
    for i, s in enumerate(tps):
        one = agg.select(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"_n{i}").cast("long").alias("n_users"),
            F.expr(f"_n{i} * 10000L div greatest(_n0, 1L)")
            .alias("conv_bp"))
        rows = one if rows is None else rows.unionByName(one)
    return rows


def cusum_changepoints(events: DataFrame, key_col: str = "event_type",
                       ts_col: str = "ts", bin_s: int = 86400,
                       baseline_bins: int = 7, k_bp: int = 5000,
                       h_bp: int = 30000) -> DataFrame:
    """Per-key CUSUM level-shift detection over fixed time bins — the
    changepoint twin of burst_detection (a spike is one hot bin; a
    changepoint is a SUSTAINED rate shift that per-bin factor gates
    never flag because no single bin is extreme). Page's two-sided
    CUSUM (Page 1954) against a baseline learned from each key's
    first ``baseline_bins`` bins. Reference analogue: none;
    builder's-brief temporal QC.

    Exact-integer formulation: with baseline sum bs over bn =
    min(baseline_bins, span) bins and D = 10000 * bn, the scaled
    recurrences over monitored bins (t > baseline_bins)

        su_t = max(0, su_{t-1} + cnt_t*D - bs*(10000 + k_bp))
        sd_t = max(0, sd_{t-1} + bs*(10000 - k_bp) - cnt_t*D)

    are the textbook mu0*(1 +- k) slack forms multiplied through by
    D — every term BIGINT (exact to ~1e9 events/bin over ~1e4-bin
    spans), alarm when s > h_bp * bs (= h_bp/10000 * mu0 * D). Bins
    inside the baseline window emit s = 0 / no alarm (burn-in); an
    all-quiet baseline (bs = 0) alarms on the first activity by
    convention (burst_detection's 0-baseline rule). The contract
    oracle computes the SAME su/sd through the independent closed
    form S_t = C_t - min(0, running-min C) over prefix sums — green
    proves recurrence and closed form agree integer for integer.

    Scale shape: one (key, bin) count agg, the gap_fill-bounded dense
    grid, then ONE key-keyed collect into a span-bounded sorted array
    where the sequential recurrence runs in-row (a recurrence is one
    exchange as a fold; as a window chain it is the same exchange
    plus two window passes). -> (key, bin, cnt, su, sd, alarm_up,
    alarm_dn) for every dense bin.
    """
    b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bin_s) * 1_000_000)).cast("long")
    cnt = (events.select(F.col(key_col).alias("key"), b.alias("bin"))
           .groupBy("key", "bin").agg(F.count("*").alias("cnt")))
    span = cnt.groupBy("key").agg(F.min("bin").alias("_lo"),
                                  F.max("bin").alias("_hi"))
    grid = span.select(
        "key", F.explode(F.sequence("_lo", "_hi")).alias("bin"))
    dense = (grid.join(cnt, ["key", "bin"], "left")
             .withColumn("cnt", F.coalesce("cnt", F.lit(0)).cast("long")))
    g = dense.groupBy("key").agg(
        F.sort_array(F.collect_list(F.struct("bin", "cnt"))).alias("_a"))
    arr = F.col("_a")
    bn = F.least(F.lit(int(baseline_bins)), F.size(arr)).cast("long")
    bs = F.aggregate(F.slice(arr, F.lit(1), bn), F.lit(0).cast("long"),
                     lambda a, x: a + x["cnt"])
    d = F.lit(10000).cast("long") * bn
    up_off = bs * F.lit(10000 + int(k_bp))
    dn_off = bs * F.lit(10000 - int(k_bp))
    thr = F.lit(int(h_bp)) * bs
    zero = F.lit(0).cast("long")
    init = F.struct(zero.alias("su"), zero.alias("sd"),
                    F.array().cast(
                        "array<struct<bin:bigint,cnt:bigint,su:bigint,"
                        "sd:bigint,alarm_up:boolean,alarm_dn:boolean>>")
                    .alias("out"))

    def fold(acc, e):
        t = F.size(acc["out"]) + 1
        mon = t > F.lit(int(baseline_bins))
        su = F.when(mon, F.greatest(
            zero, acc["su"] + e["cnt"] * d - up_off)).otherwise(zero)
        sd = F.when(mon, F.greatest(
            zero, acc["sd"] + dn_off - e["cnt"] * d)).otherwise(zero)
        row = F.struct(e["bin"].alias("bin"), e["cnt"].alias("cnt"),
                       su.alias("su"), sd.alias("sd"),
                       (mon & (su > thr)).alias("alarm_up"),
                       (mon & (sd > thr)).alias("alarm_dn"))
        return F.struct(su.alias("su"), sd.alias("sd"),
                        F.concat(acc["out"], F.array(row)).alias("out"))

    folded = g.select("key", F.aggregate(
        arr, init, fold, lambda acc: acc["out"]).alias("_o"))
    return (folded.select("key", F.explode("_o").alias("r"))
            .select("key", F.col("r.bin").alias("bin"),
                    F.col("r.cnt").alias("cnt"),
                    F.col("r.su").alias("su"), F.col("r.sd").alias("sd"),
                    F.col("r.alarm_up").alias("alarm_up"),
                    F.col("r.alarm_dn").alias("alarm_dn")))


def decayed_counts(events: DataFrame, key_col: str = "event_type",
                   ts_col: str = "ts", bin_s: int = 86400,
                   half_life_bins: int = 7) -> DataFrame:
    """Exponentially-decayed activity score per key — the
    recency-weighted popularity a linker's prior actually wants
    (lamAPI ranks candidates by STATIC popularity, reference
    lookup.py's popularity sort; a transcript-fed KG can weight the
    same signal by freshness so last quarter's hot entity outranks a
    long-dead one at equal lifetime counts):

        score(key) = sum over active bins b of
                     cnt_b * 2^(-(as_of - b) / half_life_bins)

    with as_of = the corpus's max bin (a 1-row broadcast — no driver
    round-trip). Float discipline: each term is one pow(2, -age/hl)
    double, summed IN BIN ORDER by an in-row left fold from 0.0
    (x + 0.0 is exact, so the oracle's first-element-seeded
    list_reduce associates identically), half-even 6 dp.

    Scale shape: one (key, bin) count agg (map-side combinable — a
    hot key costs one cell per partition per active bin), one
    key-keyed collect of the SPARSE active-bin cells (zero bins
    contribute zero — no dense-grid explode needed, unlike
    burst/cusum which must see silence), one crossJoin broadcast of
    the 1-row as_of frame. -> (key, n_events, last_bin, score).
    """
    b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                / F.lit(int(bin_s) * 1_000_000)).cast("long")
    cnt = (events.select(F.col(key_col).alias("key"), b.alias("bin"))
           .groupBy("key", "bin").agg(F.count("*").alias("cnt")))
    as_of = cnt.agg(F.max("bin").alias("_ao"))
    g = (cnt.groupBy("key")
         .agg(F.sort_array(F.collect_list(
             F.struct("bin", "cnt"))).alias("_a"),
             F.sum("cnt").alias("n_events"),
             F.max("bin").alias("last_bin"))
         .join(F.broadcast(as_of)))
    term = lambda e: (e["cnt"].cast("double") * F.pow(
        F.lit(2.0), -(F.col("_ao") - e["bin"]).cast("double")
        / F.lit(float(half_life_bins))))
    score = F.aggregate(F.col("_a"), F.lit(0.0),
                        lambda acc, e: acc + term(e))
    return g.select("key", "n_events", "last_bin",
                    F.bround(score, 6).alias("score"))


def turn_latency_stats(transcripts: DataFrame, conv_col: str = "conv_id",
                       idx_col: str = "turn_idx", role_col: str = "role",
                       ts_col: str = "ts") -> DataFrame:
    """Per-role response-latency rollup over conversation transcripts
    — how long each speaker class (assistant, tool, user) takes to
    produce its turn, measured as ts(turn) - ts(previous turn) within
    the conversation under the north rule's stable turn ordering. The
    first turn of a conversation has no predecessor and is excluded.
    The operational dashboard number for an agent-transcript corpus
    (reference analogue: none; builder's-brief transcript analytics
    beside sessionize/transcript_stats).

    Exactness: latencies are integer MICROSECONDS (unix_micros — the
    queries_temporal parity rule); mean_us is the exact integer
    division sum DIV n (floor), min/max/sum exact BIGINTs — no floats
    anywhere.

    Scale shape: ONE conversation-keyed collect into a turn-bounded
    sorted array, consecutive pairing as an in-row transform (a lag
    window is the same exchange plus a window pass), explode of the
    n-1 latency rows, one role-keyed hash agg (bounded by the role
    vocabulary). -> (role, n, sum_us, mean_us, min_us, max_us).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    g = (transcripts.select(F.col(conv_col).alias("_c"),
                            F.col(idx_col).alias("_i"),
                            F.col(role_col).alias("_r"), us.alias("_t"))
         .groupBy("_c")
         .agg(F.sort_array(F.collect_list(
             F.struct("_i", "_r", "_t"))).alias("_a")))
    arr = F.col("_a")
    lats = F.transform(
        F.sequence(F.lit(2), F.greatest(F.size(arr), F.lit(1))),
        lambda i: F.struct(
            F.element_at(arr, i)["_r"].alias("role"),
            (F.element_at(arr, i)["_t"]
             - F.element_at(arr, i - 1)["_t"]).alias("lat")))
    rows = (g.filter(F.size(arr) >= 2)
            .select(F.explode(lats).alias("e"))
            .select(F.col("e.role").alias("role"),
                    F.col("e.lat").alias("lat")))
    agg = rows.groupBy("role").agg(
        F.count("*").alias("n"), F.sum("lat").alias("sum_us"),
        F.min("lat").alias("min_us"), F.max("lat").alias("max_us"))
    return agg.select(
        "role", "n", "sum_us",
        F.expr("sum_us DIV n").alias("mean_us"), "min_us", "max_us")


def allen_relations(intervals: DataFrame, key_col: str = "key",
                    id_col: str = "id", lo_col: str = "lo_us",
                    hi_col: str = "hi_us",
                    max_per_key: int = 10_000) -> DataFrame:
    """Allen's interval algebra over key-sharing interval pairs — the
    full 13-relation classification (before/meets/overlaps/starts/
    during/finishes, their inverses, equals) of every pair of fact
    validity intervals on the same key: the temporal-KG consistency
    primitive ("two term-of-office facts for one subject: disjoint,
    touching, or conflicting?") that a bare overlap join
    (interval_overlap_join) collapses to one bit. Reference analogue:
    none; builder's-brief temporal surface beside fact_intervals.

    Relations are named for the SMALLER-id member A against B, so
    each unordered pair emits exactly one row and the relation is a
    pure function of the interval set (string-ordered ids, integer
    micros bounds). The classifier is an ordered, mutually-exclusive
    decision cascade on exact integer comparisons — equality cases
    (equals/meets/starts/finishes and inverses) are checked BEFORE
    the strict-order residue, so degenerate (point) intervals
    classify deterministically too.

    Scale shape: the Allen census is inherently all-pairs per key, so
    keys are bounded — max_per_key drops over-cap keys entirely (the
    kendall_tau_by contract: the caller picks a keying with bounded
    cardinality; an overlap-restricted workload should use
    interval_overlap_join's banding instead). The pair join is a
    key-co-partitioned self-equi-join; no window, no driver loop.
    -> (key, id_a, id_b, relation).
    """
    base = intervals.select(F.col(key_col).alias("key"),
                            F.col(id_col).alias("id"),
                            F.col(lo_col).cast("long").alias("lo"),
                            F.col(hi_col).cast("long").alias("hi"))
    ok = (base.groupBy("key").agg(F.count("*").alias("_n"))
          .filter(F.col("_n") <= max_per_key).select("key"))
    base = base.join(ok, "key")
    a = base.select("key", F.col("id").alias("id_a"),
                    F.col("lo").alias("_al"), F.col("hi").alias("_ah"))
    b = base.select("key", F.col("id").alias("id_b"),
                    F.col("lo").alias("_bl"), F.col("hi").alias("_bh"))
    p = a.join(b, "key").filter(F.col("id_a") < F.col("id_b"))
    al, ah, bl, bh = (F.col("_al"), F.col("_ah"),
                      F.col("_bl"), F.col("_bh"))
    rel = (F.when((al == bl) & (ah == bh), "equals")
           .when(ah < bl, "before")
           .when(bh < al, "after")
           .when(ah == bl, "meets")
           .when(bh == al, "met_by")
           .when((al == bl) & (ah < bh), "starts")
           .when((al == bl) & (ah > bh), "started_by")
           .when((ah == bh) & (al > bl), "finishes")
           .when((ah == bh) & (al < bl), "finished_by")
           .when((al > bl) & (ah < bh), "during")
           .when((al < bl) & (ah > bh), "contains")
           .when((al < bl) & (ah < bh), "overlaps")
           .otherwise("overlapped_by"))
    return p.select("key", "id_a", "id_b", rel.alias("relation"))


def acf_by(df: DataFrame, key_col: str, order_cols: list[str],
           val_col: str, max_lag: int = 5,
           max_n: int = 32768) -> DataFrame:
    """Per-key sequence autocorrelation r_1..r_max_lag — the
    periodicity/trend probe a monitoring pipeline runs beside
    burst_detection and cusum_changepoints (an hourly-seasonal metric
    shows r_24 spikes; a trending one shows slow lag-1 decay). Sequence
    ACF over the per-key (order_cols)-ordered series — timestamps
    order the series, they don't weight it.

        r_l = sum_t (x_t - xbar)(x_{t+l} - xbar) / sum_t (x_t - xbar)^2

    Exact integers end to end (``val_col`` must be integral — the
    caller scales): the mean is never materialized as a float; each
    centered value is scaled by n (c_t = n*x_t - S, an exact long),
    products accumulate in DECIMAL(38,0) — the n^2 scale factor
    cancels in the ratio, the ONE float division at the end, bround 6.
    Denominator 0 (constant series) reads r_l = 0.0, lags >= n emit
    nothing.

    The in-row O(n * max_lag) fold is the documented wer_scores trade
    (interpreted expression cells, no UDF, no shuffle); keys with
    n > max_n or n < 2 are EXCLUDED and the caller picks a grouping /
    thinning with bounded per-key cardinality — the kendall_tau_by
    contract.

    Scale shape: one collect_list group-by (the only exchange); sort,
    centering, and all lag folds are in-row; keys run embarrassingly
    parallel. -> one row per (key, lag): (key, n, lag, r).
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.struct(*[F.col(c).alias(f"_o{i}")
                   for i, c in enumerate(order_cols)],
                 F.col(val_col).cast("long").alias("x")).alias("e"))
    g = (base.groupBy("key")
         .agg(F.sort_array(F.collect_list("e")).alias("_a"))
         .filter((F.size("_a") >= 2) & (F.size("_a") <= max_n)))
    n = F.size("_a")
    xs = F.transform(F.col("_a"), lambda e: e.x)
    s = F.aggregate(xs, F.lit(0).cast("long"), lambda a, x: a + x)
    g = g.select("key", n.alias("n"),
                 F.transform(xs, lambda x: n * x - s).alias("_c"))
    dec0 = F.lit(0).cast("decimal(38,0)")

    def csum(pairs):
        # pairs: (t) -> product term as decimal; t is 1-based
        return F.aggregate(pairs, dec0, lambda a, p: a + p)

    den = csum(F.transform(
        F.col("_c"), lambda c: (c.cast("decimal(19,0)")
                                * c.cast("decimal(19,0)"))
        .cast("decimal(38,0)")))
    lag = F.col("_l")
    num = F.aggregate(
        F.sequence(F.lit(1), F.col("n") - lag), dec0,
        lambda a, t: a + (F.element_at(F.col("_c"), t).cast("decimal(19,0)")
                          * F.element_at(F.col("_c"), t + lag)
                          .cast("decimal(19,0)")).cast("decimal(38,0)"))
    out = (g.select("key", "n", den.alias("_den"),
                    F.explode(F.sequence(
                        F.lit(1), F.least(F.lit(max_lag), F.col("n") - 1)))
                    .alias("_l"), "_c")
           .select("key", "n", lag.alias("lag"),
                   F.when(F.col("_den") > 0,
                          F.bround(num.cast("double")
                                   / F.col("_den").cast("double"), 6))
                   .otherwise(F.lit(0.0)).alias("r")))
    return out


def markov_stationary(df: DataFrame, key_col: str, order_col: str,
                      state_col: str, rounds: int = 20,
                      max_states: int = 64) -> DataFrame:
    """Markov-chain view of per-key state sequences (dialogue roles,
    event types): consecutive-pair transition counts, row-normalized
    probabilities, and the stationary distribution by ``rounds``
    fixed power-iteration steps from uniform — "what fraction of
    turns does the conversation process spend in each role at
    equilibrium", the structural summary beside conv_role_audit's
    per-conversation QC. Reference analogue: none; builder's-brief
    sequence-analytics surface.

    Determinism: transition p = bround(count/row_total, 12) (one
    division); each power-iteration term bround(pi_i * p_ij, 12) sums
    in DECIMAL(38,12) (order-independent; the 12-dp scale keeps the
    decimal->double cast exact), so every round's vector is
    bit-reproducible under any partitioning. The chain is used AS
    OBSERVED: states with no outgoing transitions (a state that only
    ever ends sequences) make it sub-stochastic and the vector's sum
    decays — reported honestly rather than patched with an implicit
    self-loop.

    Scale shape: one per-key collect_list (the only data-sized
    shuffle) feeds an in-row consecutive pairing; the pair agg is
    vocabulary-bounded (<= max_states^2 cells, map-side combine); the
    power iteration folds IN-ROW over a 1-row broadcast-sized matrix
    — no driver loop, no per-round job. -> one row per state
    (state, n_out, pi).

    ``max_states`` contract (EMIT-NOTHING, like the kendall_tau_by /
    acf_by n-cap exclusions): when the observed state vocabulary
    exceeds ``max_states`` the single matrix row is filtered and the
    result is EMPTY — the in-row O(rounds * S^2) fold is never run
    unbounded. A caller that needs to distinguish "no transitions"
    from "vocabulary over cap" should count distinct states first;
    the cap is a plan-shape guard, not a truncation (truncating to
    the top-S states would change every probability).
    """
    pairs = (df.groupBy(F.col(key_col).alias("k"))
             .agg(F.transform(
                 F.array_sort(F.collect_list(
                     F.struct(F.col(order_col).alias("o"),
                              F.col(state_col).alias("s")))),
                 lambda e: e.s).alias("_s")))
    n = F.size("_s")
    cons = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(F.col("_s"), i).alias("s_from"),
            F.element_at(F.col("_s"), i + 1).alias("s_to")))
    ).otherwise(F.array().cast(
        "array<struct<s_from:string,s_to:string>>"))
    trans = (pairs.select(F.explode(cons).alias("e"))
             .select("e.s_from", "e.s_to")
             .groupBy("s_from", "s_to").agg(F.count("*").alias("c")))
    tot = trans.groupBy("s_from").agg(F.sum("c").alias("_tot"))
    trans = (trans.join(F.broadcast(tot), "s_from")
             .select("s_from", "s_to", "c",
                     F.bround(F.col("c").cast("double") / F.col("_tot"),
                              12).alias("p")))
    # one-row matrix + sorted state vocabulary (bounded)
    sts = (trans.select(F.col("s_from").alias("s"))
           .unionByName(trans.select(F.col("s_to").alias("s")))
           .distinct())
    mat = trans.agg(
        F.map_from_entries(F.collect_list(F.struct(
            F.concat_ws("|", "s_from", "s_to"), "p"))).alias("_m"))
    vocab = sts.agg(F.array_sort(F.collect_list("s")).alias("_v"))
    one = vocab.join(F.broadcast(mat))
    s_count = F.size("_v")
    # guard the in-row O(rounds * S^2) fold with the documented bound
    one = one.filter(s_count <= max_states)
    pi0 = F.transform(F.col("_v"),
                      lambda _: F.bround(F.lit(1.0) / s_count, 12))
    # accumulate at DECIMAL(28,12) and cast back each step — Spark's
    # decimal-add widening would otherwise silently drop the 12th digit
    dec0 = F.lit(0).cast("decimal(28,12)")
    pin = F.aggregate(
        F.sequence(F.lit(1), F.lit(rounds)), pi0,
        lambda pi, _r: F.transform(
            F.col("_v"),
            lambda sj: F.aggregate(
                F.sequence(F.lit(1), s_count), dec0,
                lambda a, i: (a + F.bround(
                    F.element_at(pi, i)
                    * F.coalesce(
                        F.element_at(F.col("_m"), F.concat_ws(
                            "|", F.element_at(F.col("_v"), i), sj)),
                        F.lit(0.0)), 12).cast("decimal(28,12)"))
                .cast("decimal(28,12)"))
            .cast("double")))
    out = (one.select(F.explode(F.arrays_zip(F.col("_v").alias("state"),
                                             pin.alias("pi"))).alias("z"))
           .select(F.col("z.state").alias("state"),
                   F.col("z.pi").alias("pi")))
    n_out = tot.select(F.col("s_from").alias("state"),
                       F.col("_tot").alias("n_out"))
    return (out.join(F.broadcast(n_out), "state", "left")
            .select("state", F.coalesce("n_out", F.lit(0)).alias("n_out"),
                    "pi"))


def mad_anomalies(df: DataFrame, key_col: str, order_col: str,
                  val_col: str, thresh: int = 5,
                  max_n: int = 32768) -> DataFrame:
    """Per-key robust anomaly flags by median absolute deviation —
    the spike detector whose baseline the spikes themselves cannot
    move (mean/stddev gates let one 1e6 outlier widen the band until
    nothing else flags; median/MAD have breakdown point 1/2). The
    point-anomaly companion to cusum_changepoints (level shifts) and
    burst_detection (rate spikes). Reference analogue: none;
    builder's-brief monitoring surface.

    EXACT INTEGERS end to end (``val_col`` integral, caller scales):
    med = lower median of the key's values, mad = lower median of
    |x - med| (both value selections — never float averages, the
    theil_sen_by convention), and the flag is the integer comparison

        |x - med| > thresh * greatest(mad, 1)

    (the greatest(mad, 1) floor keeps a constant-but-one series from
    flagging every off-median point; thresh ~ 5 corresponds to the
    classic 3.5-sigma MAD gate with margin). No floats anywhere.

    Keys with n < 3 or n > max_n are excluded (bounded in-row sort,
    the kendall_tau_by contract). Scale shape: one collect_list
    group-by (the only exchange); both medians and the flag scan are
    in-row; emits ONLY the anomalies. -> one row per flagged point
    (key, o, x, med, mad, dev).
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.struct(F.col(order_col).alias("o"),
                 F.col(val_col).cast("long").alias("x")).alias("e"))
    g = (base.groupBy("key")
         .agg(F.sort_array(F.collect_list("e")).alias("_a"))
         .filter((F.size("_a") >= 3) & (F.size("_a") <= max_n)))
    n = F.size("_a")
    xs = F.array_sort(F.transform(F.col("_a"), lambda e: e.x))
    med = F.element_at(xs, ((n + 1) / 2).cast("int"))
    g = g.select("key", "_a", med.alias("med"))
    devs = F.array_sort(F.transform(
        F.col("_a"), lambda e: F.abs(e.x - F.col("med"))))
    mad = F.element_at(devs, ((F.size("_a") + 1) / 2).cast("int"))
    g = g.select("key", "_a", "med", mad.alias("mad"))
    lim = F.lit(thresh) * F.greatest(F.col("mad"), F.lit(1))
    flagged = F.filter(F.col("_a"),
                       lambda e: F.abs(e.x - F.col("med")) > lim)
    return (g.select("key", "med", "mad", F.explode(flagged).alias("e"))
            .select("key", F.col("e.o").alias("o"),
                    F.col("e.x").alias("x"), "med", "mad",
                    F.abs(F.col("e.x") - F.col("med")).alias("dev")))


def holt_forecast(df: DataFrame, key_col: str, order_cols: list[str],
                  val_col: str, alpha: float = 0.5, beta: float = 0.25,
                  max_n: int = 32768) -> DataFrame:
    """Per-key Holt linear exponential smoothing — the
    level-plus-trend forecaster a metrics pipeline runs beside the
    diagnostic family (acf_by says IF there is structure,
    cusum/burst/mad say WHEN it broke; Holt says WHERE the series is
    heading). One in-row fold per key over the time-ordered values:

        l_t = alpha x_t + (1-alpha)(l_{t-1} + b_{t-1})
        b_t = beta (l_t - l_{t-1}) + (1-beta) b_{t-1}

    seeded l_1 = x_1, b_1 = 0; forecast_h = l_n + h b_n (h = 1 here).

    Engine parity for a float RECURRENCE (the cusum rule): alpha and
    beta default to DYADIC rationals (0.5, 0.25 — exact doubles, so
    each step is a fixed IEEE chain), every l_t / b_t is bround'ed
    half-even to 9 dp before the next step, and b_t recomputes l_t's
    expression inline rather than referencing a local — the exact
    shape a DuckDB list_reduce replays fold-for-fold. Outputs bround
    6. Keys with n > max_n are excluded (bounded in-row fold, the
    kendall_tau_by contract); n = 1 emits (x_1, 0, x_1).

    Scale shape: one collect_list group-by (the only exchange); the
    recurrence is in-row; keys run embarrassingly parallel. -> one
    row per key (key, n, level, trend, forecast).
    """
    a, b = float(alpha), float(beta)
    base = df.select(
        F.col(key_col).alias("key"),
        F.struct(*[F.col(c).alias(f"_o{i}")
                   for i, c in enumerate(order_cols)],
                 F.col(val_col).cast("double").alias("x")).alias("e"))
    g = (base.groupBy("key")
         .agg(F.transform(F.sort_array(F.collect_list("e")),
                          lambda e: e.x).alias("_x"))
         .filter(F.size("_x") <= max_n))
    n = F.size("_x")
    x1 = F.element_at(F.col("_x"), 1)
    init = F.struct(x1.alias("l"), F.lit(0.0).alias("b"))

    def lnew(acc, v):
        return F.bround(a * v + (1 - a) * (acc.l + acc.b), 9)

    fold = F.aggregate(
        F.slice(F.col("_x"), 2, F.greatest(n - 1, F.lit(0))), init,
        lambda acc, v: F.struct(
            lnew(acc, v).alias("l"),
            F.bround(b * (lnew(acc, v) - acc.l) + (1 - b) * acc.b, 9)
            .alias("b")))
    return g.select(
        "key", n.alias("n"), F.bround(fold.l, 6).alias("level"),
        F.bround(fold.b, 6).alias("trend"),
        F.bround(fold.l + fold.b, 6).alias("forecast"))
