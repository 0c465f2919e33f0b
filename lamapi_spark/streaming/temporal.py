"""Streaming twin of the as-of join (ops/temporal.asof_join) — the
point-in-time feature serve: an unbounded probe stream looks up, per
row, the latest state row at-or-before its event time.

Shape: the STATIC right side collapses offline into one row per key
holding its time-sorted (ts, payload...) array (`asof_state_table` —
the feature-store "state snapshot" analogue of the pipeline's offline
link/lookup indexes). The stream then needs only a STATELESS
stream-static equi-join on the key plus pure array expressions
(`filter` + `array_max`) to resolve the as-of per probe row: no
streaming aggregation, no watermark state, no per-batch driver logic —
every micro-batch row is independent, so any trigger/sink works and
the result is row-for-row equal to the batch operator (tested,
tests/test_streaming.py).

The trade: one key's whole history lives in one array cell, so the
static side must be bounded per key (feature stores retain the last N
versions; cap with ``max_versions`` — KEEPS THE NEWEST n). The batch
operator has no such bound — it is the backfill twin; this is the
serve twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def asof_state_table(
    right: DataFrame, key: str, right_ts: str = "ts_us",
    payload: tuple[str, ...] = ("value",),
    max_versions: int | None = None,
) -> DataFrame:
    """One row per key: ``_state`` = ascending-by-ts array of
    struct(_ts, <payload...>). Right must be unique per (key, ts) —
    the batch operator's tie contract. ``max_versions`` keeps only the
    newest n versions per key (probes older than the retained horizon
    then resolve to null — the documented serve-vs-backfill delta)."""
    st = F.struct(F.col(right_ts).cast("long").alias("_ts"),
                  *[F.col(p).alias(p) for p in payload])
    agg = F.sort_array(F.collect_list(st))
    if max_versions is not None:
        agg = F.slice(agg, -int(max_versions), int(max_versions))
    return right.groupBy(key).agg(agg.alias("_state"))


def stream_asof_join(
    probes: DataFrame, state: DataFrame, key: str,
    left_ts: str = "ts_us", payload: tuple[str, ...] = ("value",),
    tolerance_us: int | None = None,
) -> DataFrame:
    """``probes`` may be a streaming OR batch frame; ``state`` is an
    `asof_state_table`. Returns probes' columns + ``asof_ts`` +
    ``asof_<payload>...`` with the batch operator's exact semantics
    (inclusive backward, tolerance nulling)."""
    lcols = list(probes.columns)
    ts = F.col(left_ts).cast("long")
    hits = F.filter("_state", lambda s: s["_ts"] <= ts)
    # structs order by leading field first and right is unique per
    # (key, ts), so array_max(hits) IS the latest at-or-before row
    m = F.when(F.size(hits) > 0, F.array_max(hits))
    stale = (F.lit(False) if tolerance_us is None
             else ts - m["_ts"] > F.lit(int(tolerance_us)))
    keep = m.isNotNull() & ~stale
    return (
        probes.join(state, key, "left")
        .select(
            *lcols,
            F.when(keep, m["_ts"]).alias("asof_ts"),
            *[F.when(keep, m[p]).alias(f"asof_{p}") for p in payload],
        )
    )


EVENT_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string")


def stream_latest_state(
    spark: SparkSession, path: str, schema: str = EVENT_SCHEMA,
) -> DataFrame:
    """Streaming twin of the CDC latest-state compaction
    (queries.events_latest_state): a change feed folds into the
    current-value-per-key snapshot as it arrives — the canonical
    incrementally maintained materialized view.

    Shape: ONE unwatermarked stateful aggregation whose buffer is the
    same max(struct(ts_us, event_id, value)) the batch operator uses.
    max is commutative and associative, so the result is independent
    of arrival order — unlike the dedup twin there is NO survivor
    delta: the snapshot is row-for-row equal to running the batch
    operator over the drained feed (tested). State is exactly one
    struct per live key — O(keys), the same bound as the batch op's
    post-combine shuffle — and never expires (a key's current value
    must outlive any watermark horizon; that state IS the view).
    Run with update mode (emit changed keys per micro-batch) or
    complete mode (full snapshot)."""
    ev = spark.readStream.schema(schema).parquet(path)
    return (
        ev.withColumn("_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .groupBy("user_id", "event_type")
        .agg(F.max(F.struct(
            F.col("_us").alias("us"),
            F.col("event_id").alias("event_id"),
            F.col("value").alias("value"))).alias("_last"))
        .select(
            "user_id", "event_type",
            F.col("_last.us").alias("last_ts_us"),
            F.col("_last.event_id").alias("last_event_id"),
            F.col("_last.value").alias("last_value"),
        )
    )


def stream_cms_cells(
    spark: SparkSession, path: str, keys: tuple[str, ...], col: str,
    schema: str, w: int = 64, d: int = 4,
) -> DataFrame:
    """Streaming Count-Min maintenance (the frequency sketch of
    ops/sketches.py as a live aggregation): each arriving row adds 1
    to its d cells, so the running (keys..., idx, cnt) state IS the
    sketch, kept incrementally. State is bounded at keys x d*w cells
    BY CONSTRUCTION — the whole point of sketching — so no watermark
    is needed and the aggregation never grows past the sketch size.
    Counter sums are commutative, so ANY drain of the stream equals
    the batch cms_sketch cell for cell (tested); _cells_assemble on a
    drained cut yields the identical array form for cms_merge /
    cms_estimate."""
    from lamapi_spark.ops.sketches import _cms_positions

    src = (spark.readStream.schema(schema).parquet(path)
           .filter(F.col(col).isNotNull()))
    pos = src.select(*keys, F.explode(_cms_positions(col, w, d)).alias("idx"))
    return pos.groupBy(*keys, "idx").agg(F.count("*").alias("cnt"))
