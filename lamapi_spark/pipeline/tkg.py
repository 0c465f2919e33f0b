"""Temporal KG: validity intervals and point-in-time snapshots over
timestamped triple assertions.

Transcripts carry a ``ts`` column (the input contract), so every
mined (subj, pred, obj) assertion has an assertion time — and a fact
asserted later about the same (subj, pred) SUPERSEDES the earlier one
('the user's plan is X' ... 'the plan is now Y'). Two standard
temporal-KG reads fall out:

- ``triple_validity``: rewrite the assertion log as non-overlapping
  validity intervals [valid_from_us, valid_to_us) per (subj, pred) —
  valid_to is the NEXT assertion's time (NULL = still current).
- ``kg_snapshot``: the graph as of time T — the latest assertion at
  or before T per (subj, pred).

Scale shape:

- ``triple_validity`` is ONE exchange: a (subj, pred)-partitioned
  window whose only function is ``lead`` over (ts, tie) — an
  order-only streaming frame, so Spark never buffers a whole hot
  (subj, pred) group in memory; head-entity skew costs sort time, not
  state. Timestamps flow as integer MICROS (the repo's temporal
  engine-parity rule).
- ``kg_snapshot`` has NO window at all: filter ts <= T, then one
  partial-aggregating groupBy with a struct-max — map-side combine
  collapses each partition's assertions to one candidate per
  (subj, pred) before the exchange, the shape that survives a
  10^12-turn assertion log.

Determinism: the tie column (turn_idx or any unique id) makes the
(ts, tie) order total, so equal-timestamp assertions resolve
identically at every parallelism level.

Reference analogue: none (lamAPI's graph is snapshot-only, README.md
"snapshot 30-06-2023") — builder's-brief temporal surface over the
transcript contract's ts column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triple_validity(assertions: DataFrame,
                    ts_col: str = "ts_us",
                    tie_col: str = "turn_idx") -> DataFrame:
    """(subj, pred, obj, ts_us, tie) assertion log -> (subj, pred, obj,
    valid_from_us, valid_to_us) validity intervals; valid_to_us NULL
    for the currently-valid assertion of each (subj, pred)."""
    w = Window.partitionBy("subj", "pred").orderBy(ts_col, tie_col)
    return (
        assertions
        .withColumn("valid_to_us", F.lead(ts_col).over(w))
        .select("subj", "pred", "obj",
                F.col(ts_col).alias("valid_from_us"), "valid_to_us")
    )


def entity_profile(assertions: DataFrame,
                   ts_col: str = "ts_us") -> DataFrame:
    """Per-subject KB profile over the assertion log: (subj,
    n_assertions, n_preds, first_us, last_us, top_pred) — the entity
    summary card a KB browser renders and the head-entity census the
    skew-salting stages consume (the top-N frequent subjects are
    exactly the keys worth salting).

    Scale shape: TWO partial-aggregating group-bys — (subj, pred)
    counts first (collapsing the assertion stream map-side), then the
    subject rollup over the dimension-sized counts frame. No window.
    top_pred is the most-asserted predicate, ties to the
    lexicographically SMALLEST via min(struct(-cnt, pred)) — integer
    negation, total order, partition-independent."""
    per_pred = (assertions.groupBy("subj", "pred")
                .agg(F.count("*").alias("_cnt"),
                     F.min(ts_col).alias("_lo"),
                     F.max(ts_col).alias("_hi")))
    top = F.min(F.struct((-F.col("_cnt")).alias("_neg"),
                         F.col("pred").alias("pred")))
    return (per_pred.groupBy("subj")
            .agg(F.sum("_cnt").alias("n_assertions"),
                 F.count("*").alias("n_preds"),
                 F.min("_lo").alias("first_us"),
                 F.max("_hi").alias("last_us"),
                 top.alias("_top"))
            .select("subj", "n_assertions", "n_preds", "first_us",
                    "last_us", F.col("_top.pred").alias("top_pred")))


def kg_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """CDC between two KG snapshots: (subj, pred, old_obj, new_obj,
    change) with change in ('added', 'removed', 'changed') — unchanged
    facts emit nothing. This is the delta an incremental downstream
    (an Iceberg MERGE, a cache invalidation, a re-embedding queue)
    consumes instead of re-reading the whole graph; composes directly
    with :func:`kg_snapshot` at two timestamps.

    Scale shape: ONE co-partitioned full outer join on (subj, pred) —
    both snapshot frames are unique on the key by construction, so the
    join output is bounded by |old| + |new| and the inequality filter
    is a pure post-join column expression. Null-safe: a fact whose obj
    is the same on both sides drops via the NOT eqNullSafe filter."""
    o = old.select("subj", "pred", F.col("obj").alias("old_obj"))
    n = new.select("subj", "pred", F.col("obj").alias("new_obj"))
    j = o.join(n, ["subj", "pred"], "full_outer")
    change = (
        F.when(F.col("old_obj").isNull(), F.lit("added"))
        .when(F.col("new_obj").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (j.filter(~F.col("old_obj").eqNullSafe(F.col("new_obj")))
            .select("subj", "pred", "old_obj", "new_obj",
                    change.alias("change")))


def kg_snapshot(assertions: DataFrame, at_ts_us: int,
                ts_col: str = "ts_us",
                tie_col: str = "turn_idx") -> DataFrame:
    """The graph as of ``at_ts_us``: the latest (by ts, then tie)
    assertion at or before T per (subj, pred) -> (subj, pred, obj,
    asserted_us)."""
    winner = F.max(F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
        F.col("obj").alias("obj"),
    )).alias("_w")
    return (
        assertions.filter(F.col(ts_col) <= F.lit(at_ts_us))
        .groupBy("subj", "pred").agg(winner)
        .select("subj", "pred", F.col("_w.obj").alias("obj"),
                F.col("_w.ts").alias("asserted_us"))
    )
