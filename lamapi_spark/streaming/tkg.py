"""Streaming twin of the temporal-KG snapshot (pipeline/tkg.kg_snapshot):
the current graph maintained live as assertions stream in.

A 10^12-turn transcript feed is not re-mined from scratch per query —
the (subj, pred) -> latest-obj view is the canonical incrementally
maintained KG state, folded as assertions arrive.

Shape: ONE unwatermarked stateful aggregation whose buffer is the
SAME max(struct(ts_us, tie, obj)) the batch operator uses (the
stream_latest_state shape). max is commutative and associative, so
the state is independent of arrival order — no survivor delta: any
drain equals running the batch kg_snapshot over the drained feed
(tested, tests/test_streaming.py). State is exactly one struct per
live (subj, pred) — O(graph keys), the same bound as the batch op's
post-combine shuffle — and never expires: a fact's current value must
outlive any watermark horizon; that state IS the graph. Run in update
mode (emit changed facts per micro-batch — the CDC feed a downstream
Iceberg MERGE consumes) or complete mode (full snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSERT_SCHEMA = ("subj string, pred string, obj string, "
                 "ts_us bigint, turn_idx bigint")


def stream_kg_state(
    spark: SparkSession, path: str, schema: str = ASSERT_SCHEMA,
) -> DataFrame:
    """File-source assertion stream -> live (subj, pred, obj,
    asserted_us) state: the latest (by ts_us, then the unique tie
    turn_idx) assertion per (subj, pred)."""
    a = spark.readStream.schema(schema).parquet(path)
    return (
        a.groupBy("subj", "pred")
        .agg(F.max(F.struct(
            F.col("ts_us").alias("ts"),
            F.col("turn_idx").alias("tie"),
            F.col("obj").alias("obj"))).alias("_w"))
        .select("subj", "pred", F.col("_w.obj").alias("obj"),
                F.col("_w.ts").alias("asserted_us"))
    )
