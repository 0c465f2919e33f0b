"""Streaming twin of the exact-dedup batch operator.

A 10^12-turn document feed cannot batch-dedup per run; the streaming
form keeps one row per distinct content hash with
``dropDuplicatesWithinWatermark``: state holds a hash only until the
event-time watermark passes it, so duplicate suppression is exact within
the watermark horizon and state stays bounded — the same
correctness/state trade as the session-window operator. The batch twin
is ops/dedup.exact_dedup (md5 group-by); the streaming output's distinct
content_hash set equals the batch one over the same drained input
(tested), while the surviving doc_id is arrival-order-dependent (batch
pins min(id); a stream keeps the first seen — the documented delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id bigint, text string, ts timestamp"


def stream_exact_dedup(
    spark: SparkSession, path: str, watermark: str = "2 hours",
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """File-source document stream -> first row per distinct md5(text)
    within the watermark horizon. Emits (doc_id, content_hash) — the
    event time only drives the watermark and is dropped from the
    output."""
    docs = spark.readStream.schema(schema).parquet(path)
    return (
        docs
        .withColumn("content_hash", F.md5("text"))
        .withColumn("_ts", F.col("ts").cast("timestamp"))
        .withWatermark("_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("doc_id", "content_hash")
    )
