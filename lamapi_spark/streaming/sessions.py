"""Structured Streaming twins of the batch event/text operators.

The engine's primary surface is batch (the reference is a
request/response service; its bulk paths are offline scripts), but a
transcript/event feed at 10^12-turn scale arrives continuously — these
operators are the `readStream` versions of the corresponding batch
dataflows, sharing the same column expressions so batch and streaming
results agree:

- ``stream_sessionize`` — gap-based sessionization with
  ``F.session_window`` + watermark (the built-in stateful session
  operator; late events beyond the watermark are dropped, exactly the
  trade a 100 TB stream needs to bound state). The batch twin is the
  ``sessionize_events`` contract query (lag + gaps-and-islands) — one
  session per gap > ``gap`` in both.
- ``stream_text_stats`` — stateless language-ID / quality / token-count
  projection over a document stream (pure column expressions, no state,
  no shuffle: scales with input partitions).

Tested with file sources + ``trigger(availableNow=True)`` (process all
available input then stop — deterministic for tests); a production
deployment points the same code at Kafka/Iceberg streaming reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lamapi_spark.ops.textstats import lang_id, quality_features, token_counts

EVENT_SCHEMA = ("event_id bigint, user_id bigint, event_type string, "
                "ts timestamp, payload string")


def stream_sessionize(
    spark: SparkSession, path: str, gap: str = "30 minutes",
    watermark: str = "2 hours", schema: str = EVENT_SCHEMA,
) -> DataFrame:
    """File-source event stream -> per-(user, session-window) counts.

    State is bounded by the watermark: a session closes once the event
    time high-mark passes its end + watermark; afterwards its state is
    evicted — without this, 10^12 events of session state accumulate
    forever. Output mode must tolerate append semantics (closed sessions
    only), which is exactly how the batch gaps-and-islands twin counts
    sessions."""
    events = spark.readStream.schema(schema).parquet(path)
    return (
        events
        .withColumn("_ts", F.col("ts").cast("timestamp"))
        .withWatermark("_ts", watermark)
        .groupBy(F.session_window("_ts", gap).alias("session"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("session.start").alias("session_start"),
                F.col("session.end").alias("session_end"), "n_events")
    )


def stream_text_stats(
    spark: SparkSession, path: str,
    schema: str = "doc_id bigint, text string",
) -> DataFrame:
    """Stateless per-document text analysis over a streaming source —
    the streaming form of the text_lang_id / text_quality /
    text_token_count batch queries (identical expressions, so a row
    processed by either path yields identical values)."""
    docs = spark.readStream.schema(schema).parquet(path)
    q = quality_features(F.col("text"))
    tc = token_counts(F.col("text"))
    return docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["alpha_ratio"].alias("alpha_ratio"),
        tc["ws_tokens"].alias("ws_tokens"),
    )


def stream_quality_gate(
    spark: SparkSession, path: str,
    schema: str = "doc_id bigint, text string",
) -> DataFrame:
    """The composed Gopher-rule quality verdict as an ingest-time
    stream — the filter a production pipeline applies to every
    arriving document. Stateless (every rule is a pure column
    expression over ROUNDED features, the exact expressions of the
    batch quality_filter contract query), so any trigger/sink works
    and verdicts are row-for-row equal to batch (tested)."""
    from lamapi_spark.ops.textstats import repetition_features

    docs = spark.readStream.schema(schema).parquet(path)
    q = quality_features(F.col("text"))
    rep = repetition_features(F.col("text"))
    r_len = q["n_tokens"].between(10, 1000)
    r_mean = q["mean_token_len"].between(2, 12)
    r_alpha = q["alpha_ratio"] >= 0.6
    r_dup = rep["dup_token_frac"] <= 0.8
    return docs.select(
        "doc_id",
        r_len.alias("r_len"), r_mean.alias("r_mean"),
        r_alpha.alias("r_alpha"), r_dup.alias("r_dup"),
        (r_len & r_mean & r_alpha & r_dup).alias("keep"))


def run_available_now(stream_df: DataFrame, query_name: str,
                      mode: str = "append") -> DataFrame:
    """Drain all currently-available input through the stream into an
    in-memory table and return it as a DataFrame (test/batch-catchup
    harness for the streaming operators).

    NB: with ``append`` mode an aggregation emits only windows the
    watermark has CLOSED — a bounded test input's trailing sessions
    would never appear. Pass ``mode="complete"`` for aggregations when
    draining a finite input."""
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
