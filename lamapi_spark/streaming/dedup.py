"""Streaming twins of the batch dedup operators.

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


def stream_simhash_pairs(
    spark: SparkSession, path: str,
    max_hamming: int = 3, n_bands: int = 4,
    watermark: str = "2 hours", horizon: str = "2 hours",
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """Streaming twin of the SimHash near-dup pairing
    (ops/dedup.simhash_pairs): document stream -> (id_a, id_b, hamming)
    for pairs within Hamming distance ``max_hamming`` whose event times
    are within ``horizon`` of each other.

    Shape: the 60-bit SimHash is a PURE column expression (stateless,
    per-row), the banded-prefix blocking is a posexplode (same
    shiftright/mask construction as hamming_pairs — lossless for
    d <= n_bands - 1), and the candidate join becomes a watermarked
    STREAM-STREAM self-join on (band, band_key) with a time-range
    constraint: state for a document's bands is held only until the
    watermark passes its timestamp + horizon, so state is bounded by
    input rate x horizon — the same correctness/state trade as
    dropDuplicatesWithinWatermark. Cross-band duplicate candidates are
    collapsed by a downstream dropDuplicatesWithinWatermark on the pair
    key (multiple stateful operators in append mode — Spark 3.5+).

    CONTRACT DELTA vs batch (documented, like the exact-dedup twin's
    survivor delta): a pair whose two documents arrive more than
    ``horizon`` apart in EVENT TIME is not emitted — bounded state
    cannot pair against the unbounded past. Over any input slice whose
    timestamps all fall within the horizon, the emitted pair set equals
    the batch simhash_pairs set (tested).

    No hot-bucket cap here: a streaming count-per-bucket would itself be
    unbounded state. The horizon IS the bucket bound (a bucket can only
    accumulate horizon's worth of rows); pathological boilerplate floods
    should be pre-filtered with stream_exact_dedup upstream.
    """
    from lamapi_spark.ops.dedup import simhash60

    if max_hamming > n_bands - 1:
        raise ValueError("banding is lossless only for max_hamming <= n_bands - 1")
    if 60 % n_bands != 0:
        raise ValueError("60 bits must divide evenly into n_bands")
    bpb = 60 // n_bands
    mask = (1 << bpb) - 1

    docs = spark.readStream.schema(schema).parquet(path)
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    sig = (
        docs
        .withColumn("_ts", F.col("ts").cast("timestamp"))
        .withColumn("sim", simhash60(toks))
        .withWatermark("_ts", watermark)
        .select("doc_id", "sim", "_ts",
                F.posexplode(F.array(*[
                    F.shiftright("sim", b * bpb).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ])).alias("band", "band_key"))
    )
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sim").alias("sim_a"),
                   F.col("_ts").alias("ts_a"), "band", "band_key")
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sim").alias("sim_b"),
                   F.col("_ts").alias("ts_b"),
                   F.col("band").alias("band_b"), F.col("band_key").alias("key_b"))
    pairs = a.join(
        b,
        F.expr(f"""
            band = band_b AND band_key = key_b AND id_a < id_b
            AND ts_b BETWEEN ts_a - INTERVAL {horizon}
                         AND ts_a + INTERVAL {horizon}
        """),
        "inner",
    ).withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).filter(F.col("hamming") <= max_hamming)
    return (
        pairs.select("id_a", "id_b", "hamming", F.col("ts_a").alias("_ts"))
        .dropDuplicatesWithinWatermark(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def stream_minhash_pairs(
    spark: SparkSession, path: str,
    k_shingle: int = 3, n_hashes: int = 16, n_bands: int = 4,
    watermark: str = "2 hours", horizon: str = "2 hours",
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """Streaming twin of the MinHash+LSH near-dup pairing
    (ops/dedup.minhash_lsh_pairs): document stream -> (id_a, id_b,
    sig_agree) for pairs sharing >= 1 LSH band whose event times are
    within ``horizon`` of each other — completing the streaming dedup
    family (exact / SimHash / MinHash).

    Shape, exactly like stream_simhash_pairs: shingling, the minhash
    signature, and the band keys are PURE column expressions shared with
    the batch operator (md5-based, engine-portable), the banded blocking
    is a posexplode, and the candidate join is a watermarked
    STREAM-STREAM self-join on (band, band_key) with a time-range
    constraint; cross-band duplicates collapse through a downstream
    dropDuplicatesWithinWatermark on the pair key. State is bounded by
    input rate x horizon.

    CONTRACT DELTA vs batch (same as the SimHash twin): pairs whose
    documents arrive more than ``horizon`` apart in event time are not
    emitted; over any input slice inside the horizon the pair set
    equals batch minhash_lsh_pairs (tested). No hot-bucket cap — a
    streaming per-bucket count would itself be unbounded state; the
    horizon IS the bucket bound (see stream_simhash_pairs)."""
    from lamapi_spark.ops.dedup import (
        lsh_band_keys, minhash_signature, word_shingles,
    )

    rows_per_band = n_hashes // n_bands
    docs = spark.readStream.schema(schema).parquet(path)
    sig = (
        docs
        .withColumn("_ts", F.col("ts").cast("timestamp"))
        .withColumn("shingles", word_shingles("text", k_shingle))
        .filter(F.size("shingles") > 0)
        .withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))
        .withWatermark("_ts", watermark)
        .select("doc_id", "sig", "_ts",
                F.posexplode(lsh_band_keys(F.col("sig"), n_bands,
                                           rows_per_band))
                .alias("band", "band_key"))
    )
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"),
                   F.col("_ts").alias("ts_a"), "band", "band_key")
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"),
                   F.col("_ts").alias("ts_b"),
                   F.col("band").alias("band_b"), F.col("band_key").alias("key_b"))
    pairs = a.join(
        b,
        F.expr(f"""
            band = band_b AND band_key = key_b AND id_a < id_b
            AND ts_b BETWEEN ts_a - INTERVAL {horizon}
                         AND ts_a + INTERVAL {horizon}
        """),
        "inner",
    )
    agree = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    return (
        pairs.select(
            "id_a", "id_b",
            F.bround(agree / F.size("sig_a"), 3).alias("sig_agree"),
            F.col("ts_a").alias("_ts"))
        .dropDuplicatesWithinWatermark(["id_a", "id_b"])
        .select("id_a", "id_b", "sig_agree")
    )
