"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDF
stages over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_meta`` ships a deterministic fake decoder
(byte length, md5, fake dims derived from the hash) and
``decode_image_real`` raises NotImplementedError with the intended
integration point documented. Everything Spark-side — schema, explicit
conv/batch partitioning, UDF signature, Arrow batch shape — is real and
tested; swapping the fake for PIL/libvips is a one-function change.

Scale notes: binary payloads dominate partition size — repartition by a
content-hash bucket before the UDF stage so Arrow batches stay bounded
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows, not bytes;
for multi-MB blobs drop it per-stage).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = ("id bigint, n_bytes int, content_md5 string, "
               "fake_width int, fake_height int, modality string")


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Testdata adapter: treat utf-8 text bytes as an opaque payload so
    the binary pipeline is exercisable on the sandbox tables."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("modality"),
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    Fake-decode semantics (deterministic): width/height are the first
    two bytes of the md5 digest (1..256) — stands in for a real header
    parse; n_bytes/md5 are real.
    """
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            digests = [hashlib.md5(b).hexdigest() for b in pdf["payload"]]
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": [len(b) for b in pdf["payload"]],
                "content_md5": digests,
                "fake_width": [int(d[0:2], 16) + 1 for d in digests],
                "fake_height": [int(d[2:4], 16) + 1 for d in digests],
                "modality": pdf["modality"],
            })

    return df.mapInPandas(batches, schema=META_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Integration point for a real decoder (PIL / torchvision /
    libvips): same mapInPandas shape as ``decode_image_meta`` but
    returning decoded tensors/features. Not available in this container.
    """
    raise NotImplementedError(
        "real image decoding requires an image library not present in "
        "this environment; use decode_image_meta (deterministic fake) "
        "for plumbing tests, and swap in a PIL-based batch fn here")


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling stub: emits (id, frame_idx) for frames the
    real decoder would extract — plumbing for downstream per-frame ops.
    Frame count is faked deterministically from payload length."""
    return df.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.octet_length("payload") % 10, F.lit(1))
        ).alias("frame_idx"),
    ).filter(F.col("frame_idx") % F.lit(max(every_n // 30, 1)) == 0)
