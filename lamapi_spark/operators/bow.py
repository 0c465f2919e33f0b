"""Bag-of-words similarity — batch form of
api/model/data_retrievers/bow_retriever.py.

The reference stores per-entity BoWs as gzip-pickled dicts (U3) and
scores |text_tokens ∩ entity_bow| / |text_tokens| per request. Batch
shape: BoWs are a plain (entity, bow: array<string>) table (no binary
blobs); a (request_id, text) frame tokenizes once and joins. Small BoW
tables broadcast; large ones use the exploded-token equi-join so only
overlapping (text, entity) pairs materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lamapi_spark.functions import bow_tokens


def entity_bows(items: DataFrame) -> DataFrame:
    """Derive entity BoWs from description + English label (stand-in for
    the reference's precomputed items_vectors2 collection)."""
    return items.select(
        "entity",
        bow_tokens(F.concat_ws(" ", F.col("labels").getItem("en"),
                               F.col("description"))).alias("bow"),
    )


def bow_similarity(texts: DataFrame, bows: DataFrame,
                   text_col: str = "text", id_col: str = "request_id",
                   broadcast_bows: bool = True) -> DataFrame:
    """-> (request_id, entity, similarity_score, matched_words):
    round(|tokens ∩ bow| / |tokens|, 2) per (text, entity)
    (bow_retriever.py:147-161). Cross-scored against every entity in
    ``bows`` — pre-filter ``bows`` to the requested candidates, as the
    reference endpoint does with its ids list."""
    t = texts.select(F.col(id_col).alias("request_id"),
                     bow_tokens(F.col(text_col)).alias("toks"))
    b = F.broadcast(bows) if broadcast_bows else bows
    inter = F.array_intersect("toks", "bow")
    return (
        t.crossJoin(b)
        .select(
            "request_id", "entity",
            F.bround(F.size(inter) / F.greatest(F.size("toks"), F.lit(1)), 2)
            .alias("similarity_score"),
            F.sort_array(inter).alias("matched_words"),
        )
    )
