"""Reusable graph-shape operators over edge DataFrames.

These complement the KG-construction pipeline's own graph machinery
(pipeline/canonicalize.connected_components) with the read-side
analytics a KG consumer runs: common-neighbor similarity is the
entity-resolution primitive ("two suppliers sharing many customers are
candidates for the same real-world entity"), the same computation shape
as the reference's BoW candidate scoring but over graph adjacency
instead of token sets (reference analogue: none — the reference serves
point lookups; builder's-brief analytics surface).

Scale notes: the common-neighbor self-join fans out quadratically per
hub node (a src with fanout f contributes f*(f-1)/2 pair rows), so
``max_fanout`` drops super-hub sources before the join — the identical
frequent-item trade ops/dedup.py makes with ``max_df`` for hot shingles
and hamming_pairs makes with ``max_bucket``. The join itself shuffles
once on the src key; the pair aggregation reuses the standard
map-side-combine groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_pairs(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    min_common: int = 1, max_fanout: int | None = None,
) -> DataFrame:
    """Bipartite-style common-neighbor pairing: for distinct edges
    (src, dst), emit every dst pair sharing at least ``min_common``
    src neighbors, with degrees and the neighbor-set Jaccard.

    -> (node_a, node_b, common, degree_a, degree_b, jaccard), with
    node_a < node_b (each unordered pair once, deterministic).

    ``max_fanout`` (None = unlimited) excludes src nodes whose fanout
    exceeds it from PAIR GENERATION only — degrees still count every
    edge, so the guard trades recall on pairs mediated exclusively by
    super-hubs (which carry the least similarity signal per the usual
    tf-idf argument) for a bounded shuffle.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    deg = e.groupBy(F.col("_d").alias("_n")).agg(F.count("*").alias("degree"))
    pe = e
    if max_fanout is not None:
        fan = (e.groupBy("_s").agg(F.count("*").alias("_f"))
               .filter(F.col("_f") <= max_fanout).select("_s"))
        pe = e.join(fan, "_s")
    x, y = pe.alias("x"), pe.alias("y")
    pairs = (
        x.join(y, (F.col("x._s") == F.col("y._s"))
               & (F.col("x._d") < F.col("y._d")))
        .groupBy(F.col("x._d").alias("node_a"), F.col("y._d").alias("node_b"))
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    return (
        pairs
        .join(deg.select(F.col("_n").alias("node_a"),
                         F.col("degree").alias("degree_a")), "node_a")
        .join(deg.select(F.col("_n").alias("node_b"),
                         F.col("degree").alias("degree_b")), "node_b")
        .select(
            "node_a", "node_b", "common", "degree_a", "degree_b",
            (F.col("common")
             / (F.col("degree_a") + F.col("degree_b") - F.col("common"))
             ).alias("jaccard"),
        )
    )
