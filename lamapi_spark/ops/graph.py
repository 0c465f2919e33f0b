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


def pagerank_fixed_point(
    edges: DataFrame, n_iter: int = 3, scale: int = 10**9,
    damping_pct: int = 85, checkpoint_every: int | None = 1,
) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges in BIGINT FIXED
    POINT (units of 1/scale; sum-to-N convention): per-edge
    contributions are integer divisions, the combine an exact BIGINT
    sum — order-independent, so the result is bit-reproducible across
    partitionings and engines (float PageRank depends on the combine
    order; DECIMAL division scale rules differ between engines). The
    truncation error is < 1/scale per edge per iteration. Overflow
    bound: n_nodes * scale * damping_pct < 2^63, i.e. ~1e8 nodes at
    scale=1e9 — a larger graph drops scale or widens to DECIMAL(38,0).

    -> (node, rank) with rank in fixed-point units. Every node in the
    edge set gets a row (isolated nodes cannot exist in an edge-derived
    node set); dangling mass needs no term when edges are symmetric
    (out-degree >= 1 everywhere) — an asymmetric caller must add it.

    ``checkpoint_every`` localCheckpoints the rank frame every K
    iterations (the same lineage-truncation discipline as
    pipeline/canonicalize.py): each iteration is one join + one
    aggregation, and without truncation the plan deepens linearly with
    n_iter — at cluster scale that re-executes the whole prefix on any
    retry and bloats the optimizer's input. None disables (bounded
    n_iter on small graphs, e.g. inside a short-lived contract query).
    """
    teleport = (100 - damping_pct) * scale // 100
    outdeg = (edges.groupBy(F.col("src").alias("node"))
              .agg(F.count("*").alias("degree")))
    if checkpoint_every is not None:
        edges = edges.localCheckpoint(eager=True)
        outdeg = outdeg.localCheckpoint(eager=True)
    nodes = outdeg.select("node")
    rank = nodes.select("node", F.lit(scale).cast("bigint").alias("rank"))
    for i in range(n_iter):
        contrib = (
            edges.join(rank.withColumnRenamed("node", "src"), "src")
            .join(outdeg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank div degree")).alias("_s"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(teleport)
             + F.expr(f"{damping_pct} * coalesce(_s, 0L) div 100")
             ).alias("rank"),
        )
        if checkpoint_every is not None and (i + 1) % checkpoint_every == 0:
            rank = rank.localCheckpoint(eager=True)
    return rank


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
    # cache the narrow distinct edge frame: Catalyst does not dedupe
    # common subtrees, and this one feeds FOUR consumers (both pair-join
    # sides, the degree agg, the fanout gate) — without it the upstream
    # edge derivation executes once per consumer (plan-audited)
    e = (edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
         .distinct().cache())
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
