"""Collective entity linking: coherence reranking of link candidates.

The per-mention argmax in pipeline/linking.py scores each mention in
isolation (string similarity + popularity — the reference's lookup
semantics, api/model/data_retrievers/lookup_retriever.py:137-182). The
classic failure mode is the ambiguous surface whose popular sense is
wrong in context ("Paris" the person vs the city). Collective linking
(Cucerzan 2007; Ratinov et al. 2011's global coherence term) breaks the
tie with the KG itself: a candidate that is CONNECTED to the other
mentions' candidates in the same conversation is more plausible than an
isolated one.

Semantics (integer-exact, engine-portable):
  votes(g, m, c)  = # DISTINCT other mentions m' != m in group g having
                    at least one candidate c' with a KG edge {c, c'}
                    (edges symmetrized; multiple candidates / parallel
                    edges to the same m' count ONCE — a single noisy
                    neighbor mention can never dominate)
  final_u         = base_score_u + vote_scale * votes
  winner per (g, m) = argmax final_u, ties -> smallest cand_id.

Scale shape: the vote join is keyed on ENTITY ids (candidate -> edge
endpoint -> other candidate), never on the group — group sizes don't
bound the shuffle, entity degree does. Hub entities fan out by degree;
at cluster scale the standard backstops apply (AQE skew split, or a
max-degree cap like ops/graph.common_neighbor_pairs' max_fanout). The
distinct-by-mention collapse happens BEFORE the per-candidate count, so
the aggregation state is bounded by (candidates x co-mentions), not by
edge multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coherence_rerank(
    cands: DataFrame, edges: DataFrame, vote_scale: int = 1000,
) -> DataFrame:
    """cands: (group_id, mention_id, cand_id, base_score_u) — the top-K
    candidate lists of every mention in every group (conversation).
    edges: (a, b) KG adjacency, treated as undirected.

    -> one row per (group_id, mention_id): the coherence winner, with
    (cand_id, base_score_u, votes, final_u).
    """
    c = cands.select("group_id", "mention_id", "cand_id", "base_score_u")
    sym = (edges.select(F.col("a").alias("_x"), F.col("b").alias("_y"))
           .unionByName(edges.select(F.col("b").alias("_x"),
                                     F.col("a").alias("_y")))
           .distinct())
    # candidate -> neighboring entity -> any candidate row of ANOTHER
    # mention in the same group; collapse to distinct supporter mentions
    support = (
        c.join(sym, c.cand_id == sym._x)
        .select("group_id", "mention_id", "cand_id", F.col("_y").alias("_n"))
        .join(c.select(F.col("group_id"),
                       F.col("mention_id").alias("_m2"),
                       F.col("cand_id").alias("_n")),
              ["group_id", "_n"])
        .filter(F.col("_m2") != F.col("mention_id"))
        .select("group_id", "mention_id", "cand_id", "_m2")
        .distinct()
    )
    votes = (support.groupBy("group_id", "mention_id", "cand_id")
             .agg(F.count("*").alias("votes")))
    scored = (
        c.join(votes, ["group_id", "mention_id", "cand_id"], "left")
        .withColumn("votes", F.coalesce("votes", F.lit(0)).cast("long"))
        .withColumn("final_u",
                    F.col("base_score_u")
                    + F.lit(vote_scale) * F.col("votes"))
    )
    # window-free per-mention argmax (the best_links discipline):
    # min over struct(-final, cand_id)
    best = (
        scored.groupBy("group_id", "mention_id")
        .agg(F.min(F.struct((-F.col("final_u")).alias("_nf"),
                            F.col("cand_id").alias("_c"))).alias("_w"))
        .select("group_id", "mention_id", F.col("_w._c").alias("cand_id"))
    )
    return (
        scored.join(best, ["group_id", "mention_id", "cand_id"])
        .select("group_id", "mention_id", "cand_id",
                "base_score_u", "votes", "final_u")
    )
