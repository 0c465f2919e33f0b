"""Triple extraction: linked mentions -> (subj, pred, obj) with
provenance, via per-turn co-occurrence + KG edge probing.

The reference's closest shape is the predicates endpoint (J5,
api/model/data_retrievers/predicates_retriever.py:52-73): given
(subj, obj) pairs, probe the adjacency for the predicate list. Here the
pairs come from co-occurring linked mentions inside a conversation turn
(ordered by token offset — the earlier mention is the subject, matching
the "«subj» <verb phrase> «obj»" dependency-light pattern shape), and
the probe is an equi-join against the flat edges table.

Literal triples: a linked mention co-occurring with a literal-classified
token sequence in the same turn can emit attribute triples — exposed as
``literal_candidates`` for downstream use.

Scale: mention pairs are generated turn-locally after an explicit
repartition by conv_id (no shuffle for the pairing itself — it rides the
detection partitioning); the edge probe shuffles on (subj, obj) unless
the edges table is broadcastable. Head-entity skew on the probe join is
handled by AQE skew splitting (the join key includes obj, which spreads
hot subjects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mention_pairs(linked: DataFrame) -> DataFrame:
    """Ordered co-occurrence pairs of non-NIL linked mentions per turn:
    earlier-offset mention is subject. Distinct per (conv, turn, subj, obj)."""
    l = linked.filter(~F.col("nil")).select(
        "conv_id", "turn_idx", "start", "entity")
    a = l.select("conv_id", "turn_idx",
                 F.col("start").alias("s_start"), F.col("entity").alias("subj"))
    b = l.select("conv_id", "turn_idx",
                 F.col("start").alias("o_start"), F.col("entity").alias("obj"))
    return (
        a.join(b, ["conv_id", "turn_idx"])
        .filter((F.col("s_start") < F.col("o_start")) & (F.col("subj") != F.col("obj")))
        .select("conv_id", "turn_idx", "subj", "obj")
        .distinct()
    )


def probe_edges(pairs: DataFrame, edges: DataFrame,
                broadcast_edges: bool = False) -> DataFrame:
    """(conv, turn, subj, obj) pairs ⋈ edges -> provenance triples."""
    e = F.broadcast(edges) if broadcast_edges else edges
    return pairs.join(e, ["subj", "obj"], "inner").select(
        "subj", "pred", "obj", "conv_id", "turn_idx")


def extract_triples(linked: DataFrame, edges: DataFrame,
                    broadcast_edges: bool = False) -> DataFrame:
    return probe_edges(mention_pairs(linked), edges, broadcast_edges)


def tool_invocation_edges(transcripts: DataFrame,
                          entity_re: str = "^[cs][0-9]+$",
                          max_turns_back: int = 10) -> DataFrame:
    """Agent-transcript tool provenance: every ``role='tool'`` turn
    emits a (tool, invoked_after, entity) triple for the most recent
    entity token mentioned in a PRIOR turn of the same conversation
    (within ``max_turns_back`` turns) — the "which tool ran against
    which entity" edge a KG over agent transcripts needs. This is the
    consumer of the input contract's role/tool columns (BASELINE.json
    input_hint: conv_id, turn_idx, role, text, tool, ts).

    Same one-window antecedent-carry shape as pipeline/coref.py: first
    entity token per turn via regexp on the split text (pure column
    exprs), then ONE last_value(IGNORE NULLS) window per conv ordered
    by turn_idx — a single exchange on conv_id, O(1) window state.

    -> (conv_id, turn_idx, tool, entity) for resolvable tool turns.
    """
    first_ent = F.get(F.filter(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda t: t.rlike(entity_re)), 0)
    base = transcripts.select(
        "conv_id", "turn_idx", "role", "tool",
        first_ent.alias("_ent"))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    carry = F.last(
        F.when(F.col("_ent").isNotNull(),
               F.struct(F.col("turn_idx").alias("t"),
                        F.col("_ent").alias("e"))),
        ignorenulls=True).over(w)
    return (
        base.withColumn("_a", carry)
        .filter((F.col("role") == "tool") & F.col("_a").isNotNull()
                & (F.col("turn_idx") - F.col("_a.t") <= max_turns_back))
        .select("conv_id", "turn_idx", "tool",
                F.col("_a.e").alias("entity"))
    )
