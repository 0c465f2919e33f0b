"""Conversation-window pronoun coreference: resolve pronoun tokens to
the most recent linked entity mention earlier in the same conversation.

The north star's triple mining is per conversation window (turns
ordered by turn_idx within conv_id); the mention/link stages only emit
triples between entities co-occurring in ONE turn. Transcripts, though,
carry entities across turns as pronouns ("it", "they", ...), so a
dependency-light coref pass — antecedent = nearest preceding entity
mention within a bounded turn window — is the standard recall lever
(reference analogue: none; unimib-datAI/lamAPI links per-request text
only. This is north-rule transcript surface).

Shape: ONE exchange. Entity occurrences and pronoun occurrences union
into a single per-conversation event stream ordered by (turn_idx,
pos); the antecedent is a `last(non-null, ignorenulls)` running carry
over that order — the exact one-partitioned-sort pattern proven by
ops/temporal.asof_join. No self-join of the transcript, no per-row
Python, O(1) window state (ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING with last+ignorenulls is a running value, not a buffered
frame).

Scale: partitions by conv_id (the same key the whole pipeline already
shuffles on — a real deployment co-partitions these stages so the sort
rides the existing exchange); conversations are bounded (turn count x
tokens per turn), so no per-key state concern. max_turns bounds how
stale an antecedent may be — resolution degrades to NULL (NIL-style)
rather than linking across the window.

Determinism: the event order (turn_idx, pos) is a total order within a
conversation (one token occupies one position), so the carried
antecedent is a pure function of the transcript — partition-count
independent and engine-portable (the DuckDB oracle replays the same
window with IGNORE NULLS semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: dependency-light pronoun inventory (lowercased token equality — the
#: same bar the mention detector's token pipeline uses; no POS tagging)
PRONOUNS = ("it", "they", "he", "she", "this", "that", "them", "its")


def coref_resolve(occurrences: DataFrame, max_turns: int = 10) -> DataFrame:
    """Resolve pronoun occurrences to their nearest preceding entity.

    ``occurrences`` — one row per token occurrence of interest:
      conv_id, turn_idx (int), pos (int, token position within the
      turn), entity (string, NULL on pronoun rows), pronoun (string,
      NULL on entity-mention rows). Exactly one of entity/pronoun is
      non-null per row.

    Returns one row per pronoun occurrence:
      (conv_id, turn_idx, pos, pronoun, antecedent, antecedent_turn)
    with antecedent NULL when no entity mention precedes the pronoun
    within ``max_turns`` turns (inclusive same-turn, earlier pos).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx", "pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry (turn, entity) as ONE struct so the antecedent and its turn
    # always come from the same preceding row
    ante = F.last(
        F.when(F.col("entity").isNotNull(),
               F.struct(F.col("turn_idx").alias("t"),
                        F.col("entity").alias("e"))),
        ignorenulls=True,
    ).over(w)
    resolved = (
        occurrences
        .withColumn("_ante", ante)
        .filter(F.col("pronoun").isNotNull())
        .withColumn(
            "_ok",
            F.col("_ante").isNotNull()
            & (F.col("turn_idx") - F.col("_ante.t") <= F.lit(max_turns)),
        )
    )
    return resolved.select(
        "conv_id", "turn_idx", "pos", "pronoun",
        F.when(F.col("_ok"), F.col("_ante.e")).alias("antecedent"),
        F.when(F.col("_ok"), F.col("_ante.t")).alias("antecedent_turn"),
    )


def token_occurrences(transcripts: DataFrame,
                      entity_pattern: str = r"^E[0-9]+$",
                      carry: tuple = ()) -> DataFrame:
    """Tokenize turn text and classify each position as an entity
    mention (matches ``entity_pattern``) or a pronoun (PRONOUNS
    membership); other tokens drop. Pure column expressions — split +
    posexplode + two predicates — so the stage is embarrassingly
    parallel, rides whatever partitioning the transcript scan has, and
    works unchanged on a streaming frame (``carry`` keeps extra
    columns, e.g. the event-time ``ts`` the streaming twin watermarks
    on — the _spans convention)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    exploded = (
        transcripts
        .select("conv_id", "turn_idx", *carry,
                F.posexplode(toks).alias("pos", "tok"))
        # posexplode is 0-based; positions are 1-based in the contract
        # (and in the DuckDB oracle's range()) — shift once here
        .withColumn("pos", F.col("pos") + F.lit(1))
    )
    is_ent = F.col("tok").rlike(entity_pattern)
    is_pro = F.lower(F.col("tok")).isin(*PRONOUNS)
    return (
        exploded.filter(is_ent | is_pro)
        .select(
            "conv_id", "turn_idx", *carry, "pos",
            F.when(is_ent, F.col("tok")).alias("entity"),
            F.when(~is_ent, F.lower(F.col("tok"))).alias("pronoun"),
        )
    )


def coref_triples(resolved: DataFrame, occurrences: DataFrame,
                  edges: DataFrame) -> DataFrame:
    """Cross-turn triple candidates a coref pass unlocks: the resolved
    pronoun stands in for its antecedent entity, pairing with entity
    mentions co-occurring in the PRONOUN's turn (earlier position =
    subject, the pipeline's ordering convention), then probing the KG
    edge set exactly like pipeline/triples.probe_edges. The pair build
    joins on (conv_id, turn_idx) — turn-local, bounded fan-out — and
    the probe shuffles on (subj, obj) with AQE skew split, the measured
    triples-stage shape."""
    pro = resolved.filter(F.col("antecedent").isNotNull()).select(
        "conv_id", "turn_idx",
        F.col("pos").alias("p_pos"), F.col("antecedent").alias("p_ent"))
    ment = occurrences.filter(F.col("entity").isNotNull()).select(
        "conv_id", "turn_idx",
        F.col("pos").alias("m_pos"), F.col("entity").alias("m_ent"))
    pairs = (
        pro.join(ment, ["conv_id", "turn_idx"])
        .filter(F.col("p_ent") != F.col("m_ent"))
        .select(
            "conv_id", "turn_idx",
            F.when(F.col("p_pos") < F.col("m_pos"), F.col("p_ent"))
             .otherwise(F.col("m_ent")).alias("subj"),
            F.when(F.col("p_pos") < F.col("m_pos"), F.col("m_ent"))
             .otherwise(F.col("p_ent")).alias("obj"),
        )
        .distinct()
    )
    return pairs.join(edges, ["subj", "obj"]).select(
        "subj", "pred", "obj", "conv_id", "turn_idx")
