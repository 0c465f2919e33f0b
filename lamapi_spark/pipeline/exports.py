"""Training-set exporters: turn the KG pipeline's intermediate frames
into the supervised datasets an entity-linking / NER model trains on.

The canonical EL training example is (mention surface, gold entity,
local context) — mined straight from the transcripts the pipeline
already processes. This module keeps the export a pure column-level
transform so it rides the pipeline's partitioning: one co-keyed join
of mention occurrences onto their turn text, then in-row array slices
for the context windows; no shuffle beyond the join, no UDFs.

Reference analogue: none (lamAPI serves lookups; it does not emit
training data) — builder's-brief training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(transcripts: DataFrame,
              max_turns_back: int | None = None) -> DataFrame:
    """(conv_id, turn_idx, role, text) -> supervised fine-tuning
    (prompt, response) pairs: every assistant turn pairs with the most
    recent PRECEDING user turn of its conversation (tool/system turns
    in between are skipped, not paired) -> (conv_id, prompt_turn,
    response_turn, prompt, response). ``max_turns_back`` drops stale
    pairs (user turn more than n turns before the response) — the
    tool_invocation_edges staleness contract.

    Scale shape: ONE last-non-null carry window per conversation (the
    coref/tool-edges shape — a single (conv, turn) exchange, streaming
    frame); assistant rows project the carried struct, everything else
    drops. Deterministic: the carry is a pure function of the ordered
    turn sequence."""
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    u = F.when(F.col("role") == "user",
               F.struct(F.col("turn_idx").alias("t"),
                        F.col("text").alias("x")))
    carried = transcripts.withColumn("_u", F.last(u, ignorenulls=True).over(w))
    out = (carried.filter((F.col("role") == "assistant")
                          & F.col("_u").isNotNull()))
    if max_turns_back is not None:
        out = out.filter(
            F.col("turn_idx") - F.col("_u.t") <= F.lit(int(max_turns_back)))
    return out.select(
        "conv_id", F.col("_u.t").alias("prompt_turn"),
        F.col("turn_idx").alias("response_turn"),
        F.col("_u.x").alias("prompt"), F.col("text").alias("response"))


def mention_context_windows(transcripts: DataFrame,
                            occurrences: DataFrame,
                            window: int = 3) -> DataFrame:
    """(conv_id, turn_idx, pos, entity) mention occurrences (1-based
    token positions, the token_occurrences contract) joined back onto
    their turn text -> (conv_id, turn_idx, pos, entity, left_ctx,
    right_ctx): up to ``window`` tokens of context on each side,
    space-joined (empty string at turn edges).

    Scale shape: ONE equi-join on (conv_id, turn_idx) — the occurrence
    side is a filtered projection of the same scan, so AQE plans a
    local join when the transcript scan is bucketed by conv_id; the
    slices are in-row expressions over the re-split token array
    (bounded by turn length)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = transcripts.select("conv_id", "turn_idx", toks.alias("_toks"))
    occ = occurrences.select("conv_id", "turn_idx", "pos", "entity")
    lo = F.greatest(F.lit(1), F.col("pos") - F.lit(window))
    left = F.slice(F.col("_toks"), lo, F.col("pos") - lo)
    right = F.slice(F.col("_toks"), F.col("pos") + 1, F.lit(window))
    return (
        occ.join(t, ["conv_id", "turn_idx"])
        .select("conv_id", "turn_idx", "pos", "entity",
                F.array_join(left, " ").alias("left_ctx"),
                F.array_join(right, " ").alias("right_ctx"))
    )
