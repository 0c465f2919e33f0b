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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
