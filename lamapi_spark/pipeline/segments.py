"""Dialogue segmentation: split each conversation into topically
coherent segments by lexical cohesion between adjacent turns.

Long agent transcripts routinely interleave tasks; triple mining and
RAG chunking both want TOPIC segments, not raw conversations (a
co-occurrence window that spans a topic shift mints spurious edges).
The dependency-light classic is TextTiling-shaped: a segment boundary
opens wherever the token-set Jaccard similarity between a turn and its
predecessor falls below a threshold.

Scale shape: tokenization and the distinct-token sets are pure column
expressions; the lag and the running boundary count are TWO window
functions over the SAME (conv_id, turn_idx) ordering, so Catalyst
plans them into ONE exchange + one sort — per-conversation groups are
bounded by turns-per-conv, the usual bounded-group argument.

Determinism: similarity = |A∩B| / |A∪B| over distinct lowered tokens —
one integer-to-integer IEEE division, bit-identical at any
parallelism; the boundary rule (first turn, or sim < threshold) and
the running sum are pure functions of the ordered turn sequence.

Reference analogue: none (lamAPI has no dialogue surface) —
builder's-brief segmentation for the transcript contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segment_turns(transcripts: DataFrame,
                  threshold: float = 0.2) -> DataFrame:
    """(conv_id, turn_idx, text) -> (conv_id, turn_idx, sim_prev,
    seg_id): seg_id is 1-based and increments wherever the Jaccard
    similarity to the previous turn drops below ``threshold``
    (sim_prev is NULL on each conversation's first turn, which always
    opens segment 1)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    cur = transcripts.withColumn("_t", toks)
    prev = F.lag("_t").over(w)
    inter = F.size(F.array_intersect(F.col("_t"), prev))
    uni = F.size(F.array_union(F.col("_t"), prev))
    sim = (inter.cast("double") / uni.cast("double"))
    boundary = F.when(prev.isNull() | (sim < F.lit(threshold)), 1).otherwise(0)
    out = (
        cur.withColumn("sim_prev", sim)
        .withColumn("_b", boundary)
        .withColumn("seg_id", F.sum("_b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("int"))
    )
    return out.select("conv_id", "turn_idx", "sim_prev", "seg_id")


def segment_summary(segmented: DataFrame) -> DataFrame:
    """(conv_id, seg_id) rollup of :func:`segment_turns` output:
    (conv_id, seg_id, start_turn, end_turn, n_turns) — ONE
    partial-aggregating group-by."""
    return (
        segmented.groupBy("conv_id", "seg_id")
        .agg(F.min("turn_idx").alias("start_turn"),
             F.max("turn_idx").alias("end_turn"),
             F.count("*").cast("long").alias("n_turns"))
    )
