"""Conversation-granularity near-dedup: reassemble each conversation's
canonical text from its turns, then reuse the document near-dup
machinery (ops/dedup.hamming_pairs / simhash_pairs) at dialog
granularity.

Training-data dedup on transcripts happens at the CONVERSATION level —
two support dialogs that differ by one entity token are the template
near-dups the dedup family exists for — but the north-rule input table
stores one row per TURN. The missing stage is the canonicalization:
(conv_id, turn_idx, text) -> one deterministic document per
conversation, independent of row arrival order and partitioning.

Scale shape: ONE partial-aggregating groupBy on conv_id; the in-array
sort+join is bounded by turns-per-conversation (the same bounded-group
argument as pipeline/mentions' per-turn folds and ops/corpus
pack_chunks). No window, no second exchange — the pairing stages
downstream (simhash banding) add their own documented machinery.

Determinism: turns sort by (turn_idx, text) in-array (turn_idx is
unique per conversation in the contract, so the text component is
inert), making the reassembled string a pure function of the row SET —
the same guarantee the input contract's "per-turn text equality under
stable turn ordering" invariant demands.

Reference analogue: none (lamAPI is a lookup service) —
builder's-brief dedup surface over the transcript contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conv_canonical_text(transcripts: DataFrame, sep: str = " ") -> DataFrame:
    """(conv_id, turn_idx, text) -> (conv_id, text): each
    conversation's turns concatenated in turn order with ``sep``.
    A NULL turn text is skipped by array_join (the turn contributes
    nothing — degrade, not error); the input contract's text column is
    non-null, so this only matters for malformed feeds."""
    item = F.struct(F.col("turn_idx").alias("i"), F.col("text").alias("t"))
    return (
        transcripts.groupBy("conv_id")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(item)), lambda x: x["t"]),
            sep).alias("text"))
    )


def conv_neardup_pairs(transcripts: DataFrame,
                       max_hamming: int = 3, n_bands: int = 4,
                       max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate CONVERSATION pairs (id_a < id_b, Hamming over the
    60-bit SimHash of the reassembled dialog text). Composition:
    conv_canonical_text -> ops/dedup.simhash_pairs."""
    from lamapi_spark.ops.dedup import simhash_pairs

    docs = conv_canonical_text(transcripts)
    return simhash_pairs(docs, "conv_id", "text",
                         max_hamming=max_hamming, n_bands=n_bands,
                         max_bucket=max_bucket)
