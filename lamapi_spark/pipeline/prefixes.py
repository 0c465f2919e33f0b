"""Conversation-prefix sharing — the KV-cache-reuse census over a
transcript store (reference analogue: none; builder's-brief surface
for the transcripts payload).

Agent transcripts share prefixes pervasively: every conversation spawned
from the same system prompt / few-shot template / tool preamble repeats
the same opening turns verbatim. Two consumers care:

- serving: turns 1..shared_depth of a conversation can be served from a
  warm prefix (KV) cache primed by ANY other conversation in its prefix
  group — the corpus-level reuse fraction bounds the cache hit rate;
- training: prefix-duplicated turns over-weight the template during
  SFT; the shared_depth column is the per-conversation cut point for
  prefix de-duplication.

Algorithm (linear, never pairwise): assemble each conversation's turn
texts in-row (one shuffle, or zero when the store is clustered by
conv_id), emit a rolling md5 prefix fingerprint per depth d <=
max_depth, count conversations per (d, fingerprint), and keep each
conversation's deepest d with count >= 2. Unlike the pairing dedup
family there is NO quadratic candidate join: a prefix shared by 10^6
conversations is one counter cell plus a fixed-width (d, md5) join-back
key — hot templates cost the same as cold ones. Per-conversation work
is O(max_depth^2 * turn_len) characters of hashing, bounded by the
``max_depth`` knob (prefix caches have bounded useful depth for the
same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def prefix_sharing(transcripts: DataFrame, max_depth: int = 16) -> DataFrame:
    """Per-conversation prefix-sharing stats over (conv_id, turn_idx,
    text) rows -> one row per conversation:

    (conv_id, n_turns, shared_depth, group_size, reuse_frac) where
    shared_depth = deepest d <= min(n_turns, max_depth) such that some
    OTHER conversation has the identical first d turn texts (0 if
    none), group_size = conversations sharing that deepest prefix
    (including this one; 1 when shared_depth = 0), and reuse_frac =
    shared_depth / n_turns rounded half-even to 6 dp (the fraction of
    this conversation's turns a prefix cache could have served).

    Prefix identity is exact turn-text equality in order (md5 over the
    0x1f-joined first d texts); turn_idx only orders, gaps are fine.
    """
    arr = (
        transcripts
        .select("conv_id", F.struct("turn_idx", "text").alias("_t"))
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("_t")).alias("_ts"))
        .select("conv_id",
                F.transform("_ts", lambda s: s["text"]).alias("_texts"))
        .select("conv_id", "_texts",
                F.size("_texts").cast("long").alias("n_turns"))
    )
    pref = arr.select(
        "conv_id",
        F.explode(F.sequence(
            F.lit(1), F.least(F.col("n_turns"), F.lit(max_depth)).cast("int"),
        )).alias("d"),
        "_texts",
    ).select(
        "conv_id", "d",
        F.md5(F.concat_ws(_SEP, F.slice("_texts", F.lit(1), F.col("d"))))
        .alias("phash"),
    )
    counts = pref.groupBy("d", "phash").agg(F.count("*").alias("grp"))
    shared = (
        pref.join(counts.filter(F.col("grp") >= 2), ["d", "phash"])
        .groupBy("conv_id")
        .agg(F.max("d").alias("shared_depth"),
             F.max_by("grp", "d").alias("group_size"))
    )
    return (
        arr.select("conv_id", "n_turns")
        .join(shared, "conv_id", "left")
        .select(
            "conv_id", "n_turns",
            F.coalesce("shared_depth", F.lit(0)).cast("long")
            .alias("shared_depth"),
            F.coalesce("group_size", F.lit(1)).cast("long")
            .alias("group_size"),
            F.bround(F.coalesce("shared_depth", F.lit(0)) / F.col("n_turns"),
                     6).alias("reuse_frac"),
        )
    )
