"""Mention detection over transcript turns.

The reference's mention detector is a spaCy NER round-trip
(api/model/data_retrievers/ner_recognizer.py:4-29). We do not ship a
model; mention detection is re-expressed as **dictionary max-matching**
against the label dictionary (the KG itself supplies NERtype), which is
the shape the north star prescribes. Two arms:

- exact arm: every 1..K-token window of the cleaned turn text is a span;
  spans equi-join the dictionary on ``name_norm``. Pure JVM dataflow.
- fuzzy arm (optional): spans and dictionary names both explode into
  SymSpell deletion-1 variants; sharing a variant bounds edit distance,
  then a real ``levenshtein`` post-filter keeps 1-edit matches. The
  dictionary-side variant table is an index artifact (precompute it once,
  write bucketed by variant) — mention-side cost is linear in span count.

Overlap resolution: a matched span contained in a longer matched span is
dropped (max-match). Implemented per-turn with a collect+filter over the
turn's matched spans (bounded by turn length — no driver loop).

NIL mentions (surface forms absent from the KG): runs of adjacent
out-of-vocabulary tokens (not in the dictionary token vocabulary, not
stopwords, not literal-shaped) become candidate mentions that downstream
linking maps to deterministic NIL ids. This replaces the reference's
model-based NER for unknown entities.

Scale notes: transcripts are explicitly repartitioned by ``conv_id``
before windowed work (north-rule requirement). The span->matched join's
strategy is decided from the dictionary cardinality PERSISTED at index
build (never a Catalyst estimate, never an unconditional hint — both
measured pathological, see ``_BROADCAST_NAME_CAP``): small dictionary ->
broadcast the matched-span list; huge dictionary -> shuffle on the span
string with AQE skew handling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lamapi_spark.functions import clean_str
from lamapi_spark.functions.literals import classify_literal
from lamapi_spark.functions.strings import STOPWORDS

# Broadcast the matched-span list only when the dictionary's PERSISTED
# name count (index meta, counted once at build) bounds it safely:
# matched rows ~= names x (1 + fuzzy collisions), ~100B serialized each,
# so 2M names keeps the worst-case broadcast in the few-hundred-MB range
# — far under Spark's 8GiB hard cap, comparable to the session's 256MB
# auto-broadcast policy. Above the cap the join falls back to a span
# shuffle with AQE skew splitting. Env-overridable (LAMAPI_BROADCAST_
# NAME_CAP) so the huge-dictionary fallback arm can be FORCED and
# benchmarked at sandbox dictionary sizes (set 0 to always shuffle).
_BROADCAST_NAME_CAP = int(os.environ.get("LAMAPI_BROADCAST_NAME_CAP",
                                         2_000_000))


def _fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition with an EXPLICIT partition count before a row-exploding
    operator. AQE sizes shuffle partitions from pre-explosion bytes, so a
    few-MB input coalesces to 1-2 partitions and the explosion (span
    windows x deletion variants = 100x-1000x rows) runs nearly serial.
    A fixed count pins the post-shuffle parallelism."""
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(n, *cols) if cols else df.repartition(n)


def _spans(transcripts: DataFrame, max_ntoken: int,
           carry: tuple[str, ...] = ()) -> DataFrame:
    """All 1..K-token windows of each turn: (conv_id, turn_idx[, carry],
    start, ntoken_span, span). ``start`` is the 1-based token offset.
    ``carry`` names extra columns to ride along unchanged (the streaming
    twin carries the event-time column through for its watermark)."""
    toks = transcripts.select(
        "conv_id", "turn_idx", *carry,
        F.split(clean_str("text"), " ").alias("toks"),
    )
    span_structs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_ntoken), F.size("toks") - i + 1)),
            lambda n: F.struct(
                i.alias("start"),
                n.alias("ntoken_span"),
                F.concat_ws(" ", F.slice("toks", i, n)).alias("span"),
            ),
        ),
    ))
    return toks.select(
        "conv_id", "turn_idx", *carry, F.explode(span_structs).alias("s")
    ).select("conv_id", "turn_idx", *carry,
             "s.start", "s.ntoken_span", "s.span")


def _del1(c):
    """Deletion-1 neighborhood of a string (incl. itself)."""
    one = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, F.length(c))),
    )
    return F.array_distinct(F.concat(F.array(c), one))


def fuzzy_name_index(label_dict: DataFrame) -> DataFrame:
    """(variant, name_norm) deletion-1 index over distinct dictionary
    names — precomputable; at scale written bucketed by ``variant``."""
    return (
        label_dict.select("name_norm").distinct()
        .select(F.explode(_del1(F.col("name_norm"))).alias("variant"), "name_norm")
    )


def detect_mentions(
    transcripts: DataFrame,
    label_dict: DataFrame,
    max_ntoken: int = 4,
    fuzzy: bool = True,
    broadcast_dict: bool = True,
    index=None,
) -> DataFrame:
    """-> (conv_id, turn_idx, start, ntoken_span, surface, name_norm,
    edits) — one row per detected span, max-matched (no span contained
    in a longer matched span), deduped to the best (min-edit) dictionary
    name per span.

    ``index``: a prebuilt :class:`~lamapi_spark.operators.indexes.
    LookupIndex`. With a bucketed index the span->name joins probe the
    saved name / deletion-variant tables with no dictionary-side shuffle
    or broadcast (distinct on the bucketed key is also shuffle-free)."""
    spans = _spans(
        _fan_out(transcripts, "conv_id"),
        max_ntoken,
    )

    # Match DISTINCT span strings, then broadcast the (small) match list
    # back onto span positions. Transcript text is template-heavy, so
    # distinct spans are orders of magnitude fewer than span occurrences
    # — this keeps the deletion-variant explosion (the allocation-heavy
    # part) off the big table entirely. This is the same dedup-before-
    # expensive-work principle as the lookup mention cache.
    span_strs = _fan_out(spans.select("span").distinct(), "span")

    bucketed = index is not None and index.bucketed
    if index is not None:
        names = index.names.select("name_norm").distinct()
    else:
        names = label_dict.select("name_norm").distinct()
    if bucketed:
        names_b = names.hint("shuffle_hash")
    elif broadcast_dict:
        names_b = F.broadcast(names)
    else:
        names_b = names

    exact_strs = span_strs.join(
        names_b, span_strs.span == names_b.name_norm, "inner"
    ).select("span", "name_norm", F.lit(0).alias("edits"))

    if fuzzy:
        if index is not None and index.fuzzy_names is None:
            raise ValueError("fuzzy detection requires an index built with fuzzy=True")
        f_idx = index.fuzzy_names if index is not None else fuzzy_name_index(label_dict)
        if bucketed:
            f_idx = f_idx.hint("shuffle_hash")
        elif broadcast_dict:
            f_idx = F.broadcast(f_idx)
        fuzzy_strs = (
            span_strs.select("span", F.explode(_del1(F.col("span"))).alias("variant"))
            .join(f_idx, "variant", "inner")
            .withColumn("edits", F.levenshtein("span", "name_norm"))
            .filter(F.col("edits") == 1)
            .select("span", "name_norm", "edits")
            .distinct()
        )
        matched_strs = exact_strs.unionByName(fuzzy_strs)
    else:
        matched_strs = exact_strs

    # matched_strs derives from a join, so its Catalyst size estimate is
    # garbage in BOTH directions — measured: the static planner once
    # picked an 11.1GiB "broadcast" of the spans side from a <256MB
    # estimate (Spark's hard 8GiB cap), and pinning the join to
    # shuffle_hash instead shuffles every span OCCURRENCE by its (very
    # skewed, template-heavy) string and scales NEGATIVELY on more
    # executors. So the strategy is decided from an ACTUAL cardinality,
    # never an estimate: matched_strs is bounded by the dictionary's
    # name count, which the bucketed artifact persisted at build time
    # (index.n_names). Small dictionary -> broadcast the matched list
    # (one bounded driver round-trip, no spans shuffle, no skew); huge
    # dictionary -> shuffle on span and let AQE's skew-join split the
    # hot strings. The in-memory path keeps the caller's broadcast
    # policy (distinct matched spans << span occurrences).
    force_broadcast = (broadcast_dict and not bucketed) or (
        bucketed and index.n_names is not None
        and index.n_names <= _BROADCAST_NAME_CAP)
    # Shuffle-byte cut: the span OCCURRENCE frame (the big side) ships a
    # 96-bit composite hash of the span instead of the raw multi-word
    # string — the string rides only on the (bounded) matched side and
    # comes back through the join, so the fallback arm's shuffle moves
    # fixed-width rows (4 ints + conv_id) on a measured memory-bandwidth-
    # bound box. Correctness: a wrong surface would need two DISTINCT
    # span strings colliding on BOTH xxhash64 and crc32 (~2^-96 per
    # pair): at 10^12 distinct spans x 10^8 matched names the expected
    # collision count is ~1e-9 — far below any hardware error rate.
    def _span_key(df: DataFrame) -> DataFrame:
        return df.withColumn("_h1", F.xxhash64("span")).withColumn(
            "_h2", F.crc32(F.encode("span", "utf-8")))

    spans_h = _span_key(spans).drop("span")
    matched_keyed = _span_key(matched_strs)
    matched = spans_h.join(
        F.broadcast(matched_keyed) if force_broadcast
        else matched_keyed.hint("shuffle_hash"), ["_h1", "_h2"]
    ).select("conv_id", "turn_idx", "start", "ntoken_span",
             F.col("span").alias("surface"), "name_norm", "edits")

    # Per-turn span resolution in ONE shuffle (was: a row_number window
    # over (conv_id, turn_idx, start, ntoken) THEN a group-by over
    # (conv_id, turn_idx) — two full exchanges of the matched rows).
    # Collect each turn's matched spans (bounded by turn length x
    # matches) and resolve inside the array:
    # - best dictionary name per span position: fewest edits, then
    #   lexicographic (strict (edits, name_norm) comparison — name_norm
    #   is distinct within a position, so the minimum is unique);
    # - max-match: drop spans strictly contained in a longer matched
    #   span (containment only inspects positions, so checking against
    #   the pre-dedup array is equivalent).
    per_turn = matched.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("start", "ntoken_span", "surface", "name_norm", "edits")).alias("_ms"))
    kept = per_turn.select(
        "conv_id", "turn_idx",
        F.explode(F.filter(
            "_ms",
            lambda s: ~F.exists(
                "_ms",
                lambda o: (o["start"] == s["start"])
                & (o["ntoken_span"] == s["ntoken_span"])
                & ((o["edits"] < s["edits"])
                   | ((o["edits"] == s["edits"])
                      & (o["name_norm"] < s["name_norm"]))),
            ) & ~F.exists(
                "_ms",
                lambda o: (o["start"] <= s["start"])
                & (o["start"] + o["ntoken_span"] >= s["start"] + s["ntoken_span"])
                & (o["ntoken_span"] > s["ntoken_span"]),
            ),
        )).alias("m"),
    ).select("conv_id", "turn_idx", "m.start", "m.ntoken_span",
             "m.surface", "m.name_norm", "m.edits")
    return kept


def detect_oov_mentions(
    transcripts: DataFrame,
    label_dict: DataFrame,
    max_run: int = 4,
    min_run: int = 2,
    broadcast_dict: bool = True,
    index=None,
) -> DataFrame:
    """Candidate NIL mentions: maximal runs (min_run <= length <= max_run)
    of adjacent tokens that are out-of-vocabulary w.r.t. the dictionary
    token set, not stopwords, and not literal-shaped (numbers/dates/...).
    ``min_run`` defaults to 2: single OOV tokens are overwhelmingly
    ordinary verbs/nouns, not entity names.

    -> (conv_id, turn_idx, start, ntoken_span, surface)."""
    if index is not None and index.bucketed:
        # token vocabulary straight from the bucketed token index:
        # distinct on the bucket key is shuffle-free
        vocab = (index.token.select("token").distinct()
                 .withColumn("_in_vocab", F.lit(True)).hint("shuffle_hash"))
    else:
        vocab = (
            label_dict.select(F.explode(F.split("name_norm", " ")).alias("token"))
            .distinct().withColumn("_in_vocab", F.lit(True))
        )
        if broadcast_dict:
            vocab = F.broadcast(vocab)

    toks = _fan_out(transcripts, "conv_id").select(
        "conv_id", "turn_idx",
        F.posexplode(F.split(clean_str("text"), " ")).alias("pos", "token"),
    )
    # classify/filter DISTINCT tokens once (the literal-classifier regex
    # cascade is the expensive bit), then broadcast-semi-join back
    oov_tokens = (
        toks.select("token").distinct()
        .join(vocab, "token", "left")
        .filter(F.col("_in_vocab").isNull())
        .filter(~F.col("token").isin(*STOPWORDS))
        .filter(classify_literal("token") == "STRING")
        .filter(F.length("token") > 2)
        .select("token")
    )
    # oov_tokens is join-derived (anti-join vs the vocabulary): forcing a
    # broadcast is the same driver round-trip as above — only do it in
    # the in-memory path, never with a bucketed (cluster-scale) index
    force_broadcast = broadcast_dict and not (index is not None and index.bucketed)
    oov = toks.join(
        F.broadcast(oov_tokens) if force_broadcast
        else oov_tokens.hint("shuffle_hash"), "token")
    # Gaps-and-islands in ONE shuffle: collect each turn's OOV tokens
    # once, sort in-array by position (explicit determinism), then runs
    # are the distinct values of (pos - index) over the sorted array —
    # adjacent positions share the key — materialized with indexed
    # transform/filter lambdas (scalar comparisons only). This replaces
    # the round-4 F.aggregate fold, which rebuilt the runs array with
    # concat(slice(...)) per element: measured (tools/ab_oov.py, 3.75M
    # turns, 1x4 and 4x4 executors) the fold cost ~8-10% more wall than
    # this formulation at both levels for identical output hashes. The
    # pre-round-4 row_number-window + group-by is ~5% faster still on
    # this box but its collect_list surface order is ARRIVAL-dependent —
    # the A/B caught it emitting different hashes across identical runs
    # at 4x4 — which breaks the engine's bit-identical-across-parallelism
    # guarantee, so it is disqualified, not slow. Arrays are bounded by
    # turn length (10-20 tokens), so the O(runs x n) lambda work is
    # trivial per row.
    per_turn = oov.groupBy("conv_id", "turn_idx").agg(
        F.sort_array(F.collect_list(F.struct("pos", "token"))).alias("_tk"))
    runs = per_turn.select(
        "conv_id", "turn_idx",
        F.explode(F.expr("""
          transform(
            array_distinct(transform(_tk, (e, i) -> e.pos - i)),
            g -> named_struct(
              'start', filter(_tk, (e, i) -> e.pos - i = g)[0].pos + 1,
              'ntoken_span', size(filter(_tk, (e, i) -> e.pos - i = g)),
              'surface', array_join(transform(
                  filter(_tk, (e, i) -> e.pos - i = g), e -> e.token), ' ')))
        """)).alias("r"))
    return (
        runs
        .filter((F.col("r.ntoken_span") <= max_run)
                & (F.col("r.ntoken_span") >= min_run))
        .select("conv_id", "turn_idx",
                # 1-based like _spans
                F.col("r.start").cast("int").alias("start"),
                F.col("r.ntoken_span").alias("ntoken_span"),
                F.col("r.surface").alias("surface"))
    )


def detect_mentions_pandas(
    transcripts: DataFrame,
    dict_names: list[str],
    max_ntoken: int = 4,
) -> DataFrame:
    """Vectorized pandas/Arrow alternative of the exact arm: batched
    max-matching inside ``mapInPandas`` with the dictionary as a
    broadcast plain-Python set. Semantics must equal
    ``detect_mentions(fuzzy=False)`` (tested); exists to satisfy the
    batched-UDF stage shape and as the extension point for matchers the
    DataFrame algebra can't express (e.g. model-based NER).
    """
    import pandas as pd  # noqa: F401

    spark = transcripts.sparkSession
    name_set = spark.sparkContext.broadcast(set(dict_names))
    out_schema = ("conv_id string, turn_idx int, start int, "
                  "ntoken_span int, surface string, name_norm string, edits int")

    def matcher(batches):
        names = name_set.value
        for pdf in batches:
            rows = {"conv_id": [], "turn_idx": [], "start": [],
                    "ntoken_span": [], "surface": [], "name_norm": [], "edits": []}
            for conv, turn, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                toks = " ".join((text or "").lower().split()).split(" ")
                found = []
                for i in range(len(toks)):
                    for n in range(min(max_ntoken, len(toks) - i), 0, -1):
                        span = " ".join(toks[i:i + n])
                        if span in names:
                            found.append((i + 1, n, span))
                kept = [
                    (s, n, sp) for (s, n, sp) in found
                    if not any(
                        os <= s and os + on >= s + n and on > n
                        for (os, on, _) in found
                    )
                ]
                for s, n, sp in kept:
                    rows["conv_id"].append(conv)
                    rows["turn_idx"].append(int(turn))
                    rows["start"].append(s)
                    rows["ntoken_span"].append(n)
                    rows["surface"].append(sp)
                    rows["name_norm"].append(sp)
                    rows["edits"].append(0)
            yield pd.DataFrame(rows)

    return (
        _fan_out(transcripts, "conv_id")
        .select("conv_id", "turn_idx", "text")
        .mapInPandas(matcher, schema=out_schema)
    )
