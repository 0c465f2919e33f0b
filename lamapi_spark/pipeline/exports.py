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


# Refusal / assistant-boilerplate lexicon. `.` stands in for apostrophes
# so straight vs typographic quotes both match; patterns are matched on
# the lowercased turn text. Simple alternation only — portable between
# Java regex (Spark rlike) and RE2 (DuckDB regexp_matches).
REFUSAL_RE = ("(i cannot|i can.t|as an ai|i.m sorry|i am sorry|"
              "i apologize|cannot assist|unable to help)")


def refusal_gate(transcripts: DataFrame,
                 refusal_re: str = REFUSAL_RE) -> DataFrame:
    """Per-conversation SFT ingest gate over (conv_id, role, text)
    turns: flag assistant turns matching the refusal/boilerplate
    lexicon and keep only conversations whose assistant never refused.

    Refusal-heavy conversations teach a model to decline — every SFT
    data-prep pipeline drops or downweights them (the transcript twin
    of the Gopher-rule document gate in ops/corpus.py). The verdict is
    per-CONVERSATION because one refusal usually poisons the whole
    exchange (the user re-asks, the assistant hedges again).

    Scale shape: one lowercase+rlike column expression per turn (JVM
    regex, no UDF), one map-side-combined aggregation on conv_id.
    -> (conv_id, n_turns, n_assistant, n_refusals, refusal_rate, keep)
    with refusal_rate = n_refusals / max(n_assistant, 1) rounded
    half-even to 6 dp and keep = (n_refusals == 0).
    """
    is_asst = (F.col("role") == "assistant").cast("long")
    is_ref = ((F.col("role") == "assistant")
              & F.lower(F.col("text")).rlike(refusal_re)).cast("long")
    agg = (
        transcripts
        .select("conv_id", is_asst.alias("_a"), is_ref.alias("_r"))
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"),
             F.sum("_a").alias("n_assistant"),
             F.sum("_r").alias("n_refusals"))
    )
    return agg.select(
        "conv_id", "n_turns", "n_assistant", "n_refusals",
        F.bround(F.col("n_refusals")
                 / F.greatest("n_assistant", F.lit(1)), 6)
        .alias("refusal_rate"),
        (F.col("n_refusals") == 0).alias("keep"),
    )


def conv_role_audit(transcripts: DataFrame) -> DataFrame:
    """Ingest QC for dialogue structure — the gate an SFT pipeline
    runs before sft_pairs, because malformed conversations (double
    assistant turns, assistant-first openings, user-only monologues)
    silently become bad training pairs (reference analogue: none;
    builder's-brief QC surface beside refusal_gate).

    Per conversation: turn count, per-role counts, the number of
    adjacent same-role pairs IN turn order (alternation violations —
    tool turns count like any role), whether the first turn is a user
    turn and the last an assistant turn, and the composed ``ok``
    verdict (user-first AND ends on assistant AND zero same-role
    adjacencies AND at least one assistant turn).

    Scale shape: ONE aggregation per conv_id; the adjacency recount is
    an in-array fold over the sorted (turn_idx, role) array (the
    dialogue-segmentation idiom) — no lag window, no second exchange,
    state bounded by the conversation's own length.

    -> (conv_id, n_turns, n_user, n_assistant, n_other,
    n_same_role_adj, starts_user, ends_assistant, ok).
    """
    arr = F.array_sort(F.collect_list(
        F.struct(F.col("turn_idx").alias("t"), F.col("role").alias("r"))))
    agg = transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long"))
        .alias("n_assistant"),
        arr.alias("_a"))
    same_adj = F.aggregate(
        F.sequence(F.lit(2), F.greatest(F.size("_a"), F.lit(1))),
        F.lit(0).cast("long"),
        lambda acc, i: acc + (F.element_at("_a", i).r
                              == F.element_at("_a", i - 1).r).cast("long"))
    # sequence(2, 1) is DESCENDING (the segments.py footgun): a 1-turn
    # conv must fold over an empty range, hence greatest + the i >= 2
    # guard baked into starting at 2 only when size >= 2
    same_adj = F.when(F.size("_a") >= 2, same_adj).otherwise(F.lit(0))
    starts_user = F.element_at("_a", 1).r == "user"
    ends_assistant = F.element_at("_a", F.size("_a")).r == "assistant"
    out = agg.select(
        "conv_id", "n_turns", "n_user", "n_assistant",
        (F.col("n_turns") - F.col("n_user")
         - F.col("n_assistant")).alias("n_other"),
        same_adj.alias("n_same_role_adj"),
        starts_user.alias("starts_user"),
        ends_assistant.alias("ends_assistant"))
    ok = (F.col("starts_user") & F.col("ends_assistant")
          & (F.col("n_same_role_adj") == 0) & (F.col("n_assistant") > 0))
    return out.withColumn("ok", ok)


def verbalize_entities(triples: DataFrame, k: int = 5,
                       sep: str = "; ") -> DataFrame:
    """Templated KG verbalization: one text line per subject from its
    top-k facts — the KG-to-text export that turns a constructed
    graph back into pretraining/SFT corpus lines (KELM-style
    verbalization reduced to its deterministic template core; a model
    rewriter is a downstream concern). Reference analogue: none;
    builder's-brief export surface beside sft_pairs.

    Facts order (pred, obj) lexicographically; the k winners per
    subject are selected with a row_number window BEFORE the array
    collect, so the aggregation buffer holds at most k facts per
    subject (collect-then-slice would buffer a hub entity's whole
    fact set — the kmv_sketch bound argument). Line =
    'subj pred obj[; pred obj]...'.

    -> (subj, n_facts, text); n_facts counts ALL distinct facts, the
    line carries min(k, n_facts) of them.
    """
    from pyspark.sql import Window

    t = triples.select("subj", "pred", "obj").distinct()
    w = Window.partitionBy("subj").orderBy("pred", "obj")
    top = (t.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= int(k)))
    counts = t.groupBy("subj").agg(F.count("*").alias("n_facts"))
    lines = (top.groupBy("subj")
             .agg(F.array_sort(F.collect_list(
                 F.struct("pred", "obj"))).alias("_a")))
    text = F.concat(
        F.col("subj"), F.lit(" "),
        F.array_join(F.transform(
            "_a", lambda x: F.concat(x.pred, F.lit(" "), x.obj)),
            sep))
    return (lines.join(counts, "subj")
            .select("subj", "n_facts", text.alias("text")))


def bio_export(transcripts: DataFrame, mentions: DataFrame) -> DataFrame:
    """Sequence-labeling export: one row per token with its B/I/O tag
    from the detected mention spans — the training file a supervised
    NER model consumes, closing the loop from dictionary mention
    detection to learned detection (reference analogue: none;
    builder's-brief export beside el_dataset, which exports the
    LINKING task where this exports the DETECTION task).

    Tokenization is detect_mentions' own contract verbatim
    (``split(clean_str(text), " ")``, 1-based positions —
    pipeline/mentions._spans), so span offsets line up by
    construction. ``mentions`` needs (conv_id, turn_idx, start,
    ntoken_span). A span tags B at its start and I inside; if spans
    ever overlap (max-match forbids containment but a caller may feed
    arbitrary spans) the min tag wins per token ('B' < 'I' — the
    deterministic resolution). Untagged tokens read O.

    Scale shape: one posexplode of the token arrays, one in-row
    sequence explode of the spans (bounded by ntoken_span), one
    (conv, turn, pos)-keyed min-agg + left join. -> (conv_id,
    turn_idx, pos, token, tag) — pos 1-based.
    """
    from lamapi_spark.functions.strings import clean_str

    toks = transcripts.select(
        "conv_id", "turn_idx",
        F.posexplode(F.split(clean_str("text"), " ")).alias("_p0", "token")
    ).select("conv_id", "turn_idx",
             (F.col("_p0") + 1).cast("int").alias("pos"), "token")
    tags = (mentions.select(
        "conv_id", "turn_idx", "start",
        F.explode(F.sequence(
            F.col("start"),
            F.col("start") + F.col("ntoken_span") - 1)).alias("pos"))
        .select("conv_id", "turn_idx", F.col("pos").cast("int").alias("pos"),
                F.when(F.col("pos") == F.col("start"),
                       F.lit("B")).otherwise(F.lit("I")).alias("tag"))
        .groupBy("conv_id", "turn_idx", "pos")
        .agg(F.min("tag").alias("tag")))
    return (toks.join(tags, ["conv_id", "turn_idx", "pos"], "left")
            .withColumn("tag", F.coalesce("tag", F.lit("O"))))
