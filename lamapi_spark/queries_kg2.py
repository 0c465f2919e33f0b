"""Round-4 continuation KG contract queries: per-conversation entity
salience, temporal-KG validity intervals + as-of snapshot over
timestamped assertions, and conversation-granularity near-dedup —
each with a DuckDB oracle that rebuilds the dataflow independently.

The salience query reuses queries_kg's planted transcript synth (both
engines derive the identical transcript from orders); the temporal
queries derive a deterministic assertion log from orders with integer
MICROS timestamps (the queries_temporal parity rule) and a unique tie
column exercising the total-order contract; the conv-dedup query
chunks the documents table into per-turn rows so the reassembly
round-trip is provably exact (the oracle pairs the ORIGINAL document
text brute-force — equality proves both the reassembly identity and
the banding's losslessness at dialog granularity).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lamapi_spark.queries import load, register
from lamapi_spark.queries_kg import (
    _ENT_RE, _OCC_SQL, _TR_SQL, _TRT_SQL, _transcripts,
)
from lamapi_spark.queries_ops import _SIMHASH_SQL, _SIMHASH_SQL_HASHES

# ------------------------------------------------- entity salience

@register("kg_entity_salience", f"""
WITH {_TR_SQL}, {_OCC_SQL},
o AS (SELECT conv_id, entity FROM cls WHERE entity IS NOT NULL),
tf AS (SELECT conv_id, entity, count(*)::BIGINT AS tf
       FROM o GROUP BY conv_id, entity),
df AS (SELECT entity, count(*)::BIGINT AS df FROM tf GROUP BY entity),
n AS (SELECT count(DISTINCT conv_id)::BIGINT AS n_convs FROM tf),
s AS (SELECT tf.conv_id, tf.entity, tf.tf, df.df,
             round_even(tf.tf::DOUBLE
                        * ln(n.n_convs::DOUBLE / df.df::DOUBLE), 6)
               AS salience
      FROM tf JOIN df ON tf.entity = df.entity CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY conv_id
                                   ORDER BY salience DESC, entity) AS rk
      FROM s)
SELECT conv_id, rk::INT AS rank, entity, tf, df, salience
FROM r WHERE rk <= 3 ORDER BY conv_id, rank
""")
def kg_entity_salience(spark, sf):
    """Top-3 anchor entities per conversation by TF-IDF salience
    (pipeline/salience.entity_salience) over the planted transcript:
    the Spark side folds the per-conversation top-k INTO the conv
    group-by as an in-array sort+slice (no window exchange); the
    oracle is the INDEPENDENT naive row_number window, so the fold's
    ordering and tie rule are value-hash-checked row for row."""
    from lamapi_spark.pipeline.coref import token_occurrences
    from lamapi_spark.pipeline.salience import entity_salience

    occ = (token_occurrences(_transcripts(spark, sf), _ENT_RE)
           .filter(F.col("entity").isNotNull()))
    return entity_salience(occ, top_k=3).orderBy("conv_id", "rank")


# ------------------------------------------ temporal KG (ts column)

_ASSERT_SQL = """
a AS (
  SELECT 'c' || o_custkey AS subj,
         'p' || (o_orderkey % 3) AS pred,
         's' || (1 + o_orderkey % 10) AS obj,
         (1700000000000000 + (o_orderkey % 1000) * 60000000)::BIGINT AS ts_us,
         o_orderkey AS turn_idx
  FROM orders)"""


def _assertions(spark, sf):
    """Deterministic timestamped assertion log from orders: subj =
    customer entity, pred cycles %3, obj cycles %10, ts_us repeats
    every 1000 orderkeys (so equal-ts collisions exercise the tie
    rule), tie = the unique orderkey."""
    o = load(spark, sf, "orders")
    return o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("subj"),
        F.concat(F.lit("p"), F.col("o_orderkey") % 3).alias("pred"),
        F.concat(F.lit("s"), F.lit(1) + F.col("o_orderkey") % 10).alias("obj"),
        (F.lit(1_700_000_000_000_000)
         + (F.col("o_orderkey") % 1000) * F.lit(60_000_000))
        .cast("long").alias("ts_us"),
        F.col("o_orderkey").alias("turn_idx"))


@register("kg_triple_validity", f"""
WITH {_ASSERT_SQL}
SELECT subj, pred, obj, ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY subj, pred
                         ORDER BY ts_us, turn_idx) AS valid_to_us
FROM a ORDER BY subj, pred, valid_from_us, obj
""")
def kg_triple_validity(spark, sf):
    """Temporal-KG validity intervals (pipeline/tkg.triple_validity):
    each (subj, pred) assertion is valid until the next assertion of
    the same key — ONE (subj, pred)-partitioned order-only lead window
    (streaming frame: hot keys cost sort, not state). The oracle
    replays the synth and the lead per key."""
    from lamapi_spark.pipeline.tkg import triple_validity

    return (triple_validity(_assertions(spark, sf))
            .orderBy("subj", "pred", "valid_from_us", "obj"))


@register("kg_snapshot_asof", f"""
WITH {_ASSERT_SQL},
r AS (
  SELECT subj, pred, obj, ts_us,
         row_number() OVER (PARTITION BY subj, pred
                            ORDER BY ts_us DESC, turn_idx DESC) AS rn
  FROM a WHERE ts_us <= 1700030000000000)
SELECT subj, pred, obj, ts_us AS asserted_us
FROM r WHERE rn = 1 ORDER BY subj, pred
""")
def kg_snapshot_asof(spark, sf):
    """Point-in-time KG snapshot (pipeline/tkg.kg_snapshot): the graph
    as of T = synth midpoint — latest assertion per (subj, pred) at or
    before T via ONE partial-aggregating struct-max group-by (no
    window; map-side combine collapses each partition first). The
    oracle is the INDEPENDENT row_number-window formulation."""
    from lamapi_spark.pipeline.tkg import kg_snapshot

    return (kg_snapshot(_assertions(spark, sf), at_ts_us=1_700_030_000_000_000)
            .orderBy("subj", "pred"))


@register("kg_snapshot_diff", f"""
WITH {_ASSERT_SQL},
s1 AS (SELECT subj, pred, obj FROM (
         SELECT subj, pred, obj,
                row_number() OVER (PARTITION BY subj, pred
                                   ORDER BY ts_us DESC, turn_idx DESC) AS rn
         FROM a WHERE ts_us <= 1700015000000000) WHERE rn = 1),
s2 AS (SELECT subj, pred, obj FROM (
         SELECT subj, pred, obj,
                row_number() OVER (PARTITION BY subj, pred
                                   ORDER BY ts_us DESC, turn_idx DESC) AS rn
         FROM a WHERE ts_us <= 1700045000000000) WHERE rn = 1)
SELECT coalesce(s1.subj, s2.subj) AS subj,
       coalesce(s1.pred, s2.pred) AS pred,
       s1.obj AS old_obj, s2.obj AS new_obj,
       CASE WHEN s1.obj IS NULL THEN 'added'
            WHEN s2.obj IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM s1 FULL OUTER JOIN s2 ON s1.subj = s2.subj AND s1.pred = s2.pred
WHERE s1.obj IS DISTINCT FROM s2.obj
ORDER BY subj, pred
""")
def kg_snapshot_diff(spark, sf):
    """CDC between the KG snapshots at two timestamps
    (pipeline/tkg.kg_diff over two kg_snapshot frames): facts added or
    changed between T1 and T2 — one co-partitioned full outer join +
    a null-safe inequality filter. The oracle rebuilds both snapshots
    with the independent window formulation and replays the diff with
    IS DISTINCT FROM."""
    from lamapi_spark.pipeline.tkg import kg_diff, kg_snapshot

    a = _assertions(spark, sf)
    old = kg_snapshot(a, at_ts_us=1_700_015_000_000_000)
    new = kg_snapshot(a, at_ts_us=1_700_045_000_000_000)
    return kg_diff(old, new).orderBy("subj", "pred")


@register("kg_entity_profile", f"""
WITH {_ASSERT_SQL},
pp AS (
  SELECT subj, pred, count(*)::BIGINT AS cnt,
         min(ts_us) AS lo, max(ts_us) AS hi
  FROM a GROUP BY subj, pred),
r AS (
  SELECT subj, pred,
         row_number() OVER (PARTITION BY subj
                            ORDER BY cnt DESC, pred) AS rk
  FROM pp)
SELECT pp.subj, sum(pp.cnt)::BIGINT AS n_assertions,
       count(*)::BIGINT AS n_preds,
       min(pp.lo) AS first_us, max(pp.hi) AS last_us,
       min(CASE WHEN r.rk = 1 THEN r.pred END) AS top_pred
FROM pp JOIN r ON pp.subj = r.subj AND pp.pred = r.pred
GROUP BY pp.subj ORDER BY pp.subj
""")
def kg_entity_profile(spark, sf):
    """Per-subject KB profile (pipeline/tkg.entity_profile) over the
    timestamped assertion log: assertion/predicate counts, first/last
    seen, and the most-asserted predicate (ties lex-smallest). The
    Spark side is two partial-aggregating group-bys with a
    min(struct(-cnt, pred)) argmax — no window; the oracle is the
    INDEPENDENT row_number-window formulation."""
    from lamapi_spark.pipeline.tkg import entity_profile

    return entity_profile(_assertions(spark, sf)).orderBy("subj")


@register("kg_el_dataset", f"""
WITH {_TR_SQL}, {_OCC_SQL},
m AS (SELECT conv_id, turn_idx, pos, entity
      FROM cls WHERE entity IS NOT NULL),
t AS (SELECT conv_id, turn_idx,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM tr)
SELECT m.conv_id, m.turn_idx, m.pos, m.entity,
       coalesce(array_to_string(
         t.toks[greatest(1, m.pos - 2) : m.pos - 1], ' '), '') AS left_ctx,
       coalesce(array_to_string(
         t.toks[m.pos + 1 : m.pos + 2], ' '), '') AS right_ctx
FROM m JOIN t ON m.conv_id = t.conv_id AND m.turn_idx = t.turn_idx
ORDER BY m.conv_id, m.turn_idx, m.pos
""")
def kg_el_dataset(spark, sf):
    """Entity-linking training-set export
    (pipeline/exports.mention_context_windows, window=2) over the
    planted transcript: every entity occurrence becomes a training
    example (surface entity, left/right token context) via one
    co-keyed join + in-row slices. The oracle replays the synth,
    the occurrence extraction, and both context slices."""
    from lamapi_spark.pipeline.coref import token_occurrences
    from lamapi_spark.pipeline.exports import mention_context_windows

    tr = _transcripts(spark, sf)
    occ = (token_occurrences(tr, _ENT_RE)
           .filter(F.col("entity").isNotNull()))
    return (mention_context_windows(tr, occ, window=2)
            .orderBy("conv_id", "turn_idx", "pos"))


# ------------------------------------------- dialogue segmentation

@register("kg_conv_segments", f"""
WITH {_TR_SQL},
t AS (
  SELECT conv_id, turn_idx,
         list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
  FROM tr),
lagged AS (
  SELECT conv_id, turn_idx, toks,
         lag(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM t),
sims AS (
  SELECT conv_id, turn_idx,
         CASE WHEN prev IS NULL THEN NULL
              ELSE len(list_intersect(toks, prev))::DOUBLE
                   / len(list_distinct(list_concat(toks, prev)))::DOUBLE
         END AS sim_prev
  FROM lagged),
seg AS (
  SELECT conv_id, turn_idx, sim_prev,
         sum(CASE WHEN sim_prev IS NULL OR sim_prev < 0.2
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS UNBOUNDED PRECEDING)::INT AS seg_id
  FROM sims)
SELECT conv_id, seg_id, min(turn_idx)::INT AS start_turn,
       max(turn_idx)::INT AS end_turn, count(*)::BIGINT AS n_turns
FROM seg GROUP BY conv_id, seg_id ORDER BY conv_id, seg_id
""")
def kg_conv_segments(spark, sf):
    """Dialogue segmentation (pipeline/segments.segment_turns +
    segment_summary) over the planted transcript: a segment boundary
    opens where adjacent-turn token-set Jaccard drops below 0.2 —
    per-conversation segment spans and sizes. The oracle replays the
    tokenization, the lag, the single-division similarity, and the
    running boundary sum."""
    from lamapi_spark.pipeline.segments import segment_summary, segment_turns

    return (segment_summary(segment_turns(_transcripts(spark, sf),
                                          threshold=0.2))
            .orderBy("conv_id", "seg_id"))


# ------------------------------------------ verb-pattern triples

# transcript variant with verbs BETWEEN entity tokens (the _TR_SQL
# templates never place a lexicon verb between two entities):
# m4=0/1 plant one pattern each, m4=3 plants a shared-verb double,
# m4=2 is the negative (verb after both entities).
_TRP_SQL = """
trp AS (
  SELECT 'c' || o_custkey AS conv_id,
         (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey))::INT
           AS turn_idx,
         CASE o_orderkey % 4
           WHEN 0 THEN 'c' || o_custkey || ' likes s' || (1 + o_orderkey % 10)
           WHEN 1 THEN 's' || (1 + o_orderkey % 10) || ' helped c'
                       || o_custkey || ' today'
           WHEN 2 THEN 'c' || o_custkey || ' and s' || (1 + o_orderkey % 10)
                       || ' met yesterday'
           ELSE 'c' || o_custkey || ' visited s' || (1 + o_orderkey % 10)
                || ' then s' || (1 + o_orderkey % 7)
         END AS text
  FROM orders)"""

_VERBS = ("likes", "helped", "met", "visited")


def _trp(spark, sf):
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    m4 = F.col("o_orderkey") % 4
    cust = F.col("o_custkey").cast("string")
    s10 = (F.lit(1) + F.col("o_orderkey") % 10).cast("string")
    s7 = (F.lit(1) + F.col("o_orderkey") % 7).cast("string")
    text = (
        F.when(m4 == 0, F.concat(F.lit("c"), cust, F.lit(" likes s"), s10))
        .when(m4 == 1, F.concat(F.lit("s"), s10, F.lit(" helped c"),
                                cust, F.lit(" today")))
        .when(m4 == 2, F.concat(F.lit("c"), cust, F.lit(" and s"), s10,
                                F.lit(" met yesterday")))
        .otherwise(F.concat(F.lit("c"), cust, F.lit(" visited s"), s10,
                            F.lit(" then s"), s7))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        F.concat(F.lit("c"), cust).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        text.alias("text"))


@register("kg_pattern_triples", f"""
WITH {_TRP_SQL},
tok AS (
  SELECT conv_id, turn_idx, (u.p)::INT AS pos, u.tok FROM (
    SELECT conv_id, turn_idx,
           unnest(list_transform(range(1, len(toks) + 1),
                  i -> struct_pack(p := i, tok := toks[i]))) AS u
    FROM (SELECT conv_id, turn_idx,
                 string_split_regex(trim(text), '\\s+') AS toks FROM trp))),
ent AS (SELECT DISTINCT conv_id, turn_idx, pos, tok AS e
        FROM tok WHERE regexp_matches(tok, '{_ENT_RE}')),
vrb AS (SELECT DISTINCT conv_id, turn_idx, pos AS vpos, lower(tok) AS pred
        FROM tok WHERE lower(tok) IN {str(_VERBS)})
SELECT DISTINCT a.conv_id, a.turn_idx, a.e AS subj, v.pred, b.e AS obj
FROM ent a
JOIN ent b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
          AND b.pos > a.pos AND a.e <> b.e
JOIN vrb v ON v.conv_id = a.conv_id AND v.turn_idx = a.turn_idx
          AND v.vpos > a.pos AND v.vpos < b.pos
ORDER BY a.conv_id, a.turn_idx, subj, pred, obj
""")
def kg_pattern_triples(spark, sf):
    """Within-turn verb-pattern triple mining
    (pipeline/triples.verb_pattern_triples): (subj, verb, obj) wherever
    a lexicon verb sits strictly between two entity tokens of one turn
    — the north star's dependency-light pattern miner, with the
    verb-after-both template as the planted negative and the
    shared-verb double template exercising multi-emission. The Spark
    side runs the ZERO-SHUFFLE in-row formulation (the pattern lives
    inside one turn's token array; only the set-semantics distinct
    exchanges); the oracle IS the independent join formulation, so
    the in-row nesting is value-hash-checked triple for triple. The
    exploded-input join variant (verb_pattern_triples) is
    equivalence-tested in pytest."""
    from lamapi_spark.pipeline.triples import verb_pattern_triples_inrow

    return (verb_pattern_triples_inrow(_trp(spark, sf), _VERBS, _ENT_RE)
            .orderBy("conv_id", "turn_idx", "subj", "pred", "obj"))


# --------------------------------------------------- SFT pair export

@register("kg_sft_pairs", f"""
WITH {_TRT_SQL},
c AS (
  SELECT conv_id, turn_idx, role, text,
         last_value(CASE WHEN role = 'user' THEN
                      struct_pack(t := turn_idx, x := text) END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS u
  FROM trt)
SELECT conv_id, (u.t)::INT AS prompt_turn, turn_idx AS response_turn,
       u.x AS prompt, text AS response
FROM c WHERE role = 'assistant' AND u IS NOT NULL
ORDER BY conv_id, response_turn
""")
def kg_sft_pairs(spark, sf):
    """SFT (prompt, response) pair export (pipeline/exports.sft_pairs)
    over the role/tool transcript synth: every assistant turn pairs
    with its most recent preceding user turn (tool turns skipped) via
    ONE last-non-null carry window. The oracle replays the synth and
    the carry."""
    from lamapi_spark.pipeline.exports import sft_pairs
    from lamapi_spark.queries_kg import _trt

    return (sft_pairs(_trt(spark, sf))
            .orderBy("conv_id", "response_turn"))


# ------------------------------------------------- property paths

@register("kg_path_query", """
WITH RECURSIVE
t AS (
  SELECT 'c' || a.c_custkey AS subj, 'next' AS pred,
         'c' || b.c_custkey AS obj
  FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 13
  UNION ALL
  SELECT 'c' || c_custkey, 'name', c_name FROM customer),
e AS (SELECT subj AS a, obj AS b FROM t WHERE pred = 'next'),
walk(a, b, d) AS (
  SELECT a, b, 1 FROM e
  UNION
  SELECT w.a, e.b, w.d + 1 FROM walk w JOIN e ON e.a = w.b WHERE w.d < 3
),
clo AS (SELECT DISTINCT a, b FROM walk),
nm AS (SELECT subj AS b, obj AS n FROM t WHERE pred = 'name')
SELECT DISTINCT clo.a AS src, nm.n AS dst
FROM clo JOIN nm USING (b)
ORDER BY src, dst
""")
def kg_path_query(spark, sf):
    """SPARQL property-path query (ops/graph.path_pairs): the path
    ``next+ / name`` — customers reachable in 1..3 'next' hops, then
    their name attribute — over a deterministic customer-chain triple
    store (ck -next-> c(k+13)). The Spark side runs the
    level-synchronous bounded closure (new-pairs-only frontier) + one
    attribute hop; the oracle is the INDEPENDENT recursive walk with
    a depth counter, so first-discovery == reachable-set is
    value-hash-checked pair for pair."""
    from lamapi_spark.ops.graph import path_pairs

    c = load(spark, sf, "customer")
    a = c.select(F.col("c_custkey").alias("k1"),
                 F.concat(F.lit("c"), F.col("c_custkey")).alias("subj"))
    b = c.select(F.col("c_custkey").alias("k2"),
                 F.concat(F.lit("c"), F.col("c_custkey")).alias("obj"))
    nxt = (a.join(b, F.col("k2") == F.col("k1") + 13)
           .select("subj", F.lit("next").alias("pred"), "obj"))
    names = c.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("subj"),
        F.lit("name").alias("pred"), F.col("c_name").alias("obj"))
    triples = nxt.unionByName(names)
    return (path_pairs(triples, [("next", True), ("name", False)],
                       max_depth=3)
            .orderBy("src", "dst"))


# --------------------------------------------------- BFS distances

@register("graph_bfs_dist", """
WITH RECURSIVE
base AS (
  SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT src, dst FROM base
  UNION ALL
  SELECT dst AS src, src AS dst FROM base
),
seeds AS (SELECT DISTINCT 'c' || o_custkey AS node FROM orders
          WHERE o_custkey <= 20),
walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < 3
)
SELECT node, min(dist)::INT AS dist FROM walk GROUP BY node ORDER BY node
""")
def graph_bfs_dist(spark, sf):
    """Multi-source BFS distances (ops/graph.bfs_distances, depth 3)
    from the khop seed set over the symmetric customer-supplier graph:
    (node, min-hops). The Spark side is the level-synchronous
    frontier/settled-set loop; the oracle is the INDEPENDENT recursive
    walk + min(dist) aggregation, so first-discovery-level ==
    min-over-paths is value-hash-checked node for node."""
    from lamapi_spark.ops.graph import bfs_distances
    from lamapi_spark.queries_graph import _edges

    seeds = (load(spark, sf, "orders").filter(F.col("o_custkey") <= 20)
             .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("seed"))
             .distinct())
    return (bfs_distances(_edges(spark, sf), seeds, max_depth=3)
            .orderBy("node"))


# ------------------------------------- conversation-level near-dup

@register("conv_neardup_pairs", f"""
WITH h AS (SELECT doc_id, {_SIMHASH_SQL_HASHES} AS h FROM documents),
sig AS (SELECT doc_id, ({_SIMHASH_SQL})::BIGINT AS sim FROM h)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sim, b.sim))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3
ORDER BY id_a, id_b
""")
def conv_neardup_pairs_q(spark, sf):
    """Conversation-granularity near-dedup
    (pipeline/convdedup.conv_neardup_pairs): documents chunk into
    5-token turns (conv_id = doc_id), the operator reassembles each
    dialog's canonical text in-array and runs the banded SimHash
    pairing. The oracle brute-force-pairs the ORIGINAL document text —
    equality proves the turn-split/reassembly round-trip is byte-exact
    AND the banding lossless at dialog granularity. max_bucket lifted
    above any sf's template-group size (dedup_simhash_pairs guard)."""
    from lamapi_spark.pipeline.convdedup import conv_neardup_pairs

    d = load(spark, sf, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(toks) / F.lit(5)).cast("int")
    turns = (
        d.select(
            F.col("doc_id").alias("conv_id"),
            F.posexplode(F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * F.lit(5) + 1, F.lit(5)), " "),
            )).alias("pos", "text"))
        .select("conv_id", (F.col("pos") + 1).cast("int").alias("turn_idx"),
                "text")
    )
    return (conv_neardup_pairs(turns, max_hamming=3, n_bands=4,
                               max_bucket=1_000_000)
            .withColumn("hamming", F.col("hamming").cast("int"))
            .orderBy("id_a", "id_b"))


# ------------------------------------------- conversation prefix sharing

# Planted prefix-sharing transcript: conv = order, turns = lineitems in
# line order. Turns 1-2 depend only on the customer's template class
# (o_custkey % 7) -> shared across every conversation of that class;
# turn 3 is template-only for every 5th order (a deeper-sharing cohort);
# all other turns embed the orderkey -> unique tails. Both engines
# derive the identical transcript, so the oracle replays the synth AND
# the whole prefix-census dataflow.
_PFX_SQL = """
ptr AS (
  SELECT 'o' || o.o_orderkey AS conv_id, l.l_linenumber::INT AS turn_idx,
         CASE WHEN l.l_linenumber <= 2
                THEN 'greet t' || (o.o_custkey % 7) || ' step ' || l.l_linenumber
              WHEN l.l_linenumber = 3 AND o.o_orderkey % 5 = 0
                THEN 'policy t' || (o.o_custkey % 7)
              ELSE 'detail o' || o.o_orderkey || ' l ' || l.l_linenumber
         END AS text
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)"""


def _pfx_transcripts(spark, sf):
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    d = F.col("l_linenumber")
    tpl = (F.col("o_custkey") % 7).cast("string")
    okey = F.col("o_orderkey").cast("string")
    text = (
        F.when(d <= 2, F.concat(F.lit("greet t"), tpl, F.lit(" step "),
                                d.cast("string")))
        .when((d == 3) & (F.col("o_orderkey") % 5 == 0),
              F.concat(F.lit("policy t"), tpl))
        .otherwise(F.concat(F.lit("detail o"), okey, F.lit(" l "),
                            d.cast("string")))
    )
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .select(F.concat(F.lit("o"), okey).alias("conv_id"),
                    d.cast("int").alias("turn_idx"), text.alias("text")))


@register("conv_prefix_sharing", f"""
WITH {_PFX_SQL},
arr AS (
  SELECT conv_id, list(text ORDER BY turn_idx) AS texts,
         len(list(text ORDER BY turn_idx))::BIGINT AS n_turns
  FROM ptr GROUP BY conv_id),
ph AS (
  SELECT conv_id, d,
         md5(array_to_string(texts[1:d], chr(31))) AS phash
  FROM (SELECT conv_id, texts,
               unnest(range(1, least(n_turns, 16) + 1))::INT AS d
        FROM arr)),
counts AS (SELECT d, phash, count(*)::BIGINT AS grp
           FROM ph GROUP BY d, phash),
shared AS (
  SELECT conv_id, max(d)::BIGINT AS shared_depth,
         arg_max(grp, d)::BIGINT AS group_size
  FROM ph JOIN counts USING (d, phash) WHERE grp >= 2 GROUP BY conv_id)
SELECT a.conv_id, a.n_turns,
       coalesce(s.shared_depth, 0)::BIGINT AS shared_depth,
       coalesce(s.group_size, 1)::BIGINT AS group_size,
       round_even(coalesce(s.shared_depth, 0)::DOUBLE / a.n_turns, 6)
         AS reuse_frac
FROM arr a LEFT JOIN shared s USING (conv_id)
ORDER BY conv_id
""")
def conv_prefix_sharing(spark, sf):
    """KV-cache-reuse census (pipeline/prefixes.prefix_sharing) over
    the planted prefix-sharing transcript: per conversation, the
    deepest turn prefix shared verbatim with another conversation,
    the sharing-group size at that depth, and the reusable-turn
    fraction. Linear in the corpus (prefix fingerprints count into
    (depth, md5) cells — no pairwise join, hot templates cost the
    same as cold ones); the oracle replays the synth, the rolling
    fingerprints, the census, and the per-conversation argmax."""
    from lamapi_spark.pipeline.prefixes import prefix_sharing

    return (prefix_sharing(_pfx_transcripts(spark, sf), max_depth=16)
            .orderBy("conv_id"))


# ----------------------------------------------------- SFT refusal gate

# Planted refusal transcript: conv = customer, one turn per order; even
# orderkeys are user questions, odd ones assistant answers, and
# assistant turns with orderkey % 6 in (1, 3) are planted refusals
# (two different lexicon entries). Conversations pass the gate iff
# every assistant turn stayed clean.
_RTR_SQL = """
rtr AS (
  SELECT 'c' || o_custkey AS conv_id,
         CASE WHEN o_orderkey % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN o_orderkey % 2 = 0 THEN 'question ' || o_orderkey
              WHEN o_orderkey % 6 = 1 THEN 'i cannot help with that request'
              WHEN o_orderkey % 6 = 3 THEN 'sorry but as an ai i must decline'
              ELSE 'sure: answer ' || o_orderkey END AS text
  FROM orders)"""


def _rtr(spark, sf):
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    even = F.col("o_orderkey") % 2 == 0
    m6 = F.col("o_orderkey") % 6
    okey = F.col("o_orderkey").cast("string")
    return o.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
        .alias("conv_id"),
        F.when(even, F.lit("user")).otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(even, F.concat(F.lit("question "), okey))
        .when(m6 == 1, F.lit("i cannot help with that request"))
        .when(m6 == 3, F.lit("sorry but as an ai i must decline"))
        .otherwise(F.concat(F.lit("sure: answer "), okey)).alias("text"),
    )


@register("sft_refusal_gate", f"""
WITH {_RTR_SQL},
t AS (
  SELECT conv_id,
         CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS a,
         CASE WHEN role = 'assistant'
                   AND regexp_matches(lower(text), '(i cannot|i can.t|as an ai|i.m sorry|i am sorry|i apologize|cannot assist|unable to help)')
              THEN 1 ELSE 0 END AS r
  FROM rtr),
agg AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns, sum(a)::BIGINT AS n_assistant,
         sum(r)::BIGINT AS n_refusals
  FROM t GROUP BY conv_id)
SELECT conv_id, n_turns, n_assistant, n_refusals,
       round_even(n_refusals::DOUBLE / greatest(n_assistant, 1), 6)
         AS refusal_rate,
       (n_refusals = 0) AS keep
FROM agg ORDER BY conv_id
""")
def sft_refusal_gate(spark, sf):
    """Per-conversation refusal/boilerplate SFT ingest gate
    (pipeline/exports.refusal_gate) over the planted refusal
    transcript: lexicon-flag assistant turns, aggregate per
    conversation, keep refusal-free exchanges. One JVM regex column +
    one aggregation (the transcript twin of the Gopher document gate);
    the oracle replays the synth, the lexicon match, and every
    keep/drop verdict."""
    from lamapi_spark.pipeline.exports import refusal_gate

    return refusal_gate(_rtr(spark, sf)).orderBy("conv_id")


# ------------------------------------------------- alias mining

# the planted link log: one linked span per order, branch by
# o_orderkey % 12 — slot 0 re-uses the EXACT dictionary surface (the
# dictionary-known exclusion must drop it), slots 1-8 are the recurring
# misspelling linked to the right entity, slot 9 links the same
# misspelling to the NEIGHBOR entity (impurity), slot 10 fails to link
# (NIL impurity), slot 11 is a rarer second variant that only clears
# min_support for high-order-count customers — so support/purity gates
# both fire on real boundaries at every sf.
_ALK_SQL = """
lk AS (
  SELECT CASE WHEN o_orderkey % 12 = 0 THEN 'customer ' || o_custkey
              WHEN o_orderkey % 12 = 11 THEN 'kustomer ' || o_custkey
              ELSE 'custmer ' || o_custkey END AS surface,
         CASE WHEN o_orderkey % 12 = 10 THEN 'NIL-' || o_custkey
              WHEN o_orderkey % 12 = 9 THEN 'C' || (o_custkey + 1)
              ELSE 'C' || o_custkey END AS entity,
         (o_orderkey % 12 = 10) AS nil
  FROM orders),
dict AS (
  SELECT 'C' || c_custkey AS entity,
         'customer ' || c_custkey AS name_norm,
         ((c_custkey % 100) / 100.0) AS popularity
  FROM customer)"""


@register("kg_alias_mining", f"""
WITH {_ALK_SQL},
occ AS (SELECT surface, entity, nil, count(*)::BIGINT AS support
        FROM lk GROUP BY 1, 2, 3),
tot AS (SELECT surface, sum(support)::BIGINT AS total FROM occ GROUP BY 1),
best AS (
  SELECT surface, entity, support FROM (
    SELECT surface, entity, support,
           row_number() OVER (PARTITION BY surface
                              ORDER BY support DESC, entity ASC) AS rn
    FROM occ WHERE NOT nil) WHERE rn = 1),
mined AS (
  SELECT b.surface, b.entity, b.support,
         (b.support * 10000 // t.total)::BIGINT AS purity_bp
  FROM best b JOIN tot t USING (surface)
  WHERE b.support >= 2 AND b.support * 10000 >= 7000 * t.total),
filt AS (
  SELECT m.* FROM mined m
  LEFT JOIN dict d ON m.surface = d.name_norm
  WHERE d.name_norm IS NULL)
SELECT f.entity, f.surface AS name, f.surface AS name_norm,
       TRUE AS is_alias, 'entity' AS kind, 'PERS' AS NERtype,
       f.support, f.purity_bp, d.popularity
FROM filt f JOIN dict d ON f.entity = d.entity
ORDER BY name
""")
def kg_alias_mining(spark, sf):
    """Dictionary-growth mining (pipeline/aliases.mine_aliases) over a
    planted link log: recurring unknown surfaces earn alias rows for
    their dominant entity; support, exact-product purity, and the
    dictionary-known exclusion all gate on planted boundaries. The
    oracle replays the synth, both aggregations, the deterministic
    argmax, every gate, and the payload join."""
    from lamapi_spark.pipeline.aliases import mine_aliases

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    m12 = F.col("o_orderkey") % 12
    cust = F.col("o_custkey").cast("string")
    linked = o.select(
        F.when(m12 == 0, F.concat(F.lit("customer "), cust))
        .when(m12 == 11, F.concat(F.lit("kustomer "), cust))
        .otherwise(F.concat(F.lit("custmer "), cust)).alias("surface"),
        F.when(m12 == 10, F.concat(F.lit("NIL-"), cust))
        .when(m12 == 9, F.concat(F.lit("C"),
                                 (F.col("o_custkey") + 1).cast("string")))
        .otherwise(F.concat(F.lit("C"), cust)).alias("entity"),
        (m12 == 10).alias("nil"))
    c = load(spark, sf, "customer").select("c_custkey")
    ck = F.col("c_custkey").cast("string")
    label_dict = c.select(
        F.concat(F.lit("C"), ck).alias("entity"),
        F.concat(F.lit("customer "), ck).alias("name"),
        F.concat(F.lit("customer "), ck).alias("name_norm"),
        F.lit(False).alias("is_alias"),
        F.lit("d").alias("description"),
        F.lit("entity").alias("kind"),
        F.lit("PERS").alias("NERtype"),
        F.array(F.lit("T1")).alias("types"),
        ((F.col("c_custkey") % 100) / F.lit(100.0)).alias("popularity"))
    return (
        mine_aliases(linked, label_dict, min_support=2, min_purity_bp=7000)
        .select("entity", "name", "name_norm", "is_alias", "kind",
                "NERtype", "support", "purity_bp", "popularity")
        .orderBy("name"))


# ------------------------------------------------- fact support

@register("kg_fact_support", """
WITH a AS (
  SELECT 'v' || (o_orderkey % 8) AS conv_id,
         o_orderkey AS turn_idx,
         'e' || (o_custkey % 40) AS subj,
         'p' || (o_orderkey % 3) AS pred,
         's' || (1 + o_orderkey % 7) AS obj
  FROM orders),
g AS (
  SELECT subj, pred, obj, count(*)::BIGINT AS support,
         count(DISTINCT conv_id)::BIGINT AS n_convs,
         min(struct_pack(c := conv_id, t := turn_idx)) AS _f,
         max(struct_pack(c := conv_id, t := turn_idx)) AS _l
  FROM a GROUP BY 1, 2, 3)
SELECT subj, pred, obj, support, n_convs,
       _f.c AS first_conv, _f.t AS first_turn,
       _l.c AS last_conv, _l.t AS last_turn
FROM g ORDER BY subj, pred, obj
""")
def kg_fact_support(spark, sf):
    """Evidence aggregation (pipeline/triples.fact_support): one row
    per extracted fact with assertion count, distinct-conversation
    support (the independence signal distant-supervision denoising
    keys on), and min/max (conv_id, turn_idx) evidence pointers — ONE
    partial-aggregating hash agg keyed by the fact triple. The synth
    plants 840 facts whose assertions recur WITHIN conversations (8
    convs, coprime with the fact moduli) so every row exercises
    n_convs < support; the oracle replays the synth and reproduces
    the struct min/max lexicographic evidence-pointer rule."""
    from lamapi_spark.pipeline.triples import fact_support

    o = load(spark, sf, "orders")
    ev = o.select(
        F.concat(F.lit("v"), F.col("o_orderkey") % 8).alias("conv_id"),
        F.col("o_orderkey").alias("turn_idx"),
        F.concat(F.lit("e"), F.col("o_custkey") % 40).alias("subj"),
        F.concat(F.lit("p"), F.col("o_orderkey") % 3).alias("pred"),
        F.concat(F.lit("s"), F.lit(1) + F.col("o_orderkey") % 7).alias("obj"))
    return fact_support(ev).orderBy("subj", "pred", "obj")


# ------------------------------------------------- link calibration

@register("link_calibration", """
WITH s AS (
  SELECT (o_orderkey % 1000) / CAST(1000 AS DOUBLE) AS score,
         CASE WHEN ((o_orderkey * 7919 + o_custkey) % 1000)
                   < (o_orderkey % 1000) THEN 1 ELSE 0 END AS label
  FROM orders),
b AS (
  SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, score, label
  FROM s),
g AS (
  SELECT bin, count(*)::BIGINT AS n, avg(score) AS _conf,
         avg(CAST(label AS DOUBLE)) AS _acc
  FROM b GROUP BY bin),
t AS (SELECT sum(n)::BIGINT AS _N FROM g)
SELECT bin, n,
       round_even(_conf, 6) AS conf,
       round_even(_acc, 6) AS acc,
       round_even(abs(_acc - _conf), 6) AS gap,
       round_even(n / CAST(_N AS DOUBLE), 6) AS weight,
       round_even((n / CAST(_N AS DOUBLE)) * abs(_acc - _conf), 6)
         AS ece_contrib
FROM g CROSS JOIN t ORDER BY bin
""")
def link_calibration(spark, sf):
    """Link-score calibration audit (ops/metrics.calibration_bins):
    the reliability table whose ece_contrib column sums to ECE. The
    synth plants a near-calibrated scorer — score = k/1000, label =
    (deterministic LCG residue < k) — so P(label) tracks score with
    planted integer noise both engines reproduce bit-identically; the
    oracle replays the binning fold (top-edge clamp included), both
    per-bin means, and the broadcast-total weighting."""
    from lamapi_spark.ops.metrics import calibration_bins

    o = load(spark, sf, "orders")
    scored = o.select(
        ((F.col("o_orderkey") % 1000) / F.lit(1000.0)).alias("score"),
        ((F.col("o_orderkey") * 7919 + F.col("o_custkey")) % 1000
         < F.col("o_orderkey") % 1000).cast("int").alias("label"))
    return calibration_bins(scored, n_bins=10).orderBy("bin")


# ------------------------------------------------- blocking quality

@register("linkage_blocking_quality", """
WITH l AS (SELECT 'L' || c_custkey AS id_l, 'b' || (c_custkey % 97) AS blk
           FROM customer),
r AS (SELECT 'R' || c_custkey AS id_r,
             CASE WHEN c_custkey % 53 = 0 THEN NULL
                  ELSE 'b' || ((c_custkey
                       + CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)
                       % 97) END AS blk
      FROM customer),
lb AS (SELECT blk, count(*)::BIGINT AS nl FROM l
       WHERE blk IS NOT NULL GROUP BY blk),
rb AS (SELECT blk, count(*)::BIGINT AS nr FROM r
       WHERE blk IS NOT NULL GROUP BY blk),
c AS (SELECT coalesce(sum(nl * nr), 0)::BIGINT AS cand_pairs,
             count(*)::BIGINT AS n_blocks FROM lb JOIN rb USING (blk)),
n AS (SELECT (SELECT count(*) FROM l)::BIGINT AS n_left,
             (SELECT count(*) FROM r)::BIGINT AS n_right),
g AS (SELECT 'L' || c_custkey AS id_l, 'R' || c_custkey AS id_r
      FROM customer),
gc AS (SELECT count(*)::BIGINT AS n_gold,
              coalesce(sum(CASE WHEN lk.blk IS NOT NULL
                                 AND rk.blk IS NOT NULL
                                 AND lk.blk = rk.blk
                            THEN 1 ELSE 0 END), 0)::BIGINT AS gold_covered
       FROM g LEFT JOIN l lk USING (id_l) LEFT JOIN r rk USING (id_r))
SELECT n.n_left, n.n_right, c.n_blocks, c.cand_pairs,
       (n.n_left * n.n_right)::BIGINT AS total_pairs,
       gc.n_gold, gc.gold_covered,
       round_even(1.0 - cand_pairs / CAST(n_left * n_right AS DOUBLE), 6)
         AS reduction_ratio,
       round_even(gold_covered / CAST(n_gold AS DOUBLE), 6)
         AS pairs_completeness,
       round_even(gold_covered / CAST(cand_pairs AS DOUBLE), 6)
         AS pair_quality
FROM n CROSS JOIN c CROSS JOIN gc
""")
def linkage_blocking_quality(spark, sf):
    """Blocking-scheme audit (ops/linkage.blocking_quality) over a
    planted two-source synth: right-side blocks shift for custkey%10=0
    (gold pairs MISSED by blocking) and null out for custkey%53=0 (the
    null-block guard), so pairs_completeness lands strictly below 1
    at a value both engines derive; cand_pairs comes from per-block
    count products — the audit never materializes a candidate pair.
    The oracle replays the synth, both count aggs, the inner block
    join, and every guarded ratio."""
    from lamapi_spark.ops.linkage import blocking_quality

    ck = F.col("c_custkey")
    c = load(spark, sf, "customer").select("c_custkey")
    left = c.select(F.concat(F.lit("L"), ck).alias("rid"),
                    F.concat(F.lit("b"), ck % 97).alias("blk"))
    shift = F.when(ck % 10 == 0, F.lit(1)).otherwise(F.lit(0))
    right = c.select(
        F.concat(F.lit("R"), ck).alias("rid"),
        F.when(ck % 53 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("b"), (ck + shift) % 97)).alias("blk"))
    gold = c.select(F.concat(F.lit("L"), ck).alias("id_l"),
                    F.concat(F.lit("R"), ck).alias("id_r"))
    return blocking_quality(left, right, ("rid", "rid"), "blk", gold)


# ------------------------------------------------- Spearman rho

@register("eval_spearman", """
WITH s AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 1000) AS x,
         (o_orderkey % 1000) + ((o_orderkey * 31 + o_custkey) % 200) - 100
           AS y
  FROM orders),
rx AS (SELECT k, row_number() OVER (ORDER BY x, k) AS r FROM s),
ry AS (SELECT k, row_number() OVER (ORDER BY y, k) AS r FROM s),
d AS (SELECT (rx.r - ry.r)::DECIMAL(19,0) AS d FROM rx JOIN ry USING (k)),
a AS (SELECT count(*)::BIGINT AS n,
             coalesce(sum(d * d), 0::DECIMAL(38,0)) AS s FROM d)
SELECT n, CAST(s AS DOUBLE) AS sum_d2,
       round_even(CASE WHEN n >= 2 THEN 1.0 - 6.0 * CAST(s AS DOUBLE)
                       / (CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))
                  ELSE 0.0 END, 6) AS rho
FROM a
""")
def eval_spearman(spark, sf):
    """Scorer-agreement audit (ops/metrics.spearman_rho) on a planted
    pair of correlated scores: x repeats every 1000 orderkeys (heavy
    ties exercising the deterministic key tie-break), y = x plus a
    +/-100 LCG perturbation. The Spark side ranks via the two-level
    scan (bucket counts + prefix sum + within-bucket window — NO
    global window); the oracle is the INDEPENDENT naive formulation,
    one global row_number per side — green proves the scan's ranks
    are exactly the global sort ranks."""
    from lamapi_spark.ops.metrics import spearman_rho

    o = load(spark, sf, "orders")
    s = o.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 1000).alias("x"),
        ((F.col("o_orderkey") % 1000)
         + (F.col("o_orderkey") * 31 + F.col("o_custkey")) % 200
         - 100).alias("y"))
    return spearman_rho(s, "k", "x", "y", n_buckets=64)


# ------------------------------------------------- weak-label model

@register("weak_label_model", """
WITH v AS (
  SELECT o_orderkey AS item_id, 'lf' || j AS lf_id,
         CASE WHEN ((o_orderkey * (j + 7) + j) % 10) < 9 - j
              THEN 'L' || (o_orderkey % 3)
              ELSE 'L' || ((o_orderkey + 1) % 3) END AS vote
  FROM orders CROSS JOIN range(0, 5) t(j)
  WHERE (o_orderkey + j) % 2 = 0),
g AS (
  SELECT o_orderkey AS item_id, 'L' || (o_orderkey % 3) AS label
  FROM orders WHERE o_orderkey % 10 = 0),
acc AS (
  SELECT lf_id,
         (sum(CASE WHEN vote = label THEN 1 ELSE 0 END) * 10000
          // count(*))::BIGINT AS w
  FROM v JOIN g USING (item_id) GROUP BY lf_id),
wv AS (
  SELECT v.item_id, v.vote, coalesce(acc.w, 5000) AS w
  FROM v LEFT JOIN acc USING (lf_id)),
pl AS (
  SELECT item_id, vote, sum(w)::BIGINT AS lw, count(*)::BIGINT AS ln
  FROM wv GROUP BY item_id, vote),
win AS (
  SELECT item_id, vote AS label, lw AS weight_bp, ln AS n_votes
  FROM (SELECT *, row_number() OVER (PARTITION BY item_id
                                     ORDER BY lw DESC, vote ASC) AS rn
        FROM pl) WHERE rn = 1),
tot AS (
  SELECT item_id, sum(lw)::BIGINT AS total_bp, sum(ln)::BIGINT AS n_lfs
  FROM pl GROUP BY item_id)
SELECT w.item_id, w.label, w.weight_bp, w.n_votes, t.n_lfs, t.total_bp,
       (w.weight_bp * 10000 // t.total_bp)::BIGINT AS confidence_bp
FROM win w JOIN tot t USING (item_id)
ORDER BY w.item_id
""")
def weak_label_model(spark, sf):
    """Weak-supervision label aggregation (ops/classifier.
    label_model_vote) over five planted labeling functions of graded
    accuracy (90% down to 50%, alternating 50% coverage) with a 10%
    gold slice: per-LF weights are exact integer basis points learned
    from the gold overlap, the winner is the weighted struct-min
    argmax. The oracle replays the synth, the accuracy join, both
    aggregations, and the independent window formulation of the
    argmax — green pins the tie rule and every integer division."""
    from lamapi_spark.ops.classifier import label_model_vote

    o = load(spark, sf, "orders").select("o_orderkey")
    ok = F.col("o_orderkey")
    j = F.col("j")
    votes = (o.select(ok, F.explode(F.sequence(F.lit(0),
                                               F.lit(4))).alias("j"))
             .filter((ok + j) % 2 == 0)
             .select(
                 ok.alias("item_id"),
                 F.concat(F.lit("lf"), j).alias("lf_id"),
                 F.when((ok * (j + 7) + j) % 10 < 9 - j,
                        F.concat(F.lit("L"), ok % 3))
                 .otherwise(F.concat(F.lit("L"),
                                     (ok + 1) % 3)).alias("vote")))
    gold = (o.filter(ok % 10 == 0)
            .select(ok.alias("item_id"),
                    F.concat(F.lit("L"), ok % 3).alias("label")))
    return (label_model_vote(votes, gold, default_bp=5000)
            .orderBy("item_id"))


# ------------------------------------------------- predicate functionality

@register("kg_pred_functionality", f"""
WITH {_ASSERT_SQL},
t AS (SELECT DISTINCT subj, pred, obj FROM a),
g AS (SELECT pred, count(*)::BIGINT AS n_facts,
             count(DISTINCT subj)::BIGINT AS n_subj,
             count(DISTINCT obj)::BIGINT AS n_obj
      FROM t GROUP BY pred)
SELECT pred, n_facts, n_subj, n_obj,
       round_even(n_subj / CAST(n_facts AS DOUBLE), 6) AS functionality,
       round_even(n_obj / CAST(n_facts AS DOUBLE), 6) AS inv_functionality
FROM g ORDER BY pred
""")
def kg_pred_functionality(spark, sf):
    """PARIS functionality / inverse functionality
    (ops/graph.predicate_functionality) over the timestamped assertion
    synth — predicates repeat facts across orderkeys, so the leading
    DISTINCT is load-bearing; the oracle replays the distinct, both
    partial-distinct counts, and the ratios."""
    from lamapi_spark.ops.graph import predicate_functionality

    return (predicate_functionality(_assertions(spark, sf))
            .orderBy("pred"))


# ------------------------------------------------- role audit

@register("conv_role_audit", """
WITH tr AS (
  SELECT 'c' || o_custkey AS conv_id,
         (row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderkey))::INT AS turn_idx,
         o_orderkey AS ok FROM orders),
r AS (
  SELECT conv_id, turn_idx,
         CASE WHEN ok % 7 = 3 THEN 'assistant'
              WHEN ok % 7 = 5 THEN 'tool'
              WHEN turn_idx % 2 = 1 THEN 'user'
              ELSE 'assistant' END AS role
  FROM tr),
adj AS (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM r),
g AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns,
         sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
         sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
           AS n_assistant,
         sum(CASE WHEN role = prev THEN 1 ELSE 0 END)::BIGINT
           AS n_same_role_adj,
         arg_min(role, turn_idx) = 'user' AS starts_user,
         arg_max(role, turn_idx) = 'assistant' AS ends_assistant
  FROM adj GROUP BY conv_id)
SELECT conv_id, n_turns, n_user, n_assistant,
       (n_turns - n_user - n_assistant)::BIGINT AS n_other,
       n_same_role_adj, starts_user, ends_assistant,
       (starts_user AND ends_assistant AND n_same_role_adj = 0
        AND n_assistant > 0) AS ok
FROM g ORDER BY conv_id
""")
def conv_role_audit_q(spark, sf):
    """Dialogue-structure QC (pipeline/exports.conv_role_audit) over a
    planted role sequence: base user/assistant alternation with
    orderkey%7 slots forcing double-assistant adjacencies and tool
    turns. The Spark side recounts adjacencies with the in-array fold;
    the oracle is the INDEPENDENT lag-window formulation plus
    arg_min/arg_max boundary reads — green pins the fold against the
    classic window shape."""
    from lamapi_spark.pipeline.exports import conv_role_audit

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    ok = F.col("o_orderkey")
    tr = o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        ok.alias("ok"))
    tr = tr.withColumn(
        "role",
        F.when(F.col("ok") % 7 == 3, F.lit("assistant"))
        .when(F.col("ok") % 7 == 5, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))).drop("ok")
    return conv_role_audit(tr).orderBy("conv_id")


# ------------------------------------------------- horn-rule mining

_RULE_FACTS_SQL = """
rf AS (
  SELECT DISTINCT subj, pred, obj FROM (
    SELECT 'e' || (o_custkey % 30) AS subj, 'p0' AS pred,
           'f' || (o_orderkey % 40) AS obj FROM orders
    UNION ALL
    SELECT 'f' || (o_orderkey % 40), 'p1',
           'g' || ((o_custkey + o_orderkey) % 20) FROM orders
    UNION ALL
    SELECT 'e' || (o_custkey % 30), 'p3',
           'g' || ((o_custkey + o_orderkey) % 20) FROM orders
    WHERE o_orderkey % 10 < 7
    UNION ALL
    SELECT 'e' || (o_custkey % 30), 'p2',
           'g' || ((o_custkey + o_orderkey) % 20) FROM orders
    WHERE o_orderkey % 3 = 0))"""


@register("kg_rule_mining", f"""
WITH {_RULE_FACTS_SQL},
b1 AS (SELECT pred AS p, count(*)::BIGINT AS body_n FROM rf GROUP BY pred),
s1 AS (SELECT b.pred AS p, h.pred AS r, count(*)::BIGINT AS support
       FROM rf b JOIN rf h
         ON b.subj = h.subj AND b.obj = h.obj AND b.pred <> h.pred
       GROUP BY 1, 2),
r1 AS (SELECT 'p(x,y) => r(x,y)' AS rule, s1.p, NULL::VARCHAR AS q,
              s1.r, s1.support, b1.body_n
       FROM s1 JOIN b1 USING (p)),
paths AS (SELECT DISTINCT l.pred AS p, r.pred AS q, l.subj AS x,
                 r.obj AS z
          FROM rf l JOIN rf r ON l.obj = r.subj),
b2 AS (SELECT p, q, count(*)::BIGINT AS body_n FROM paths GROUP BY p, q),
s2 AS (SELECT pa.p, pa.q, h.pred AS r, count(*)::BIGINT AS support
       FROM paths pa JOIN rf h ON h.subj = pa.x AND h.obj = pa.z
       GROUP BY 1, 2, 3),
r2 AS (SELECT 'p(x,y) & q(y,z) => r(x,z)' AS rule, p, q, r, support,
              body_n
       FROM s2 JOIN b2 USING (p, q)),
u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
SELECT rule, p, q, r, support, body_n,
       (support * 10000 // body_n)::BIGINT AS conf_bp
FROM u
WHERE support >= 2 AND support * 10000 >= 3000 * body_n
ORDER BY rule, p, q, r
""")
def kg_rule_mining(spark, sf):
    """AMIE-style rule mining (ops/graph.mine_horn_rules) over a
    planted composable KG: p0/p1 chains whose heads exist for 7 of 10
    orderkeys under p3 and 1 of 3 under p2, so both the chain rule
    p0&p1 => p3 and its weaker p2 twin clear different confidence
    bands, plus the length-1 implications between the overlapping
    p2/p3 fact sets. The max_fanout hub guard is a no-op at every
    contract scale (join-entity fanout product <= ~600 < 10^4 by the
    synth's moduli — the embed_ann_lsh documentation convention), so
    the oracle replays the UNGUARDED dataflow: the distinct fact set,
    both body counts, both support joins, and the exact product
    confidence gate."""
    from lamapi_spark.ops.graph import mine_horn_rules

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    a = F.concat(F.lit("e"), F.col("o_custkey") % 30)
    b = F.concat(F.lit("f"), F.col("o_orderkey") % 40)
    c = F.concat(F.lit("g"), (F.col("o_custkey") + F.col("o_orderkey")) % 20)
    facts = (
        o.select(a.alias("subj"), F.lit("p0").alias("pred"), b.alias("obj"))
        .unionByName(o.select(b.alias("subj"), F.lit("p1").alias("pred"),
                              c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 10 < 7)
                     .select(a.alias("subj"), F.lit("p3").alias("pred"),
                             c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 0)
                     .select(a.alias("subj"), F.lit("p2").alias("pred"),
                             c.alias("obj"))))
    return (mine_horn_rules(facts, min_support=2, min_conf_bp=3000)
            .orderBy("rule", "p", "q", "r"))


_RULE_MINE_CTES = """
b1 AS (SELECT pred AS p, count(*)::BIGINT AS body_n FROM rf GROUP BY pred),
s1 AS (SELECT b.pred AS p, h.pred AS r, count(*)::BIGINT AS support
       FROM rf b JOIN rf h
         ON b.subj = h.subj AND b.obj = h.obj AND b.pred <> h.pred
       GROUP BY 1, 2),
r1 AS (SELECT 'p(x,y) => r(x,y)' AS rule, s1.p, NULL::VARCHAR AS q,
              s1.r, s1.support, b1.body_n
       FROM s1 JOIN b1 USING (p)),
paths AS (SELECT DISTINCT l.pred AS p, r.pred AS q, l.subj AS x,
                 r.obj AS z
          FROM rf l JOIN rf r ON l.obj = r.subj),
b2 AS (SELECT p, q, count(*)::BIGINT AS body_n FROM paths GROUP BY p, q),
s2 AS (SELECT pa.p, pa.q, h.pred AS r, count(*)::BIGINT AS support
       FROM paths pa JOIN rf h ON h.subj = pa.x AND h.obj = pa.z
       GROUP BY 1, 2, 3),
r2 AS (SELECT 'p(x,y) & q(y,z) => r(x,z)' AS rule, p, q, r, support,
              body_n
       FROM s2 JOIN b2 USING (p, q)),
rules AS (
  SELECT p, q, r, (support * 10000 // body_n)::BIGINT AS conf_bp
  FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
  WHERE support >= 2 AND support * 10000 >= 3000 * body_n)"""


@register("kg_rule_predictions", f"""
WITH {_RULE_FACTS_SQL},
{_RULE_MINE_CTES},
c1 AS (SELECT f.subj, ru.r AS pred, f.obj, ru.conf_bp,
              ru.p || '=>' || ru.r AS rid
       FROM rf f JOIN rules ru ON ru.q IS NULL AND f.pred = ru.p),
c2 AS (SELECT pa.x AS subj, ru.r AS pred, pa.z AS obj, ru.conf_bp,
              ru.p || '&' || ru.q || '=>' || ru.r AS rid
       FROM paths pa JOIN rules ru
         ON ru.q IS NOT NULL AND pa.p = ru.p AND pa.q = ru.q),
cand AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
merged AS (SELECT subj, pred, obj, max(conf_bp)::BIGINT AS conf_bp,
                  count(DISTINCT rid)::BIGINT AS n_rules
           FROM cand GROUP BY 1, 2, 3)
SELECT m.subj, m.pred, m.obj, m.conf_bp, m.n_rules
FROM merged m LEFT JOIN rf t
  ON t.subj = m.subj AND t.pred = m.pred AND t.obj = m.obj
WHERE t.subj IS NULL
ORDER BY m.subj, m.pred, m.obj
""")
def kg_rule_predictions(spark, sf):
    """KB completion (ops/graph.apply_horn_rules over the
    mine_horn_rules output) on the planted rule synth: the 30% of
    (x, z) chain pairs missing their p3 head come back as predictions,
    each derived by TWO independent rules (the chain rule and the
    p2-subsumption) — n_rules = 2 corroboration, conf = their max.
    The oracle replays mining AND application end to end, including
    the rule-id distinct count and the existing-fact anti-join."""
    from lamapi_spark.ops.graph import apply_horn_rules, mine_horn_rules

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    a = F.concat(F.lit("e"), F.col("o_custkey") % 30)
    b = F.concat(F.lit("f"), F.col("o_orderkey") % 40)
    c = F.concat(F.lit("g"), (F.col("o_custkey") + F.col("o_orderkey")) % 20)
    facts = (
        o.select(a.alias("subj"), F.lit("p0").alias("pred"), b.alias("obj"))
        .unionByName(o.select(b.alias("subj"), F.lit("p1").alias("pred"),
                              c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 10 < 7)
                     .select(a.alias("subj"), F.lit("p3").alias("pred"),
                             c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 0)
                     .select(a.alias("subj"), F.lit("p2").alias("pred"),
                             c.alias("obj"))))
    rules = mine_horn_rules(facts, min_support=2, min_conf_bp=3000)
    return (apply_horn_rules(facts, rules)
            .orderBy("subj", "pred", "obj"))


# ------------------------------------------------- retrieval eval

@register("eval_retrieval", """
WITH rkd AS (
  SELECT * FROM (
    SELECT 'q' || (o_custkey % 50) AS query_id,
           'd' || (o_orderkey % 97) AS doc_id,
           (row_number() OVER (PARTITION BY o_custkey % 50
                               ORDER BY o_orderkey))::BIGINT AS rk
    FROM orders) WHERE rk <= 10),
qr AS (
  SELECT 'q' || (o_custkey % 50) AS query_id,
         'd' || (o_orderkey % 97) AS doc_id,
         max(1 + o_orderkey % 2)::INT AS grade
  FROM orders
  WHERE o_orderkey % 5 = 0 AND (o_custkey % 50) < 45
  GROUP BY 1, 2),
j AS (SELECT r.query_id, r.rk, coalesce(q.grade, 0)::INT AS g
      FROM rkd r LEFT JOIN qr q USING (query_id, doc_id)),
per AS (
  SELECT query_id,
         list(struct_pack(rk := rk, g := g) ORDER BY rk, g) AS a,
         count(*)::BIGINT AS n_ret,
         sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)::BIGINT AS hits,
         min(CASE WHEN g > 0 THEN rk END) AS fr
  FROM j GROUP BY query_id),
ide AS (
  SELECT query_id, (list(grade ORDER BY grade DESC))[:10] AS ig,
         count(*)::BIGINT AS n_judged
  FROM qr GROUP BY query_id),
m AS (
  SELECT p.query_id, p.n_ret,
         coalesce(i.n_judged, 0)::BIGINT AS n_judged, p.hits,
         CASE WHEN p.fr IS NOT NULL THEN 1.0 / p.fr ELSE 0.0 END AS rr,
         list_reduce(list_prepend(0.0::DOUBLE, list_transform(p.a,
             s -> (power(2.0, s.g) - 1.0) / log2(s.rk + 1.0))),
             (x, y) -> x + y) AS dcg,
         CASE WHEN i.ig IS NOT NULL THEN
           list_reduce(list_prepend(0.0::DOUBLE, list_transform(i.ig,
               (g, p2) -> (power(2.0, g) - 1.0) / log2(p2 + 1.0))),
               (x, y) -> x + y)
         ELSE 0.0 END AS idcg
  FROM per p LEFT JOIN ide i USING (query_id))
SELECT query_id, n_ret, n_judged, hits,
       round_even(rr, 6) AS rr,
       round_even(hits / 10.0, 6) AS p_at_k,
       round_even(CASE WHEN n_judged > 0
                       THEN hits / CAST(n_judged AS DOUBLE)
                  ELSE 0.0 END, 6) AS r_at_k,
       round_even(dcg, 6) AS dcg,
       round_even(idcg, 6) AS idcg,
       round_even(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6)
         AS ndcg
FROM m ORDER BY query_id
""")
def eval_retrieval(spark, sf):
    """Ranked-retrieval eval (ops/metrics.retrieval_eval, k=10) over a
    replayable synth: per-query top-10 lists from the orderkey window,
    graded qrels on every 5th orderkey with queries q45-q49 left
    UNJUDGED (the idcg-absent degrade path). The oracle replays the
    window, the grade dedup, and BOTH DCG folds with the identical
    left-fold association order (list_prepend 0.0 + list_reduce — the
    HLL-oracle discipline)."""
    from lamapi_spark.ops.metrics import retrieval_eval

    o = load(spark, sf, "orders")
    w = Window.partitionBy(F.col("o_custkey") % 50).orderBy("o_orderkey")
    ranked = (o.select(
        F.concat(F.lit("q"), F.col("o_custkey") % 50).alias("query_id"),
        F.concat(F.lit("d"), F.col("o_orderkey") % 97).alias("doc_id"),
        F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 10))
    qrels = (o.filter((F.col("o_orderkey") % 5 == 0)
                      & (F.col("o_custkey") % 50 < 45))
             .groupBy(
                 F.concat(F.lit("q"),
                          F.col("o_custkey") % 50).alias("query_id"),
                 F.concat(F.lit("d"),
                          F.col("o_orderkey") % 97).alias("doc_id"))
             .agg(F.max(F.lit(1) + F.col("o_orderkey") % 2)
                  .cast("int").alias("grade")))
    return retrieval_eval(ranked, qrels, k=10).orderBy("query_id")


# ------------------------------------------------- cardinality QC

@register("kg_cardinality_violations", """
WITH f AS (
  SELECT DISTINCT * FROM (
    SELECT 's' || c_custkey AS subj, 'born' AS pred,
           'y' || (1900 + c_custkey % 100) AS obj FROM customer
    UNION ALL
    SELECT 's' || c_custkey, 'born', 'y' || (1800 + c_custkey % 50)
    FROM customer WHERE c_custkey % 20 = 0
    UNION ALL
    SELECT 's' || (c_custkey % 100), 'likes', 'o' || (c_custkey % 400)
    FROM customer)),
fun AS (
  SELECT pred FROM (
    SELECT pred, count(*)::BIGINT AS nf,
           count(DISTINCT subj)::BIGINT AS ns
    FROM f GROUP BY pred)
  WHERE nf >= 10 AND ns * 10000 >= 9000 * nf),
per AS (
  SELECT f.pred, f.subj, count(*)::BIGINT AS n_objects,
         min(f.obj) AS obj_a, max(f.obj) AS obj_b
  FROM f JOIN fun USING (pred) GROUP BY f.pred, f.subj)
SELECT pred, subj, n_objects, obj_a, obj_b
FROM per WHERE n_objects >= 2 ORDER BY pred, subj
""")
def kg_cardinality_violations(spark, sf):
    """Functionality-based anomaly flags (ops/graph.
    cardinality_violations): 'born' is planted quasi-functional (5% of
    subjects carry a second birth year — exactly the violations),
    'likes' is many-valued and must stay ungated. The oracle replays
    the distinct fact set, the exact product functionality gate, and
    the per-subject rollup with both sample objects."""
    from lamapi_spark.ops.graph import cardinality_violations

    c = load(spark, sf, "customer").select("c_custkey")
    ck = F.col("c_custkey")
    facts = (
        c.select(F.concat(F.lit("s"), ck).alias("subj"),
                 F.lit("born").alias("pred"),
                 F.concat(F.lit("y"), 1900 + ck % 100).alias("obj"))
        .unionByName(
            c.filter(ck % 20 == 0)
            .select(F.concat(F.lit("s"), ck).alias("subj"),
                    F.lit("born").alias("pred"),
                    F.concat(F.lit("y"), 1800 + ck % 50).alias("obj")))
        .unionByName(
            c.select(F.concat(F.lit("s"), ck % 100).alias("subj"),
                     F.lit("likes").alias("pred"),
                     F.concat(F.lit("o"), ck % 400).alias("obj"))))
    return (cardinality_violations(facts, min_functionality_bp=9000,
                                   min_facts=10)
            .orderBy("pred", "subj"))


# ------------------------------------------------- PII pseudonyms

@register("pii_pseudonyms", r"""
WITH tr AS (
  SELECT 'c' || (o_custkey % 200) AS key, o_orderkey AS o,
         'reach u' || (o_orderkey % 7) || '@ex' || (o_custkey % 5)
         || '.com'
         || CASE WHEN o_orderkey % 4 = 0
                 THEN ' or 10.0.' || (o_orderkey % 3) || '.1'
                 ELSE '' END || ' now' AS text
  FROM orders),
pats AS (SELECT * FROM (VALUES
  ('email', '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'),
  ('ipv4', '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'),
  ('phone', '\+[0-9][0-9 -]{6,}[0-9]')) AS v(kind, pat)),
m AS (SELECT key, o, kind, regexp_extract_all(text, pat) AS l
      FROM tr CROSS JOIN pats),
occ AS (SELECT key, o, kind, u.p::INT AS p, u.v AS value FROM (
  SELECT key, o, kind, unnest(list_transform(range(1, len(l) + 1),
    i -> struct_pack(p := i, v := l[i]))) AS u FROM m)),
fst AS (SELECT key, kind, value,
               min(struct_pack(o := o, p := p)) AS f
        FROM occ GROUP BY 1, 2, 3),
n AS (SELECT key, kind, value, f.o AS first_order,
             row_number() OVER (PARTITION BY key, kind
                                ORDER BY f.o, f.p, value) AS rn
      FROM fst)
SELECT key, kind, value, first_order,
       upper(kind) || '_' || rn AS pseudo
FROM n ORDER BY key, kind, pseudo
""")
def pii_pseudonyms_q(spark, sf):
    """Consistent PII pseudonymization (ops/textstats.pii_pseudonyms)
    over planted contact lines: 7x5 email variants recur across a
    conversation's turns (the SAME address must keep ONE number) and
    every 4th turn carries an IPv4; the phone kind matches nothing —
    the absent-kind path. The oracle replays both regex scans with
    in-list positions, the (order, position) struct-min first
    occurrence, and the per-(conv, kind) numbering window."""
    from lamapi_spark.ops.textstats import pii_pseudonyms

    o = load(spark, sf, "orders")
    text = F.concat(
        F.lit("reach u"), F.col("o_orderkey") % 7,
        F.lit("@ex"), F.col("o_custkey") % 5, F.lit(".com"),
        F.when(F.col("o_orderkey") % 4 == 0,
               F.concat(F.lit(" or 10.0."), F.col("o_orderkey") % 3,
                        F.lit(".1"))).otherwise(F.lit("")),
        F.lit(" now"))
    tr = o.select(
        F.concat(F.lit("c"), F.col("o_custkey") % 200).alias("conv_id"),
        F.col("o_orderkey").alias("turn_idx"), text.alias("text"))
    return (pii_pseudonyms(tr).orderBy("key", "kind", "pseudo"))


# ------------------------------------------------- k-truss

@register("graph_ktruss", """
WITH raw AS (
  SELECT 'r' || (c_custkey % 60) AS u,
         'r' || ((c_custkey % 60 + 1) % 60) AS v FROM customer
  UNION ALL
  SELECT 'r' || (c_custkey % 60), 'r' || ((c_custkey % 60 + 2) % 60)
  FROM customer
  UNION ALL
  SELECT 'm' || i.k, 'm' || j.k
  FROM (SELECT DISTINCT c_custkey % 6 AS k FROM customer) i
  JOIN (SELECT DISTINCT c_custkey % 6 AS k FROM customer) j
    ON i.k < j.k),
e1 AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
       FROM raw WHERE u <> v),
t1 AS (SELECT x.a AS ta, x.b AS tb, y.b AS tc
         FROM e1 x JOIN e1 y ON y.a = x.b
         JOIN e1 z ON z.a = x.a AND z.b = y.b),
s1 AS (SELECT a, b, count(*)::BIGINT AS support FROM (
           SELECT ta AS a, tb AS b FROM t1
           UNION ALL SELECT tb, tc FROM t1
           UNION ALL SELECT ta, tc FROM t1) GROUP BY a, b),
e2 AS (SELECT a, b FROM s1 WHERE support >= 2),
t2 AS (SELECT x.a AS ta, x.b AS tb, y.b AS tc
         FROM e2 x JOIN e2 y ON y.a = x.b
         JOIN e2 z ON z.a = x.a AND z.b = y.b),
s2 AS (SELECT a, b, count(*)::BIGINT AS support FROM (
           SELECT ta AS a, tb AS b FROM t2
           UNION ALL SELECT tb, tc FROM t2
           UNION ALL SELECT ta, tc FROM t2) GROUP BY a, b),
e3 AS (SELECT a, b FROM s2 WHERE support >= 2),
t3 AS (SELECT x.a AS ta, x.b AS tb, y.b AS tc
         FROM e3 x JOIN e3 y ON y.a = x.b
         JOIN e3 z ON z.a = x.a AND z.b = y.b),
s3 AS (SELECT a, b, count(*)::BIGINT AS support FROM (
           SELECT ta AS a, tb AS b FROM t3
           UNION ALL SELECT tb, tc FROM t3
           UNION ALL SELECT ta, tc FROM t3) GROUP BY a, b),
e4 AS (SELECT a, b FROM s3 WHERE support >= 2)
SELECT a, b, support FROM s3 WHERE support >= 2 ORDER BY a, b
""")
def graph_ktruss(spark, sf):
    """4-truss peel (ops/graph.k_truss) over a planted cascade: a
    60-ring with distance-2 chords (ring edges close 2 triangles,
    chords 1) plus a 6-clique (every edge support 4). Round 1 drops
    the chords, round 2 the now-triangle-free ring, round 3 is the
    fixed point — only the clique survives. The oracle unrolls the
    three peel rounds CTE by CTE with the canonical-triangle
    formulation (each triangle listed once as a < b < c), an
    INDEPENDENT enumeration of the operator's degree-oriented wedge
    join."""
    from lamapi_spark.ops.graph import k_truss

    c = load(spark, sf, "customer").select(
        (F.col("c_custkey") % 60).alias("k"),
        (F.col("c_custkey") % 6).alias("m"))
    ring = c.select(F.concat(F.lit("r"), F.col("k")).alias("src"),
                    F.concat(F.lit("r"), (F.col("k") + 1) % 60).alias("dst"))
    chord = c.select(F.concat(F.lit("r"), F.col("k")).alias("src"),
                     F.concat(F.lit("r"), (F.col("k") + 2) % 60).alias("dst"))
    d6 = c.select("m").distinct()
    clique = (d6.alias("i").join(d6.alias("j"),
                                 F.col("i.m") < F.col("j.m"))
              .select(F.concat(F.lit("m"), F.col("i.m")).alias("src"),
                      F.concat(F.lit("m"), F.col("j.m")).alias("dst")))
    edges = ring.unionByName(chord).unionByName(clique)
    return k_truss(edges, k=4, n_rounds=8).orderBy("a", "b")


# ------------------------------------------------- predicate overlap

@register("kg_pred_overlap", f"""
WITH {_RULE_FACTS_SQL},
sz AS (SELECT pred, count(*)::BIGINT AS n FROM rf GROUP BY pred),
cm AS (SELECT a.pred AS p, b.pred AS r, count(*)::BIGINT AS common
       FROM rf a JOIN rf b
         ON a.subj = b.subj AND a.obj = b.obj AND a.pred < b.pred
       GROUP BY 1, 2)
SELECT cm.p, cm.r, cm.common, sp.n AS n_p, sr.n AS n_r,
       (cm.common * 10000 // (sp.n + sr.n - cm.common))::BIGINT
         AS jaccard_bp
FROM cm JOIN sz sp ON sp.pred = cm.p JOIN sz sr ON sr.pred = cm.r
WHERE cm.common >= 2
  AND cm.common * 10000 >= 4000 * (sp.n + sr.n - cm.common)
ORDER BY p, r
""")
def kg_pred_overlap(spark, sf):
    """Predicate extension overlap (ops/graph.predicate_overlap) over
    the rule-mining synth: p2's pairs are a strict subset of p3's
    universe with 70%/100% coverage, so exactly the p2/p3 pair clears
    the 4000bp gate while the disjoint-namespace p0/p1 pairs share
    nothing. The oracle replays the distinct, the pair self-join, and
    the exact product gate."""
    from lamapi_spark.ops.graph import predicate_overlap

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    a = F.concat(F.lit("e"), F.col("o_custkey") % 30)
    b = F.concat(F.lit("f"), F.col("o_orderkey") % 40)
    c = F.concat(F.lit("g"), (F.col("o_custkey") + F.col("o_orderkey")) % 20)
    facts = (
        o.select(a.alias("subj"), F.lit("p0").alias("pred"), b.alias("obj"))
        .unionByName(o.select(b.alias("subj"), F.lit("p1").alias("pred"),
                              c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 10 < 7)
                     .select(a.alias("subj"), F.lit("p3").alias("pred"),
                             c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 0)
                     .select(a.alias("subj"), F.lit("p2").alias("pred"),
                             c.alias("obj"))))
    return (predicate_overlap(facts, min_common=2, min_jaccard_bp=4000)
            .orderBy("p", "r"))


# ------------------------------------------------- burst detection

@register("events_burst_detection", """
WITH feed AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT 'spike', make_timestamp(1705752000000000)
  FROM events WHERE event_id % 50 = 0
  UNION ALL
  SELECT 'spike', make_timestamp(
    (1704844800 + (event_id % 7) * 86400 + 3600) * 1000000)
  FROM events WHERE event_id % 200 = 3),
cnt AS (SELECT event_type AS key,
               epoch_us(ts) // 86400000000 AS bin,
               count(*)::BIGINT AS cnt
        FROM feed GROUP BY 1, 2),
span AS (SELECT key, min(bin) AS lo, max(bin) AS hi FROM cnt
         GROUP BY key),
grid AS (SELECT key, unnest(range(lo, hi + 1)) AS bin FROM span),
dense AS (SELECT g.key, g.bin, coalesce(c.cnt, 0)::BIGINT AS cnt
          FROM grid g LEFT JOIN cnt c
            ON c.key = g.key AND c.bin = g.bin),
wnd AS (SELECT key, bin, cnt,
        coalesce(sum(cnt) OVER (PARTITION BY key ORDER BY bin
          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS prev_sum,
        (count(cnt) OVER (PARTITION BY key ORDER BY bin
          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))::BIGINT AS n_prev
        FROM dense)
SELECT key, bin, cnt, prev_sum, n_prev,
       (cnt > 0 AND n_prev >= 3
        AND cnt * 10000 * n_prev >= 20000 * prev_sum) AS burst
FROM wnd ORDER BY key, bin
""")
def events_burst_detection(spark, sf):
    """Rate-spike flags (ops/temporal.burst_detection, daily bins, 2x
    trailing-7 factor) over the real event feed PLUS a planted
    'spike' key: a 10-day trickle (~7/day) then 200 events on day 20
    — the burst the integer product gate must flag, while the
    organic per-type rates stay below 2x their own trailing means.
    The oracle replays the planted feed, the dense per-key grid, and
    the trailing ROWS window."""
    from lamapi_spark.ops.temporal import burst_detection

    e = load(spark, sf, "events").select("event_id", "event_type", "ts")
    spike = (e.filter(F.col("event_id") % 50 == 0)
             .select(F.lit("spike").alias("event_type"),
                     F.timestamp_seconds(
                         F.lit(1705752000)).alias("ts")))
    trickle = (e.filter(F.col("event_id") % 200 == 3)
               .select(F.lit("spike").alias("event_type"),
                       F.timestamp_seconds(
                           F.lit(1704844800)
                           + (F.col("event_id") % 7) * 86400
                           + 3600).alias("ts")))
    feed = (e.select("event_type", "ts")
            .unionByName(spike).unionByName(trickle))
    return (burst_detection(feed, key_col="event_type", ts_col="ts",
                            bin_s=86400, trail_bins=7,
                            factor_bp=20000, min_prev_bins=3)
            .orderBy("key", "bin"))


# ------------------------------------------------- conversation TextRank

# the oracle reuses queries_graph's fixed-point PageRank round SQL and
# constants (importing here, NOT from queries_graph, keeps the module
# graph acyclic: queries_kg imports queries_graph at load time)
from lamapi_spark.queries_graph import (  # noqa: E402
    _N_ITER, _SCALE, _pagerank_iter_sql,
)



@register("conv_textrank", f"""
WITH {_TR_SQL},
tok AS (
  SELECT DISTINCT conv_id, turn_idx, u AS tok FROM (
    SELECT conv_id, turn_idx,
           unnest(string_split_regex(trim(lower(text)), '[^a-z0-9]+')) AS u
    FROM tr)
  WHERE u <> ''),
sizes AS (SELECT conv_id, turn_idx, count(*)::BIGINT AS n
          FROM tok GROUP BY 1, 2),
cmn AS (
  SELECT a.conv_id, a.turn_idx AS ta, b.turn_idx AS tb,
         count(*)::BIGINT AS c
  FROM tok a JOIN tok b ON a.conv_id = b.conv_id AND a.tok = b.tok
  WHERE a.turn_idx < b.turn_idx
  GROUP BY 1, 2, 3),
prs AS (
  SELECT cm.conv_id, cm.ta, cm.tb
  FROM cmn cm
  JOIN sizes s1 ON s1.conv_id = cm.conv_id AND s1.turn_idx = cm.ta
  JOIN sizes s2 ON s2.conv_id = cm.conv_id AND s2.turn_idx = cm.tb
  WHERE cm.c * 10000 >= 2000 * (s1.n + s2.n - cm.c)),
edges AS (
  SELECT conv_id || '#' || ta AS src, conv_id || '#' || tb AS dst FROM prs
  UNION ALL
  SELECT conv_id || '#' || tb, conv_id || '#' || ta FROM prs),
outdeg AS (SELECT src AS node, count(*)::BIGINT AS degree
           FROM edges GROUP BY src),
nodes AS (SELECT node FROM outdeg),
r0 AS (SELECT node, {_SCALE}::BIGINT AS rank FROM nodes),
{",".join(_pagerank_iter_sql(k) for k in range(1, _N_ITER + 1))},
ranked AS (
  SELECT string_split(node, '#')[1] AS conv_id,
         string_split(node, '#')[2]::BIGINT AS turn_idx, rank
  FROM r{_N_ITER}),
topk AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id
                               ORDER BY rank DESC, turn_idx ASC) AS rk
  FROM ranked)
SELECT conv_id, turn_idx, rank AS rank_units, rk::INT AS rk
FROM topk WHERE rk <= 2 ORDER BY conv_id, rk
""")
def conv_textrank_q(spark, sf):
    """TextRank extractive summarization (pipeline/salience.
    conv_textrank) over the planted transcript: the 4 rotating turn
    templates give high within-conversation Jaccard between
    same-template turns, so centrality concentrates on the repeated
    anchor turns; the oracle replays tokenization, the exact integer
    Jaccard gate, the symmetric edge build, all {_N_ITER} fixed-point
    PageRank rounds CTE by CTE, and the per-conversation top-k
    window."""
    from lamapi_spark.pipeline.salience import conv_textrank

    return (conv_textrank(_transcripts(spark, sf), top_k=2,
                          min_jaccard_bp=2000, n_iter=_N_ITER,
                          scale=_SCALE)
            .orderBy("conv_id", "rk"))


# ------------------------------------------------- Gini concentration

@register("eval_gini", """
WITH s AS (SELECT o_orderkey AS k,
                  round_even(o_totalprice, 6)::DECIMAL(18,6) AS v
           FROM orders),
r AS (SELECT k, v,
             row_number() OVER (ORDER BY CAST(v AS DOUBLE), k) AS r
      FROM s),
a AS (SELECT count(*)::BIGINT AS n,
             sum(v)::DECIMAL(38,6) AS s0,
             sum(r::DECIMAL(19,0) * v)::DECIMAL(38,6) AS s1
      FROM r)
SELECT n, CAST(s0 AS DOUBLE) AS total,
       round_even(CASE WHEN n >= 2 AND s0 > 0 THEN
         2.0 * CAST(s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
       ELSE 0.0 END, 6) AS gini
FROM a
""")
def eval_gini(spark, sf):
    """Concentration audit (ops/metrics.gini_concentration) over the
    order-price distribution. The Spark side ranks via the two-level
    scan and sums rank*value in DECIMAL; the oracle is the
    INDEPENDENT naive global-window formulation — green proves the
    scan ranks and both exact sums once more, on a continuous-valued
    column this time (eval_spearman pinned the heavy-tie integer
    case)."""
    from lamapi_spark.ops.metrics import gini_concentration

    o = load(spark, sf, "orders")
    return gini_concentration(
        o.select("o_orderkey", "o_totalprice"),
        "o_orderkey", "o_totalprice", n_buckets=64)


# ------------------------------------------------- cohort retention

@register("events_cohort_retention", """
WITH act AS (
  SELECT DISTINCT user_id AS u,
         epoch_us(ts) // 604800000000 AS p
  FROM events),
fst AS (SELECT u, min(p) AS cohort FROM act GROUP BY u),
sz AS (SELECT cohort, count(*)::BIGINT AS cohort_size FROM fst
       GROUP BY cohort),
ret AS (SELECT f.cohort, (a.p - f.cohort)::BIGINT AS week_offset,
               count(*)::BIGINT AS retained
        FROM act a JOIN fst f USING (u) GROUP BY 1, 2)
SELECT r.cohort, r.week_offset, r.retained, s.cohort_size,
       (r.retained * 10000 // s.cohort_size)::BIGINT AS retained_bp
FROM ret r JOIN sz s USING (cohort)
ORDER BY cohort, week_offset
""")
def events_cohort_retention(spark, sf):
    """Weekly cohort retention (ops/temporal.cohort_retention) over
    the real event feed: users cohort by first-activity week, the
    offset-0 diagonal equals the cohort sizes, and every ratio is an
    exact integer division. The oracle replays the activity distinct,
    the min-cohort, and both aggregations."""
    from lamapi_spark.ops.temporal import cohort_retention

    e = load(spark, sf, "events").select("user_id", "ts")
    return (cohort_retention(e, bin_s=86400 * 7)
            .orderBy("cohort", "week_offset"))


# ------------------------------------------------- funnel analysis

@register("events_funnel", """
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS t, event_type AS tp
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
per AS (
  SELECT u, list(struct_pack(t := t, tp := tp) ORDER BY t, tp) AS a
  FROM ev GROUP BY u),
chain AS (
  SELECT u,
         (list_filter(a, x -> x.tp = 'view'))[1].t AS t0
  FROM per),
chain1 AS (
  SELECT c.u, c.t0,
         (list_filter(p.a, x -> x.tp = 'click' AND x.t > c.t0))[1].t AS t1
  FROM chain c JOIN per p USING (u)),
chain2 AS (
  SELECT c.u, c.t0, c.t1,
         (list_filter(p.a,
             x -> x.tp = 'purchase' AND x.t > c.t1))[1].t AS t2
  FROM chain1 c JOIN per p USING (u)),
agg AS (
  SELECT sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM chain2)
SELECT * FROM (
  SELECT 1::INT AS step_idx, 'view' AS step, n0 AS n_users,
         (n0 * 10000 // greatest(n0, 1))::BIGINT AS conv_bp FROM agg
  UNION ALL
  SELECT 2, 'click', n1, (n1 * 10000 // greatest(n0, 1))::BIGINT FROM agg
  UNION ALL
  SELECT 3, 'purchase', n2,
         (n2 * 10000 // greatest(n0, 1))::BIGINT FROM agg)
ORDER BY step_idx
""")
def events_funnel(spark, sf):
    """view -> click -> purchase funnel (ops/temporal.funnel_analysis)
    over the real event feed: sequential-min chaining with strict
    inequality, evaluated as in-row filter expressions over one
    per-user sorted array — never a k-way non-equi self-join. The
    oracle replays the filter pushdown, the (ts, type) sort, and each
    chain hop as list expressions."""
    from lamapi_spark.ops.temporal import funnel_analysis

    e = load(spark, sf, "events")
    return (funnel_analysis(e, ["view", "click", "purchase"])
            .orderBy("step_idx"))


# ------------------------------------------------- type subsumption

@register("kg_type_subsumption", """
WITH et AS (
  SELECT DISTINCT * FROM (
    SELECT 'e' || c_custkey AS entity, 'person' AS type FROM customer
    UNION ALL
    SELECT 'e' || c_custkey, 'athlete' FROM customer
    WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT 'e' || c_custkey, 'runner' FROM customer
    WHERE c_custkey % 10 = 0
    UNION ALL
    -- noisy athlete missing the person type: breaks 100% containment
    SELECT 'x' || c_custkey, 'athlete' FROM customer
    WHERE c_custkey % 500 = 0
    UNION ALL
    SELECT 'e' || c_custkey, 'org' FROM customer WHERE c_custkey % 7 = 0)),
sz AS (SELECT type, count(*)::BIGINT AS n FROM et GROUP BY type),
cm AS (SELECT a.type AS ta, b.type AS tb, count(*)::BIGINT AS common
       FROM et a JOIN et b ON a.entity = b.entity AND a.type <> b.type
       GROUP BY 1, 2)
SELECT cm.ta AS sub_type, cm.tb AS super_type,
       sa.n AS n_sub, sb.n AS n_super, cm.common,
       (cm.common * 10000 // sa.n)::BIGINT AS sub_bp
FROM cm JOIN sz sa ON sa.type = cm.ta JOIN sz sb ON sb.type = cm.tb
WHERE sb.n > sa.n AND cm.common >= 3
  AND cm.common * 10000 >= 9500 * sa.n
ORDER BY sub_type, super_type
""")
def kg_type_subsumption(spark, sf):
    """Type-hierarchy induction (ops/graph.type_subsumption) over a
    planted ontology: runner < athlete < person (with the transitive
    runner < person edge) and a 0.2% noisy athlete slice missing the
    person type (containment lands at 9900bp — the gate must still
    pass it at 9500). The org type also lands under person — every
    org entity IS person-typed in the synth — which is the honest
    behavior of extension-only induction: it finds containment, not
    intension (label semantics are a different signal). The oracle
    replays the distinct, the entity self-join, and every gate."""
    from lamapi_spark.ops.graph import type_subsumption

    c = load(spark, sf, "customer").select("c_custkey")
    ck = F.col("c_custkey")
    ent = lambda pfx: F.concat(F.lit(pfx), ck).alias("entity")
    et = (
        c.select(ent("e"), F.lit("person").alias("type"))
        .unionByName(c.filter(ck % 5 == 0)
                     .select(ent("e"), F.lit("athlete").alias("type")))
        .unionByName(c.filter(ck % 10 == 0)
                     .select(ent("e"), F.lit("runner").alias("type")))
        .unionByName(c.filter(ck % 500 == 0)
                     .select(ent("x"), F.lit("athlete").alias("type")))
        .unionByName(c.filter(ck % 7 == 0)
                     .select(ent("e"), F.lit("org").alias("type"))))
    return (type_subsumption(et, min_sub_bp=9500, min_count=3)
            .orderBy("sub_type", "super_type"))


# ------------------------------------------------- KG verbalization

@register("kg_verbalize", f"""
WITH {_RULE_FACTS_SQL},
rk AS (SELECT subj, pred, obj,
              row_number() OVER (PARTITION BY subj
                                 ORDER BY pred, obj) AS rn
       FROM rf),
cnt AS (SELECT subj, count(*)::BIGINT AS n_facts FROM rf GROUP BY subj)
SELECT c.subj, c.n_facts,
       l.subj || ' ' || string_agg(l.pred || ' ' || l.obj, '; '
                                   ORDER BY l.pred, l.obj) AS text
FROM (SELECT * FROM rk WHERE rn <= 3) l JOIN cnt c USING (subj)
GROUP BY c.subj, c.n_facts, l.subj
ORDER BY subj
""")
def kg_verbalize(spark, sf):
    """KG-to-text export (pipeline/exports.verbalize_entities, k=3)
    over the rule-mining fact synth — hub subjects carry far more
    than k facts, exercising the window-before-collect bound. The
    oracle replays the distinct, the top-k window, and the ordered
    string aggregation."""
    from lamapi_spark.pipeline.exports import verbalize_entities

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    a = F.concat(F.lit("e"), F.col("o_custkey") % 30)
    b = F.concat(F.lit("f"), F.col("o_orderkey") % 40)
    c = F.concat(F.lit("g"), (F.col("o_custkey") + F.col("o_orderkey")) % 20)
    facts = (
        o.select(a.alias("subj"), F.lit("p0").alias("pred"), b.alias("obj"))
        .unionByName(o.select(b.alias("subj"), F.lit("p1").alias("pred"),
                              c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 10 < 7)
                     .select(a.alias("subj"), F.lit("p3").alias("pred"),
                             c.alias("obj")))
        .unionByName(o.filter(F.col("o_orderkey") % 3 == 0)
                     .select(a.alias("subj"), F.lit("p2").alias("pred"),
                             c.alias("obj"))))
    return verbalize_entities(facts, k=3).orderBy("subj")


# ------------------------------------------------- corpus report

@register("corpus_report", r"""
WITH d AS (
  SELECT text FROM documents
  UNION ALL
  -- planted: exact duplicates of every 20th doc, one empty, one PII
  SELECT text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT '' FROM documents WHERE doc_id = 1
  UNION ALL
  SELECT 'write to ops@example.com today' FROM documents
  WHERE doc_id = 2),
a AS (
  SELECT count(*)::BIGINT AS n_docs,
         coalesce(sum(len(regexp_extract_all(text,
             '(\w+|[^\w\s])'))), 0)::BIGINT AS toks,
         count(DISTINCT md5(coalesce(text, '')))::BIGINT AS ndist,
         coalesce(sum(CASE WHEN len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
           THEN 1 ELSE 0 END), 0)::BIGINT AS pii,
         coalesce(sum(CASE WHEN text IS NULL OR trim(text) = ''
           THEN 1 ELSE 0 END), 0)::BIGINT AS empty
  FROM d)
SELECT m.metric, m.value FROM a, LATERAL (VALUES
  ('n_docs', CAST(n_docs AS DOUBLE)),
  ('regex_tokens', CAST(toks AS DOUBLE)),
  ('avg_tokens_bp',
   CAST(toks * 10000 // greatest(n_docs, 1) AS DOUBLE)),
  ('exact_dup_bp',
   CAST((n_docs - ndist) * 10000 // greatest(n_docs, 1) AS DOUBLE)),
  ('pii_email_docs', CAST(pii AS DOUBLE)),
  ('empty_docs', CAST(empty AS DOUBLE))) AS m(metric, value)
""")
def corpus_report_q(spark, sf):
    """Corpus data card (ops/textstats.corpus_report) over documents
    plus planted anomalies (5% exact duplicates, one empty line, one
    PII line) so every metric is nonzero. One aggregation pass, long
    shape via in-row explode; the oracle replays the planted union
    and each metric expression."""
    from lamapi_spark.ops.textstats import corpus_report

    d = load(spark, sf, "documents")
    feed = (d.select("text")
            .unionByName(d.filter(F.col("doc_id") % 20 == 0)
                         .select("text"))
            .unionByName(d.filter(F.col("doc_id") == 1)
                         .select(F.lit("").alias("text")))
            .unionByName(d.filter(F.col("doc_id") == 2)
                         .select(F.lit("write to ops@example.com today")
                                 .alias("text"))))
    return corpus_report(feed).orderBy("metric")


# ------------------------------------------------- ego-net sampling

@register("graph_ego_sample", """
WITH ks AS (SELECT DISTINCT (c_custkey % 100) AS k FROM customer),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'n' || k AS src, 'n' || ((k + 1) % 100) AS dst FROM ks
    UNION ALL
    SELECT 'n' || k, 'n' || ((k * 7) % 100) FROM ks
    UNION ALL
    SELECT 'n' || k, 'n' || ((k + 11) % 100) FROM ks)
  WHERE src <> dst OR src = dst),
seeds AS (SELECT DISTINCT 'n' || k AS seed FROM ks WHERE k % 10 = 0),
c1 AS (SELECT s.seed, e.src, e.dst,
              (('0x' || substr(md5(e.src || '|' || e.dst), 1, 12))
               ::UBIGINT)::BIGINT AS h
       FROM seeds s JOIN e ON e.src = s.seed),
s1 AS (SELECT seed, 1::INT AS hop, src, dst FROM (
         SELECT *, row_number() OVER (PARTITION BY seed, src
                                      ORDER BY h, dst) AS rk FROM c1)
       WHERE rk <= 2),
f2 AS (SELECT DISTINCT seed, dst AS node FROM s1
       EXCEPT SELECT seed, seed FROM seeds),
c2 AS (SELECT f.seed, e.src, e.dst,
              (('0x' || substr(md5(e.src || '|' || e.dst), 1, 12))
               ::UBIGINT)::BIGINT AS h
       FROM f2 f JOIN e ON e.src = f.node),
s2 AS (SELECT seed, 2::INT AS hop, src, dst FROM (
         SELECT *, row_number() OVER (PARTITION BY seed, src
                                      ORDER BY h, dst) AS rk FROM c2)
       WHERE rk <= 2)
SELECT * FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
ORDER BY seed, hop, src, dst
""")
def graph_ego_sample(spark, sf):
    """Deterministic 2-hop fanout-2 ego-net sampling
    (ops/graph.ego_net_sample) over an out-degree-3 functional graph
    — the fanout cut is live at every frontier node, and cycles back
    into the seed are pruned by the per-seed visited set. The oracle
    unrolls both hops with the identical md5 edge-hash ordering and
    the visited EXCEPT — green pins the sample, not just its size."""
    from lamapi_spark.ops.graph import ego_net_sample

    ks = (load(spark, sf, "customer")
          .select((F.col("c_custkey") % 100).alias("k")).distinct())
    n = lambda expr: F.concat(F.lit("n"), expr)
    edges = (
        ks.select(n(F.col("k")).alias("src"),
                  n((F.col("k") + 1) % 100).alias("dst"))
        .unionByName(ks.select(n(F.col("k")).alias("src"),
                               n((F.col("k") * 7) % 100).alias("dst")))
        .unionByName(ks.select(n(F.col("k")).alias("src"),
                               n((F.col("k") + 11) % 100).alias("dst")))
        .distinct())
    seeds = (ks.filter(F.col("k") % 10 == 0)
             .select(n(F.col("k")).alias("seed")))
    return (ego_net_sample(edges, seeds, hops=2, fanout=2)
            .orderBy("seed", "hop", "src", "dst"))


# ------------------------------------------------- PR threshold sweep

@register("link_pr_curve", """
WITH s AS (
  SELECT (o_orderkey % 1000) / CAST(1000 AS DOUBLE) AS score,
         CASE WHEN ((o_orderkey * 7919 + o_custkey) % 1000)
                   < (o_orderkey % 1000) THEN 1 ELSE 0 END AS label
  FROM orders),
b AS (SELECT least(CAST(floor(score * 20) AS INT), 19) AS bin, label
      FROM s),
per AS (SELECT bin, count(*)::BIGINT AS n, sum(label)::BIGINT AS p
        FROM b GROUP BY bin),
t AS (SELECT coalesce(sum(p), 0)::BIGINT AS tp FROM per),
c AS (SELECT bin, tp,
             (sum(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW))::BIGINT AS n_at,
             (sum(p) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW))::BIGINT AS p_at
      FROM per CROSS JOIN t)
SELECT (bin * 10000 // 20)::BIGINT AS threshold_bp,
       n_at AS n_at_or_above, p_at AS pos_at_or_above,
       round_even(p_at / CAST(n_at AS DOUBLE), 6) AS precision,
       round_even(CASE WHEN tp > 0 THEN p_at / CAST(tp AS DOUBLE)
                  ELSE 0.0 END, 6) AS recall,
       round_even(CASE WHEN p_at > 0
                  THEN 2.0 * p_at / CAST(n_at + tp AS DOUBLE)
                  ELSE 0.0 END, 6) AS f1
FROM c ORDER BY threshold_bp DESC
""")
def link_pr_curve(spark, sf):
    """Decision-threshold sweep (ops/metrics.pr_curve, 20 bins) over
    the same planted near-calibrated scorer as link_calibration —
    precision rises and recall falls monotonically down the planted
    score, and the bottom row reads recall 1.0. The oracle replays
    the binning, the bounded descending cumulative window, and every
    ratio."""
    from lamapi_spark.ops.metrics import pr_curve

    o = load(spark, sf, "orders")
    scored = o.select(
        ((F.col("o_orderkey") % 1000) / F.lit(1000.0)).alias("score"),
        ((F.col("o_orderkey") * 7919 + F.col("o_custkey")) % 1000
         < F.col("o_orderkey") % 1000).cast("int").alias("label"))
    return pr_curve(scored, n_bins=20)


# ------------------------------------------------- classification report

@register("eval_classification_report", """
WITH p AS (
  SELECT o_orderkey AS k,
         'c' || (CASE WHEN (o_orderkey * 31 + o_custkey) % 10 < 8
                      THEN o_orderkey % 4
                      ELSE (o_orderkey + 1) % 4 END) AS label
  FROM orders WHERE o_orderkey % 11 <> 0),
t AS (
  SELECT o_orderkey AS k, 'c' || (o_orderkey % 4) AS label
  FROM orders WHERE o_orderkey % 13 <> 0),
j AS (SELECT p.label AS pc, t.label AS tc
      FROM p FULL OUTER JOIN t ON p.k = t.k),
fp_side AS (
  SELECT pc AS class,
         CASE WHEN pc = tc THEN 1 ELSE 0 END::BIGINT AS tp,
         CASE WHEN tc IS NULL OR pc <> tc THEN 1 ELSE 0 END::BIGINT
           AS fp,
         0::BIGINT AS fn
  FROM j WHERE pc IS NOT NULL),
fn_side AS (
  SELECT tc AS class, 0::BIGINT, 0::BIGINT, 1::BIGINT
  FROM j WHERE tc IS NOT NULL AND (pc IS NULL OR pc <> tc)),
per AS (
  SELECT class, sum(tp)::BIGINT AS tp, sum(fp)::BIGINT AS fp,
         sum(fn)::BIGINT AS fn
  FROM (SELECT * FROM fp_side UNION ALL SELECT * FROM fn_side)
  GROUP BY class),
r AS (
  SELECT class, tp, fp, fn,
         round_even(CASE WHEN tp + fp > 0
                         THEN tp / CAST(tp + fp AS DOUBLE)
                    ELSE 0.0 END, 6) AS p6,
         round_even(CASE WHEN tp + fn > 0
                         THEN tp / CAST(tp + fn AS DOUBLE)
                    ELSE 0.0 END, 6) AS r6
  FROM per),
r2 AS (
  SELECT *, round_even(CASE WHEN p6 + r6 > 0
                            THEN 2.0 * p6 * r6 / (p6 + r6)
                       ELSE 0.0 END, 6) AS f6
  FROM r)
SELECT class, tp, fp, fn, p6 AS precision, r6 AS recall, f6 AS f1
FROM r2
UNION ALL
SELECT '__macro__', sum(tp)::BIGINT, sum(fp)::BIGINT, sum(fn)::BIGINT,
       round_even(CAST(sum(p6::DECIMAL(18,6)) AS DOUBLE) / count(*), 6),
       round_even(CAST(sum(r6::DECIMAL(18,6)) AS DOUBLE) / count(*), 6),
       round_even(CAST(sum(f6::DECIMAL(18,6)) AS DOUBLE) / count(*), 6)
FROM r2
ORDER BY class
""")
def eval_classification_report(spark, sf):
    """Per-class + macro eval (ops/metrics.classification_report)
    over a planted 4-class task: an 80%-accurate predictor whose
    errors rotate into the NEXT class, with disjoint missing slices
    on each side (every-11th unpredicted, every-13th unjudged) so the
    half-missing fp/fn arms are exercised. The oracle replays the
    full-outer join, both projections, every per-class ratio, and the
    DECIMAL-summed macro averages."""
    from lamapi_spark.ops.metrics import classification_report

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    noisy = F.when((ok * 31 + ck) % 10 < 8, ok % 4).otherwise((ok + 1) % 4)
    pred = (o.filter(ok % 11 != 0)
            .select(ok.alias("k"),
                    F.concat(F.lit("c"), noisy).alias("label")))
    truth = (o.filter(ok % 13 != 0)
             .select(ok.alias("k"),
                     F.concat(F.lit("c"), ok % 4).alias("label")))
    return (classification_report(pred, truth, ["k"])
            .orderBy("class"))


# ------------------------------------------------- Cohen's kappa

@register("eval_cohen_kappa", """
WITH a AS (
  SELECT o_orderkey AS k, 'c' || (o_orderkey % 3) AS label FROM orders),
b AS (
  SELECT o_orderkey AS k,
         'c' || (CASE WHEN (o_orderkey * 17 + o_custkey) % 5 < 4
                      THEN o_orderkey % 3
                      ELSE (o_orderkey + 1) % 3 END) AS label
  FROM orders WHERE o_orderkey % 9 <> 0),
j AS (SELECT a.label AS la, b.label AS lb FROM a JOIN b USING (k)),
base AS (SELECT count(*)::BIGINT AS n,
                sum(CASE WHEN la = lb THEN 1 ELSE 0 END)::BIGINT
                  AS agree
         FROM j),
ma AS (SELECT la AS c, count(*)::BIGINT AS na FROM j GROUP BY la),
mb AS (SELECT lb AS c, count(*)::BIGINT AS nb FROM j GROUP BY lb),
pe AS (SELECT coalesce(sum(na * nb), 0)::BIGINT AS pe_num
       FROM ma JOIN mb USING (c))
SELECT n, agree, pe_num,
       round_even(CASE WHEN n * n - pe_num > 0
                  THEN (agree * n - pe_num)
                       / CAST(n * n - pe_num AS DOUBLE)
                  ELSE 0.0 END, 6) AS kappa
FROM base CROSS JOIN pe
""")
def eval_cohen_kappa(spark, sf):
    """Annotator agreement (ops/metrics.cohen_kappa) between the
    planted gold labeler and an 80%-agreeing second annotator whose
    disagreements rotate class, with every 9th item unlabeled by the
    second (inner-join semantics). The oracle replays the join, both
    marginal aggs, and the exact-integer kappa."""
    from lamapi_spark.ops.metrics import cohen_kappa

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    a = o.select(ok.alias("k"),
                 F.concat(F.lit("c"), ok % 3).alias("label"))
    noisy = F.when((ok * 17 + ck) % 5 < 4, ok % 3).otherwise((ok + 1) % 3)
    b = (o.filter(ok % 9 != 0)
         .select(ok.alias("k"),
                 F.concat(F.lit("c"), noisy).alias("label")))
    return cohen_kappa(a, b, ["k"])


# ------------------------------------------------- BIO export

@register("kg_bio_export", f"""
WITH {_TR_SQL},
toks AS (
  SELECT conv_id, turn_idx, (u.p)::INT AS pos, u.tok AS token FROM (
    SELECT conv_id, turn_idx,
           unnest(list_transform(range(1, len(ts) + 1),
                  i -> struct_pack(p := i, tok := ts[i]))) AS u
    FROM (SELECT conv_id, turn_idx,
                 string_split(trim(regexp_replace(lower(text),
                     '\\s+', ' ', 'g')), ' ') AS ts FROM tr))),
m AS (
  SELECT conv_id, turn_idx,
         CASE o4 WHEN 0 THEN 4 WHEN 1 THEN 5 ELSE 1 END AS start,
         CASE o4 WHEN 0 THEN 3 ELSE 1 END AS ntoken_span
  FROM (SELECT 'c' || o_custkey AS conv_id,
               (row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderkey))::INT AS turn_idx,
               (o_orderkey % 4)::INT AS o4
        FROM orders)
  WHERE o4 <> 2),
tags AS (
  SELECT conv_id, turn_idx, (start + o)::INT AS pos,
         min(CASE WHEN o = 0 THEN 'B' ELSE 'I' END) AS tag
  FROM m CROSS JOIN unnest(range(0, 4)) t(o)
  WHERE o < ntoken_span
  GROUP BY 1, 2, 3)
SELECT t.conv_id, t.turn_idx, t.pos, t.token,
       coalesce(g.tag, 'O') AS tag
FROM toks t LEFT JOIN tags g
  ON g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx
 AND g.pos = t.pos
ORDER BY t.conv_id, t.turn_idx, t.pos
""")
def kg_bio_export(spark, sf):
    """BIO sequence-labeling export (pipeline/exports.bio_export) over
    the planted transcript with template-derived spans: the 3-token
    'cX and sY' span (B I I), single-token spans at two other
    template slots, and the no-entity template left all-O. The oracle
    replays clean_str tokenization with 1-based positions, the span
    unroll with the B/I rule, and the O-fill left join."""
    from lamapi_spark.pipeline.exports import bio_export

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    base = o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        (F.col("o_orderkey") % 4).cast("int").alias("o4"))
    m = (base.filter(F.col("o4") != 2)
         .select("conv_id", "turn_idx",
                 F.when(F.col("o4") == 0, F.lit(4))
                 .when(F.col("o4") == 1, F.lit(5))
                 .otherwise(F.lit(1)).alias("start"),
                 F.when(F.col("o4") == 0, F.lit(3))
                 .otherwise(F.lit(1)).alias("ntoken_span")))
    return (bio_export(_transcripts(spark, sf), m)
            .orderBy("conv_id", "turn_idx", "pos"))


# ------------------------------------------------- reciprocal best match

@register("linkage_rbm", """
WITH p AS (
  SELECT 'L' || (o_custkey % 40) AS id_l,
         'R' || (o_orderkey % 50) AS id_r,
         ((o_orderkey * 13 + o_custkey) % 1000)::BIGINT AS score_bp
  FROM orders WHERE o_orderkey % 3 = 0),
d AS (SELECT id_l, id_r, max(score_bp)::BIGINT AS score_bp
      FROM p GROUP BY id_l, id_r),
bl AS (SELECT id_l, id_r, score_bp FROM (
         SELECT *, row_number() OVER (PARTITION BY id_l
             ORDER BY score_bp DESC, id_r ASC) AS rn FROM d)
       WHERE rn = 1),
br AS (SELECT id_l, id_r FROM (
         SELECT *, row_number() OVER (PARTITION BY id_r
             ORDER BY score_bp DESC, id_l ASC) AS rn FROM d)
       WHERE rn = 1)
SELECT bl.id_l, bl.id_r, bl.score_bp
FROM bl JOIN br ON bl.id_l = br.id_l AND bl.id_r = br.id_r
ORDER BY bl.id_l
""")
def linkage_rbm(spark, sf):
    """Reciprocal best match (ops/linkage.reciprocal_best_match) over
    a dense planted candidate grid (40 x 50 ids, LCG scores deduped
    to per-pair max): only mutual argmaxes survive, ties pinned to
    the smallest partner id. The oracle is the INDEPENDENT window
    formulation of both argmaxes — green pins the struct-min twins
    and the 1:1 property."""
    from lamapi_spark.ops.linkage import reciprocal_best_match

    o = load(spark, sf, "orders")
    p = (o.filter(F.col("o_orderkey") % 3 == 0)
         .select(F.concat(F.lit("L"),
                          F.col("o_custkey") % 40).alias("id_l"),
                 F.concat(F.lit("R"),
                          F.col("o_orderkey") % 50).alias("id_r"),
                 ((F.col("o_orderkey") * 13 + F.col("o_custkey"))
                  % 1000).cast("long").alias("score_bp"))
         .groupBy("id_l", "id_r")
         .agg(F.max("score_bp").alias("score_bp")))
    return reciprocal_best_match(p).orderBy("id_l")


# ------------------------------------------------- ROC AUC

@register("eval_auc", """
WITH s AS (
  SELECT (o_orderkey % 1000)::DOUBLE AS v,
         CASE WHEN (o_orderkey * 7 + o_custkey) % 1000
                   < (o_orderkey % 1000)
              THEN 1 ELSE 0 END AS y
  FROM orders),
per AS (SELECT v, count(*)::BIGINT AS c, sum(y)::BIGINT AS p
        FROM s GROUP BY v),
w AS (SELECT *, coalesce(sum(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0)::BIGINT AS lt
      FROM per),
a AS (SELECT coalesce(sum(p), 0)::BIGINT AS np,
             coalesce(sum(c - p), 0)::BIGINT AS nn,
             coalesce(sum(p * (2 * lt + c + 1)), 0)::BIGINT AS s2
      FROM w)
SELECT np AS n_pos, nn AS n_neg, (s2 - np * (np + 1))::BIGINT AS u2,
       round_even(CASE WHEN np > 0 AND nn > 0
                       THEN (s2 - np * (np + 1)) / (2.0 * np * nn)
                  ELSE 0.0 END, 6) AS auc
FROM a
""")
def eval_auc(spark, sf):
    """ROC AUC (ops/metrics.auc_roc) of a planted near-calibrated
    scorer: score = orderkey % 1000 (15 rows per distinct score at
    sf0.01 — the tie correction is load-bearing), label drawn from an
    LCG residue with P(pos) rising linearly in the score. The Spark
    side computes the tie-exact pairwise-count 2U via the two-level
    scan (distinct-score group-by, bucket prefix + within-bucket
    running negatives — no global window); the oracle is the
    INDEPENDENT rank-sum identity sum_pos(2*midrank) - np*(np+1) over
    a naive global cumulative — green proves both classical AUC
    formulations agree to the last integer."""
    from lamapi_spark.ops.metrics import auc_roc

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    s = o.select(
        (ok % 1000).cast("double").alias("score"),
        F.when((ok * 7 + ck) % 1000 < ok % 1000, 1)
        .otherwise(0).alias("label"))
    return auc_roc(s, "score", "label", n_buckets=64)


# ------------------------------------------------- corpus BLEU

def _bleu_gram_sql(t: str, n: int) -> str:
    joined = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(n))
    return (f"list_transform(range(1, greatest(len({t}) - {n - 1}, 0)"
            f" + 1), i -> '{n}|' || {joined})")


_BLEU_OK = " AND ".join(
    f"total_{n} > 0 AND match_{n} > 0" for n in range(1, 5))
_BLEU_LOG = " + ".join(
    f"ln(match_{n} / CAST(total_{n} AS DOUBLE))" for n in range(1, 5))


@register("eval_bleu", f"""
WITH t AS (
  SELECT doc_id AS id,
         string_split_regex(trim(lower(text)), '\\s+') AS ft
  FROM documents),
t2 AS (SELECT id, ft[1:(3 * len(ft)) // 5] AS ct, ft AS rt FROM t),
g AS (SELECT id,
        flatten([{_bleu_gram_sql('ct', 1)}, {_bleu_gram_sql('ct', 2)},
                 {_bleu_gram_sql('ct', 3)}, {_bleu_gram_sql('ct', 4)}])
          AS cg,
        flatten([{_bleu_gram_sql('rt', 1)}, {_bleu_gram_sql('rt', 2)},
                 {_bleu_gram_sql('rt', 3)}, {_bleu_gram_sql('rt', 4)}])
          AS rg
      FROM t2),
cc AS (SELECT id, g AS gram, count(*)::BIGINT AS cnt
       FROM (SELECT id, unnest(cg) AS g FROM g) GROUP BY id, g),
rc AS (SELECT id, g AS gram, count(*)::BIGINT AS cnt
       FROM (SELECT id, unnest(rg) AS g FROM g) GROUP BY id, g),
m AS (SELECT left(cc.gram, 1)::INT AS n,
             sum(least(cc.cnt, rc.cnt))::BIGINT AS m
      FROM cc JOIN rc ON cc.id = rc.id AND cc.gram = rc.gram
      GROUP BY 1),
tot AS (SELECT sum(len(ct))::BIGINT AS cand_len,
               sum(len(rt))::BIGINT AS ref_len,
               {', '.join(
                   f'sum(greatest(len(ct) - {n - 1}, 0))::BIGINT'
                   f' AS total_{n}' for n in range(1, 5))}
        FROM t2),
mw AS (SELECT {', '.join(
           f'coalesce(sum(CASE WHEN n = {n} THEN m END), 0)::BIGINT'
           f' AS match_{n}' for n in range(1, 5))}
       FROM m)
SELECT cand_len, ref_len, total_1, total_2, total_3, total_4,
       match_1, match_2, match_3, match_4,
       round_even(CASE WHEN cand_len > 0 AND {_BLEU_OK}
                  THEN (CASE WHEN cand_len > ref_len THEN 1.0
                        ELSE exp(1.0 - ref_len
                                 / CAST(cand_len AS DOUBLE)) END)
                       * exp(({_BLEU_LOG}) / 4)
                  ELSE 0.0 END, 6) AS bleu
FROM tot CROSS JOIN mw
""")
def eval_bleu(spark, sf):
    """Corpus BLEU-4 (ops/metrics.bleu_corpus) over planted
    generation pairs: candidate = the first 3/5 tokens of each
    document, reference = the full text — candidates shorter than
    references, so the brevity penalty arm (exp(1 - r/c) < 1) is
    load-bearing, while prefix grams keep every match level nonzero.
    The oracle replays tokenization, the flattened 4-level "n|gram"
    encoding, the clipped per-pair join, both corpus rollups, and the
    fixed-order BP * exp(mean ln p_n) expression."""
    from lamapi_spark.ops.metrics import bleu_corpus

    docs = load(spark, sf, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    clen = F.floor(F.size(toks) * 3 / 5).cast("int")
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.concat_ws(" ", F.slice(toks, F.lit(1), clen)).alias("cand"),
        F.col("text").alias("ref"))
    return bleu_corpus(pairs, "pair_id", "cand", "ref", max_n=4)


# ------------------------------------------------- Fleiss' kappa

@register("eval_fleiss_kappa", """
WITH r AS (
  SELECT o_orderkey AS i,
         'c' || (CASE WHEN (o_orderkey * (j + 3) + o_custkey) % 10 < 7
                      THEN o_orderkey % 3
                      ELSE (o_orderkey + 1) % 3 END) AS l
  FROM orders CROSS JOIN unnest(range(0, 5)) t(j)
  WHERE (o_orderkey + j * 7) % 17 <> 0),
kept AS (SELECT i FROM r GROUP BY i HAVING count(*) = 5),
k AS (SELECT r.i, r.l FROM r JOIN kept USING (i)),
nij AS (SELECT i, l, count(*)::BIGINT AS n FROM k GROUP BY i, l),
s AS (SELECT coalesce(sum(n * n), 0)::BIGINT AS s2,
             count(DISTINCT i)::BIGINT AS n_items FROM nij),
tt AS (SELECT coalesce(sum(t * t), 0)::BIGINT AS t2
       FROM (SELECT sum(n)::BIGINT AS t FROM nij GROUP BY l)),
f AS (SELECT n_items, s2, t2, (n_items * 5)::HUGEINT AS nn
      FROM s CROSS JOIN tt)
SELECT n_items, 5 AS n_raters, s2, t2,
       round_even(CASE WHEN nn * 4 * (nn * nn - t2::HUGEINT) <> 0
                  THEN CAST(nn * nn * (s2::HUGEINT - nn)
                            - nn * 4 * t2::HUGEINT AS DOUBLE)
                       / CAST(nn * 4 * (nn * nn - t2::HUGEINT)
                              AS DOUBLE)
                  ELSE 0.0 END, 6) AS kappa
FROM f
""")
def eval_fleiss_kappa(spark, sf):
    """Multi-rater agreement (ops/metrics.fleiss_kappa) over a
    planted 5-rater panel: each rater agrees with the gold class 70%
    of the time (disagreements rotate), and every 17th (item, rater)
    slot is unrated so ~27% of items fall short of 5 ratings and are
    dropped by the constant-n filter — the filter is load-bearing.
    The oracle replays the panel synth, the HAVING count = 5 filter,
    both count rollups, and the exact-integer kappa identity in
    HUGEINT (the twin of the Spark side's DECIMAL(38,0))."""
    from lamapi_spark.ops.metrics import fleiss_kappa

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    r = (o.select(ok.alias("i"), ck.alias("_ck"),
                  F.explode(F.array(*[F.lit(j) for j in range(5)]))
                  .alias("j"))
         .filter((F.col("i") + F.col("j") * 7) % 17 != 0))
    lbl = F.concat(F.lit("c"), F.when(
        (F.col("i") * (F.col("j") + 3) + F.col("_ck")) % 10 < 7,
        F.col("i") % 3).otherwise((F.col("i") + 1) % 3))
    ratings = r.select("i", lbl.alias("label"))
    return fleiss_kappa(ratings, "i", "label", n_raters=5)


# ------------------------------------------------- token-level WER

@register("eval_wer", """
WITH s AS (
  SELECT o_orderkey AS id,
         array_to_string(list_transform(
             range(1, (o_orderkey % 7 + 2) + 1),
             p -> chr((48 + (o_orderkey * (p + 2) + o_custkey) % 8)
                      ::INT)),
           '') AS hs,
         array_to_string(list_transform(
             range(1, (o_orderkey % 5 + 3) + 1),
             p -> chr((48 + (o_orderkey * p + o_custkey) % 8)::INT)),
           '') AS rs
  FROM orders)
SELECT id, len(hs)::BIGINT AS hyp_n, len(rs)::BIGINT AS ref_n,
       levenshtein(hs, rs)::BIGINT AS dist,
       round_even(levenshtein(hs, rs) / CAST(len(rs) AS DOUBLE), 6)
         AS wer
FROM s ORDER BY id
""")
def eval_wer(spark, sf):
    """Token-level word error rate (ops/metrics.wer_scores) over
    planted transcript pairs drawn from an 8-token vocabulary
    (w0..w7, 2-8 hypothesis tokens vs 3-7 reference tokens per
    order). The oracle maps each token to ONE character through the
    bijection wK <-> chr(48+K) — edit distance depends only on the
    equality pattern, so DuckDB's built-in char-level levenshtein()
    is an INDEPENDENT dynamic program computing the identical
    token-level distance; green proves the nested in-row fold matches
    a native DP cell for cell across 15k pairs."""
    from lamapi_spark.ops.metrics import wer_scores

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")

    def words(n_expr, mult_off):
        return F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), n_expr),
            lambda p: F.concat(F.lit("w"),
                               (ok * (p + mult_off) + ck) % 8)))

    pairs = o.select(ok.alias("pair_id"),
                     words(ok % 7 + 2, 2).alias("hyp"),
                     words(ok % 5 + 3, 0).alias("ref"))
    return wer_scores(pairs).orderBy("id")


@register("eval_wer_vec", """
WITH s AS (
  SELECT o_orderkey AS id,
         array_to_string(list_transform(
             range(1, (o_orderkey % 7 + 2) + 1),
             p -> chr((48 + (o_orderkey * (p + 2) + o_custkey) % 8)
                      ::INT)),
           '') AS hs,
         array_to_string(list_transform(
             range(1, (o_orderkey % 5 + 3) + 1),
             p -> chr((48 + (o_orderkey * p + o_custkey) % 8)::INT)),
           '') AS rs
  FROM orders)
SELECT id, len(hs)::BIGINT AS hyp_n, len(rs)::BIGINT AS ref_n,
       levenshtein(hs, rs)::BIGINT AS dist,
       round_even(levenshtein(hs, rs) / CAST(len(rs) AS DOUBLE), 6)
         AS wer
FROM s ORDER BY id
""")
def eval_wer_vec(spark, sf):
    """The Arrow-batched numpy arm of wer_scores (engine='pandas',
    round-5 BENCH crossover: ~7x the interpreted fold) against the
    IDENTICAL independent DuckDB oracle as eval_wer — green proves
    the vectorized DP (prefix-min identity) matches a native
    char-level levenshtein cell for cell across 15k pairs."""
    from lamapi_spark.ops.metrics import wer_scores

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")

    def words(n_expr, mult_off):
        return F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), n_expr),
            lambda p: F.concat(F.lit("w"),
                               (ok * (p + mult_off) + ck) % 8)))

    pairs = o.select(ok.alias("pair_id"),
                     words(ok % 7 + 2, 2).alias("hyp"),
                     words(ok % 5 + 3, 0).alias("ref"))
    return wer_scores(pairs, engine="pandas").orderBy("id")


# ------------------------------------------------- isotonic calibration

@register("link_isotonic", """
WITH s AS (
  SELECT (o_orderkey % 1000) / 1000.0 AS score,
         CASE WHEN (o_orderkey * 7 + o_custkey) % 1000 <
                   (o_orderkey % 1000)
                   - (CASE WHEN o_orderkey % 1000 >= 500
                            AND o_orderkey % 1000 < 600
                           THEN 350 ELSE 0 END)
              THEN 1 ELSE 0 END AS y
  FROM orders),
cells AS (
  SELECT least(floor(score * 10), 9)::INT AS bin,
         count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
  FROM s GROUP BY 1),
packed AS (
  SELECT list(struct_pack(bin := bin, pos := pos, n := n)
              ORDER BY bin) AS c
  FROM cells),
pre AS (
  SELECT c, len(c) AS m,
         [0::BIGINT] || list_transform(range(1, len(c) + 1),
             k -> list_sum(list_transform(c[1:k], e -> e.pos))) AS p,
         [0::BIGINT] || list_transform(range(1, len(c) + 1),
             k -> list_sum(list_transform(c[1:k], e -> e.n))) AS nn
  FROM packed),
iso AS (
  SELECT unnest(list_transform(range(1, m + 1), i -> struct_pack(
    bin := c[i].bin, n := c[i].n, pos := c[i].pos,
    fit := list_reduce(
      list_transform(range(1, i + 1), j -> list_reduce(
        list_transform(range(i, m + 1), k -> struct_pack(
            num := p[k + 1] - p[j], den := nn[k + 1] - nn[j])),
        (a, x) -> CASE WHEN x.num * a.den < a.num * x.den
                       THEN x ELSE a END)),
      (a2, x2) -> CASE WHEN x2.num * a2.den > a2.num * x2.den
                       THEN x2 ELSE a2 END)))) AS r
  FROM pre)
SELECT r.bin AS bin, r.n AS n, r.pos AS pos,
       round_even(r.pos / CAST(r.n AS DOUBLE), 6) AS rate_raw,
       round_even(r.fit.num / CAST(r.fit.den AS DOUBLE), 6) AS rate_iso
FROM iso ORDER BY bin
""")
def link_isotonic(spark, sf):
    """Isotonic (PAV) calibration map (ops/metrics.isotonic_calibration)
    over the planted near-calibrated scorer WITH a planted dip: bin 5's
    positive rate is suppressed by 350/1000, violating monotonicity so
    the pool-adjacent-violators merge is load-bearing. Both engines bin
    through the IDENTICAL double expression floor(score*10) (the
    0.3*10 = 2.9999... IEEE edge makes an integer-division shortcut
    diverge — pinned here by construction). The oracle replays the
    exact-rational minimax (max over j <= i of min over k >= i of the
    pooled (pos, n) rate, BIGINT cross-multiplication comparisons) in
    DuckDB list lambdas — green proves the in-row fold computes the
    exact PAV fit."""
    from lamapi_spark.ops.metrics import isotonic_calibration

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    r = ok % 1000
    dip = F.when((r >= 500) & (r < 600), 350).otherwise(0)
    s = o.select((r / 1000.0).alias("score"),
                 F.when((ok * 7 + ck) % 1000 < r - dip, 1)
                 .otherwise(0).alias("label"))
    return isotonic_calibration(s, n_bins=10).orderBy("bin")


# ------------------------------------------------- CUSUM changepoints

@register("events_cusum", """
WITH feed AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT 'shift', make_timestamp((1704067200
      + ((event_id // 10) % 15) * 86400 + 3600) * 1000000)
  FROM events WHERE event_id % 10 = 1
  UNION ALL
  SELECT 'shift', make_timestamp((1704067200
      + (15 + (event_id // 10) % 15) * 86400 + 3600) * 1000000)
  FROM events WHERE event_id % 10 < 2
  UNION ALL
  SELECT 'drop', make_timestamp((1704067200
      + ((event_id // 10) % 15) * 86400 + 3600) * 1000000)
  FROM events WHERE event_id % 10 < 2
  UNION ALL
  SELECT 'drop', make_timestamp((1704067200
      + (15 + (event_id // 10) % 15) * 86400 + 3600) * 1000000)
  FROM events WHERE event_id % 20 = 1),
cnt AS (SELECT event_type AS key,
               epoch_us(ts) // 86400000000 AS bin,
               count(*)::BIGINT AS cnt
        FROM feed GROUP BY 1, 2),
span AS (SELECT key, min(bin) AS lo, max(bin) AS hi FROM cnt
         GROUP BY key),
grid AS (SELECT key, unnest(range(lo, hi + 1)) AS bin FROM span),
dense AS (SELECT g.key, g.bin, coalesce(c.cnt, 0)::BIGINT AS cnt
          FROM grid g LEFT JOIN cnt c
            ON c.key = g.key AND c.bin = g.bin),
rn AS (SELECT key, bin, cnt,
              row_number() OVER (PARTITION BY key ORDER BY bin) AS t
       FROM dense),
base AS (SELECT key, sum(cnt)::BIGINT AS bs, count(*)::BIGINT AS bn
         FROM rn WHERE t <= 7 GROUP BY key),
a AS (SELECT rn.*, base.bs, 10000 * base.bn AS d
      FROM rn JOIN base USING (key)),
c AS (SELECT *,
   sum(CASE WHEN t > 7 THEN cnt * d - bs * 13000 END)
     OVER (PARTITION BY key ORDER BY t) AS cu,
   sum(CASE WHEN t > 7 THEN bs * 7000 - cnt * d END)
     OVER (PARTITION BY key ORDER BY t) AS cd
   FROM a),
m AS (SELECT *, min(cu) OVER (PARTITION BY key ORDER BY t) AS mcu,
             min(cd) OVER (PARTITION BY key ORDER BY t) AS mcd
      FROM c),
f AS (SELECT key, bin, cnt, t, bs,
      (CASE WHEN t > 7 THEN cu - least(0, mcu) ELSE 0 END)::BIGINT
        AS su,
      (CASE WHEN t > 7 THEN cd - least(0, mcd) ELSE 0 END)::BIGINT
        AS sd
      FROM m)
SELECT key, bin, cnt, su, sd,
       (t > 7 AND su > 20000 * bs) AS alarm_up,
       (t > 7 AND sd > 20000 * bs) AS alarm_dn
FROM f ORDER BY key, bin
""")
def events_cusum(spark, sf):
    """Two-sided CUSUM changepoints (ops/temporal.cusum_changepoints,
    daily bins, 7-bin baseline, 30% slack, h = 2*mu0) over the real
    event feed plus two planted keys: 'shift' doubles its ~67/day
    rate to ~133/day on day 15 (no single bin is a 2x spike vs its
    trailing window once the shift settles — the case burst gates
    miss), and 'drop' halves ~133/day to ~33/day — exercising the
    downward arm. The Spark side runs the max(0, s + incr) recurrence
    as an in-row fold over the span-bounded array; the oracle is the
    INDEPENDENT closed form S_t = C_t - min(0, running-min C) over
    window prefix sums — green proves recurrence and closed form
    agree integer for integer on every dense bin."""
    from lamapi_spark.ops.temporal import cusum_changepoints

    e = load(spark, sf, "events").select("event_id", "event_type", "ts")
    eid = F.col("event_id")
    day15 = F.floor(eid / 10).cast("long") % 15

    def planted(name, day_expr, cond):
        return (e.filter(cond)
                .select(F.lit(name).alias("event_type"),
                        F.timestamp_seconds(
                            F.lit(1704067200) + day_expr * 86400
                            + 3600).alias("ts")))

    feed = (e.select("event_type", "ts")
            .unionByName(planted("shift", day15, eid % 10 == 1))
            .unionByName(planted("shift", day15 + 15, eid % 10 < 2))
            .unionByName(planted("drop", day15, eid % 10 < 2))
            .unionByName(planted("drop", day15 + 15, eid % 20 == 1)))
    return (cusum_changepoints(feed, key_col="event_type", ts_col="ts",
                               bin_s=86400, baseline_bins=7,
                               k_bp=3000, h_bp=20000)
            .orderBy("key", "bin"))


# ------------------------------------------------- G2 collocations

def _xlx_sql(x: str) -> str:
    return (f"(CASE WHEN {x} > 0 THEN CAST({x} AS DOUBLE)"
            f" * ln(CAST({x} AS DOUBLE)) ELSE 0.0 END)")


_G2_TERMS = " + ".join([
    _xlx_sql("c12"), _xlx_sql("c1 - c12"), _xlx_sql("c2 - c12"),
    _xlx_sql("n - c1 - c2 + c12"),
]) + " - " + " - ".join([
    _xlx_sql("c1"), _xlx_sql("n - c1"),
    _xlx_sql("c2"), _xlx_sql("n - c2"),
]) + " + " + _xlx_sql("n")


@register("corpus_collocations", f"""
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS ts
  FROM documents),
g AS (
  SELECT unnest(list_transform(range(1, greatest(len(ts) - 1, 0) + 1),
                i -> ts[i] || ' ' || ts[i + 1])) AS g
  FROM toks),
p AS (SELECT string_split(g, ' ')[1] AS w1,
             string_split(g, ' ')[2] AS w2,
             count(*)::BIGINT AS c12
      FROM g GROUP BY 1, 2),
l AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM p GROUP BY w1),
r AS (SELECT w2, sum(c12)::BIGINT AS c2 FROM p GROUP BY w2),
t AS (SELECT sum(c12)::BIGINT AS n FROM p),
b AS (SELECT p.w1, p.w2, p.c12, l.c1, r.c2, t.n
      FROM p JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
      WHERE p.c12 >= 5)
SELECT w1, w2, c12, c1, c2, n,
       round_even(2.0 * ({_G2_TERMS}), 6) AS g2
FROM b ORDER BY w1, w2
""")
def corpus_collocations(spark, sf):
    """Dunning G2 bigram collocations (ops/corpus.collocations_g2,
    min_count=5) over the documents corpus — marginals aggregated
    from the bigram counts themselves (position-1 / position-2
    sums), the 2x2 contingency in xlogx form as one fixed-order
    float expression. The oracle replays tokenization, the bigram
    census, both marginals, the min_count prune, and every xlx term
    in the same association order."""
    from lamapi_spark.ops.corpus import collocations_g2

    docs = load(spark, sf, "documents")
    return (collocations_g2(docs, "text", min_count=5)
            .orderBy("w1", "w2"))


# ------------------------------------------------- degree assortativity

@register("graph_assortativity", """
WITH base AS (
  SELECT 'c' || o_custkey AS a, 's' || l_suppkey AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
sym AS (SELECT a AS x, b AS y FROM base
        UNION SELECT b AS x, a AS y FROM base),
deg AS (SELECT x, count(*)::BIGINT AS d FROM sym GROUP BY x),
e AS (SELECT dx.d AS dx, dy.d AS dy
      FROM sym JOIN deg dx ON dx.x = sym.x
               JOIN deg dy ON dy.x = sym.y),
a AS (SELECT count(*)::BIGINT AS m, sum(dx)::BIGINT AS sx,
             sum(dx * dx)::BIGINT AS sxx, sum(dx * dy)::BIGINT AS sxy
      FROM e)
SELECT m, sx, sxx, sxy,
       round_even(CASE WHEN m::HUGEINT * sxx - sx::HUGEINT * sx <> 0
                  THEN CAST(m::HUGEINT * sxy - sx::HUGEINT * sx
                            AS DOUBLE)
                       / CAST(m::HUGEINT * sxx - sx::HUGEINT * sx
                              AS DOUBLE)
                  ELSE 0.0 END, 6) AS r
FROM a
""")
def graph_assortativity(spark, sf):
    """Degree assortativity (ops/graph.degree_assortativity) of the
    repeat-trade graph (the k-core/modularity synth): bipartite
    customer-supplier wiring is structurally disassortative, so the
    sign of r is itself a check. The oracle replays symmetrization,
    degrees, both end joins, and the sqrt-free exact-integer Pearson
    identity in HUGEINT."""
    from lamapi_spark.ops.graph import degree_assortativity

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    base = (o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy(F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
                     F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"))
            .agg(F.count("*").alias("_w"))
            .filter(F.col("_w") >= 2)
            .select("a", "b"))
    return degree_assortativity(base)


# ------------------------------------------------- clustering coefficient

@register("graph_clustering", """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
pairs AS (
  SELECT a.p AS a, b.p AS b
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= 2),
deg AS (SELECT n, count(*)::BIGINT AS d FROM (
          SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs)
        GROUP BY n),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS n FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
tc AS (SELECT n, count(*)::BIGINT AS t FROM corners GROUP BY n)
SELECT deg.n AS node, deg.d AS degree,
       coalesce(tc.t, 0)::BIGINT AS triangles,
       round_even(2.0 * coalesce(tc.t, 0) / (deg.d * (deg.d - 1.0)), 6)
         AS cc
FROM deg LEFT JOIN tc ON tc.n = deg.n
WHERE deg.d >= 2 ORDER BY node
""")
def graph_clustering(spark, sf):
    """Local clustering coefficients
    (ops/graph.clustering_coefficient) over the parts-sharing graph
    (the triangle_counts synth — canonical pairs already collapse
    direction, so the op's canonicalization is a no-op here and
    degrees are unambiguous). Triangle-free degree->=2 nodes emit
    cc = 0 through the left join. The oracle counts triangles by the
    INDEPENDENT canonical a<b<c enumeration — two triangle algorithms
    must agree on every node's density."""
    from lamapi_spark.ops.graph import clustering_coefficient

    op = (load(spark, sf, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o"))
               & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") >= 2)
        .select("src", "dst")
    )
    return clustering_coefficient(pairs).orderBy("node")


# ------------------------------------------------- exact quantiles

@register("eval_exact_quantiles", """
WITH s AS (SELECT o_totalprice AS v FROM orders),
n AS (SELECT count(*)::BIGINT AS n FROM s),
t AS (SELECT q, greatest(1, ceil(q * n)::BIGINT) AS rk
      FROM (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
                           0.9::DOUBLE, 0.99::DOUBLE]) AS q)
      CROSS JOIN n),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM s)
SELECT t.q, t.rk, r.v AS value
FROM t JOIN r USING (rk) ORDER BY q
""")
def eval_exact_quantiles(spark, sf):
    """Exact order-price percentiles (ops/metrics.exact_quantiles)
    at q = .25/.5/.75/.9/.99. The Spark side selects ranks through
    the two-level scan (bucket prefix + within-bucket row_number —
    no global sort); the oracle is the INDEPENDENT naive global
    row_number — green proves the scan's rank-to-value map equals the
    global sort's at every requested rank."""
    from lamapi_spark.ops.metrics import exact_quantiles

    o = load(spark, sf, "orders").select(
        F.col("o_totalprice").alias("v"))
    return (exact_quantiles(o, "v", qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                            n_buckets=64)
            .orderBy("q"))


# ------------------------------------------------- decayed popularity

@register("events_decayed_counts", """
WITH cnt AS (
  SELECT 'u' || (user_id % 97) AS key,
         epoch_us(ts) // 86400000000 AS bin,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ao AS (SELECT max(bin) AS ao FROM cnt),
g AS (SELECT key, sum(cnt)::BIGINT AS n_events,
             max(bin)::BIGINT AS last_bin,
             list(struct_pack(b := bin, c := cnt) ORDER BY bin, cnt)
               AS a
      FROM cnt GROUP BY key)
SELECT key, n_events, last_bin,
       round_even(list_reduce(
         list_transform(g.a, e -> CAST(e.c AS DOUBLE)
             * pow(2.0, -CAST(ao.ao - e.b AS DOUBLE) / 7.0)),
         (x, y) -> x + y), 6) AS score
FROM g CROSS JOIN ao ORDER BY key
""")
def events_decayed_counts(spark, sf):
    """Recency-weighted per-user activity scores
    (ops/temporal.decayed_counts, daily bins, 7-day half-life) over
    the event feed keyed by user bucket. The Spark fold seeds 0.0 and
    adds terms in bin order; the oracle's list_reduce seeds the FIRST
    term — x + 0.0 is IEEE-exact, so both associations produce
    bit-identical doubles, hash-checked per key."""
    from lamapi_spark.ops.temporal import decayed_counts

    e = load(spark, sf, "events").select(
        F.concat(F.lit("u"), F.col("user_id") % 97).alias("key"), "ts")
    return (decayed_counts(e, key_col="key", ts_col="ts",
                           bin_s=86400, half_life_bins=7)
            .orderBy("key"))


# ------------------------------------------------- PSI drift

@register("corpus_psi_drift", """
WITH b AS (
  SELECT o_orderpriority AS category, count(*)::BIGINT AS c_base
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
n AS (
  SELECT o_orderpriority AS category, count(*)::BIGINT AS c_new
  FROM orders WHERE o_orderkey % 2 = 1
    AND NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 5 < 2)
  GROUP BY 1),
j AS (SELECT coalesce(b.category, n.category) AS category,
             coalesce(c_base, 0)::BIGINT AS c_base,
             coalesce(c_new, 0)::BIGINT AS c_new
      FROM b FULL OUTER JOIN n ON b.category = n.category),
t AS (SELECT sum(c_base)::BIGINT AS nb, sum(c_new)::BIGINT AS nn,
             count(*)::BIGINT AS v FROM j),
per AS (
  SELECT category, c_base, c_new,
         round_even(((c_base + 1) / CAST(nb + v AS DOUBLE)
                     - (c_new + 1) / CAST(nn + v AS DOUBLE))
                    * ln(((c_base + 1) / CAST(nb + v AS DOUBLE))
                         / ((c_new + 1) / CAST(nn + v AS DOUBLE))), 6)
           AS term
  FROM j CROSS JOIN t)
SELECT category, c_base, c_new, term FROM per
UNION ALL
SELECT '__total__', sum(c_base)::BIGINT, sum(c_new)::BIGINT,
       CAST(sum(term::DECIMAL(28,6)) AS DOUBLE)
FROM per ORDER BY category
""")
def corpus_psi_drift(spark, sf):
    """Categorical PSI (ops/metrics.psi_drift) between the even- and
    odd-orderkey halves of orders, with 40% of the odd half's
    1-URGENT rows dropped — the planted mix shift that drives the
    urgent category's term (and the total) well off zero while the
    untouched priorities sit near it. The oracle replays both counts,
    the union vocabulary, the add-1 smoothing, every per-category
    term, and the DECIMAL rollup."""
    from lamapi_spark.ops.metrics import psi_drift

    o = load(spark, sf, "orders")
    ok = F.col("o_orderkey")
    base = (o.filter(ok % 2 == 0)
            .select(F.col("o_orderpriority").alias("category")))
    new = (o.filter((ok % 2 == 1)
                    & ~((F.col("o_orderpriority") == "1-URGENT")
                        & (ok % 5 < 2)))
           .select(F.col("o_orderpriority").alias("category")))
    return psi_drift(base, new).orderBy("category")


# ------------------------------------------------- dyad census

@register("graph_dyads", """
WITH e AS (
  SELECT DISTINCT 'n' || (o_orderkey % 200) AS a,
                  'n' || ((o_orderkey * 7 + o_custkey) % 200) AS b
  FROM orders
  WHERE 'n' || (o_orderkey % 200)
        <> 'n' || ((o_orderkey * 7 + o_custkey) % 200)),
r AS (SELECT count(*)::BIGINT AS rr FROM e
      WHERE EXISTS (SELECT 1 FROM e e2
                    WHERE e2.a = e.b AND e2.b = e.a)),
n AS (SELECT count(DISTINCT x)::BIGINT AS n_nodes FROM (
        SELECT a AS x FROM e UNION ALL SELECT b FROM e)),
c AS (SELECT (SELECT count(*)::BIGINT FROM e) AS n_edges, rr, n_nodes
      FROM r CROSS JOIN n)
SELECT n_nodes, n_edges, (rr // 2)::BIGINT AS mutual,
       (n_edges - rr)::BIGINT AS asym,
       (n_nodes * (n_nodes - 1) // 2 - rr // 2
        - (n_edges - rr))::BIGINT AS nulls,
       round_even(CASE WHEN n_edges > 0
                  THEN rr / CAST(n_edges AS DOUBLE)
                  ELSE 0.0 END, 6) AS reciprocity
FROM c
""")
def graph_dyads(spark, sf):
    """Dyad census + reciprocity (ops/graph.dyad_census) of a planted
    200-node directed LCG graph (x -> 7x+cust mod 200 — dense enough
    that a fixed share of edges reciprocate). The oracle replays the
    distinct edge set, counts reciprocated edges by the INDEPENDENT
    EXISTS-subquery formulation (vs the op's flipped-pair semi-join),
    and recomputes every dyad bucket."""
    from lamapi_spark.ops.graph import dyad_census

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    e = o.select(F.concat(F.lit("n"), ok % 200).alias("src"),
                 F.concat(F.lit("n"), (ok * 7 + ck) % 200).alias("dst"))
    return dyad_census(e)


# ------------------------------------------------- turn latency

@register("conv_turn_latency", """
WITH t AS (
  SELECT 'c' || o_custkey AS conv_id,
         (row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderkey))::INT AS turn_idx,
         CASE o_orderkey % 3 WHEN 0 THEN 'user'
              WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         make_timestamp(1704067200000000
           + (row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderkey))
             * (row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderkey))
             * ((o_custkey % 7 + 1) * 1000)) AS ts
  FROM orders),
lat AS (
  SELECT role,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lat
  FROM t QUALIFY lat IS NOT NULL)
SELECT role, count(*)::BIGINT AS n, sum(lat)::BIGINT AS sum_us,
       (sum(lat) // count(*))::BIGINT AS mean_us,
       min(lat)::BIGINT AS min_us, max(lat)::BIGINT AS max_us
FROM lat GROUP BY role ORDER BY role
""")
def conv_turn_latency(spark, sf):
    """Per-role turn latencies (ops/temporal.turn_latency_stats) over
    a timestamped role transcript planted on orders: turn t of a
    conversation lands at t^2 * pace micros (pace = custkey-derived),
    so the latency of turn t is exactly (2t-1)*pace with no cumulative
    sum in the synth — and roles rotate user/assistant/tool on the
    orderkey, NOT the turn index, so each role sees a spread of
    latencies. The oracle is the INDEPENDENT lag-window formulation
    (vs the op's in-array consecutive pairing); stats are all exact
    integers."""
    from lamapi_spark.ops.temporal import turn_latency_stats

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    tn = F.row_number().over(w).cast("long")
    role = (F.when(ok % 3 == 0, "user")
            .when(ok % 3 == 1, "assistant").otherwise("tool"))
    t = o.select(
        F.concat(F.lit("c"), ck).alias("conv_id"),
        tn.cast("int").alias("turn_idx"), role.alias("role"),
        F.timestamp_micros(
            F.lit(1704067200000000)
            + tn * tn * ((ck % 7 + 1) * 1000)).alias("ts"))
    return (turn_latency_stats(t).orderBy("role"))


# ------------------------------------------------- grouped quantiles

@register("eval_grouped_quantiles", """
WITH s AS (SELECT o_orderpriority AS key, o_totalprice AS v
           FROM orders),
n AS (SELECT key, count(*)::BIGINT AS n FROM s GROUP BY key),
t AS (SELECT key, q, greatest(1, ceil(q * n)::BIGINT) AS rk
      FROM n CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE,
                                        0.99::DOUBLE]) AS q)),
r AS (SELECT key, v, row_number() OVER (PARTITION BY key
                                        ORDER BY v) AS rk FROM s)
SELECT t.key, t.q, t.rk, r.v AS value
FROM t JOIN r ON r.key = t.key AND r.rk = t.rk
ORDER BY t.key, q
""")
def eval_grouped_quantiles(spark, sf):
    """Per-priority order-price percentiles
    (ops/metrics.exact_quantiles_by, p50/p90/p99): the two-level scan
    nested under the group key — per-key bins, a per-key bin-prefix
    window bounded by n_buckets rows, within-(key, bin) row_numbers.
    The oracle is the INDEPENDENT per-key global row_number — green
    proves the nested scan's rank-to-value map equals a per-key full
    sort at every requested rank."""
    from lamapi_spark.ops.metrics import exact_quantiles_by

    o = load(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("key"),
        F.col("o_totalprice").alias("v"))
    return (exact_quantiles_by(o, "key", "v", qs=(0.5, 0.9, 0.99),
                               n_buckets=16)
            .orderBy("key", "q"))


# ------------------------------------------------- bootstrap CI

from lamapi_spark.ops.metrics import POISSON1_T48  # noqa: E402

_POIS_CASE = ("CASE " + " ".join(
    f"WHEN u < {t} THEN {k}" for k, t in enumerate(POISSON1_T48))
    + " ELSE 7 END")


@register("eval_bootstrap_ci", f"""
WITH s AS (
  SELECT o_orderkey::VARCHAR AS i,
         CASE WHEN (o_orderkey * 17 + o_custkey) % 100 < 85
              THEN 1 ELSE 0 END AS y
  FROM orders),
rep AS (SELECT i, y, b FROM s CROSS JOIN range(200) t(b)),
wts AS (
  SELECT b, y, {_POIS_CASE} AS w
  FROM (SELECT b, y,
               (('0x' || substr(md5(i || '|' || b), 1, 12))
                ::UBIGINT)::BIGINT AS u
        FROM rep)),
per AS (SELECT b, round_even(sum(w * y) / CAST(sum(w) AS DOUBLE), 6)
               AS a
        FROM wts GROUP BY b),
accs AS (SELECT list(a ORDER BY a) AS l FROM per),
pt AS (SELECT count(*)::BIGINT AS n_items,
              round_even(sum(y) / CAST(count(*) AS DOUBLE), 6) AS point
       FROM s)
SELECT n_items, point, 200 AS n_boot, l[5] AS lo, l[195] AS hi
FROM pt CROSS JOIN accs
""")
def eval_bootstrap_ci(spark, sf):
    """Poisson-bootstrap 95% CI (ops/metrics.bootstrap_ci, B = 200)
    on a planted 85%-accurate evaluator over orders. Every bootstrap
    weight is a shared deterministic draw — 48-bit md5(item|replica)
    uniform through the SAME integer Poisson(1) thresholds
    (POISSON1_T48) in both engines — so all 200 replica accuracies,
    the sorted percentile picks at ranks 5/195, and the point
    estimate hash-match exactly."""
    from lamapi_spark.ops.metrics import bootstrap_ci

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    s = o.select(ok.alias("item_id"),
                 F.when((ok * 17 + ck) % 100 < 85, 1)
                 .otherwise(0).alias("correct"))
    return bootstrap_ci(s, n_boot=200, alpha=0.05)


# ------------------------------------------------- McNemar

@register("eval_mcnemar", """
WITH t AS (SELECT o_orderkey AS k, o_orderkey % 4 AS label
           FROM orders),
a AS (SELECT o_orderkey AS k,
             CASE WHEN (o_orderkey * 7 + o_custkey) % 10 < 8
                  THEN o_orderkey % 4 ELSE (o_orderkey + 1) % 4 END
               AS label
      FROM orders),
b AS (SELECT o_orderkey AS k,
             CASE WHEN (o_orderkey * 11 + o_custkey) % 10 < 7
                  THEN o_orderkey % 4 ELSE (o_orderkey + 2) % 4 END
               AS label
      FROM orders),
j AS (SELECT (a.label = t.label)::INT AS ra,
             (b.label = t.label)::INT AS rb
      FROM t JOIN a USING (k) JOIN b USING (k)),
c AS (SELECT count(*)::BIGINT AS n,
             sum(ra * rb)::BIGINT AS both_right,
             sum((1 - ra) * (1 - rb))::BIGINT AS both_wrong,
             sum(ra * (1 - rb))::BIGINT AS a_only,
             sum((1 - ra) * rb)::BIGINT AS b_only
      FROM j)
SELECT n, both_right, both_wrong, a_only, b_only,
       round_even(CASE WHEN a_only + b_only > 0
                  THEN greatest(abs(a_only - b_only) - 1, 0)
                       * greatest(abs(a_only - b_only) - 1, 0)
                       / CAST(a_only + b_only AS DOUBLE)
                  ELSE 0.0 END, 6) AS chi2
FROM c
""")
def eval_mcnemar(spark, sf):
    """McNemar's paired comparison (ops/metrics.mcnemar_test) between
    a planted 80%-accurate model A and 70%-accurate model B on the
    same items — the discordant cells dominate in A's favor, so chi2
    lands far above the 3.84 significance line. The oracle replays
    both predictors, the pairing joins, all four cells, and the
    clamped continuity correction."""
    from lamapi_spark.ops.metrics import mcnemar_test

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    t = o.select(ok.alias("k"), (ok % 4).alias("label"))
    a = o.select(ok.alias("k"), F.when(
        (ok * 7 + ck) % 10 < 8, ok % 4).otherwise((ok + 1) % 4)
        .alias("label"))
    b = o.select(ok.alias("k"), F.when(
        (ok * 11 + ck) % 10 < 7, ok % 4).otherwise((ok + 2) % 4)
        .alias("label"))
    return mcnemar_test(a, b, t, ["k"])


# ------------------------------------------------- Bradley-Terry

_BT_K = 1_000_000 * 1_000_000
_BT_ITERS = 6


def _bt_round_sql(r: int) -> str:
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # each round references the previous round TWICE (wi, wj), so an
    # un-materialized 6-round unroll re-expands the whole chain 2^6
    # times and exhausts file handles re-scanning the base parquet.
    prev = f"w{r - 1}"
    return f"""
d{r} AS MATERIALIZED (SELECT s.i AS player,
                sum(s.n * {_BT_K} // greatest(wi.w + wj.w, 1))::BIGINT
                  AS d
         FROM sym s JOIN {prev} wi ON wi.player = s.i
                    JOIN {prev} wj ON wj.player = s.j
         GROUP BY s.i),
u{r} AS MATERIALIZED (SELECT d{r}.player,
                ((p.wins * {_BT_K}) // greatest(d{r}.d, 1))::BIGINT AS w
         FROM d{r} JOIN players p ON p.player = d{r}.player),
t{r} AS MATERIALIZED (SELECT sum(w)::BIGINT AS tot FROM u{r}),
w{r} AS MATERIALIZED (SELECT player,
                ((w * (np.np * 1000000)) // greatest(tot, 1))::BIGINT
                  AS w
         FROM u{r} CROSS JOIN t{r} CROSS JOIN np),"""


@register("eval_bradley_terry", f"""
WITH raw AS (
  SELECT o_orderkey % 8 AS p, (o_orderkey * 3 + 1) % 8 AS q,
         (o_orderkey * 7 + o_custkey) AS r
  FROM orders WHERE o_orderkey % 8 <> (o_orderkey * 3 + 1) % 8),
g AS (
  SELECT 'p' || (CASE WHEN r % (16 - p - q) < 8 - p THEN p ELSE q END)
           AS winner,
         'p' || (CASE WHEN r % (16 - p - q) < 8 - p THEN q ELSE p END)
           AS loser
  FROM raw),
wins AS (SELECT winner AS player, count(*)::BIGINT AS wins
         FROM g GROUP BY winner),
und AS (SELECT least(winner, loser) AS a, greatest(winner, loser) AS b,
               count(*)::BIGINT AS n
        FROM g GROUP BY 1, 2),
sym AS (SELECT a AS i, b AS j, n FROM und
        UNION ALL SELECT b AS i, a AS j, n FROM und),
players AS (SELECT t.player, coalesce(wins.wins, 0)::BIGINT AS wins
            FROM (SELECT DISTINCT i AS player FROM sym) t
            LEFT JOIN wins ON wins.player = t.player),
np AS (SELECT count(*)::BIGINT AS np FROM players),
w0 AS (SELECT player, 1000000::BIGINT AS w FROM players),
{"".join(_bt_round_sql(r) for r in range(1, _BT_ITERS + 1))}
gc AS (SELECT i AS player, sum(n)::BIGINT AS games FROM sym GROUP BY i)
SELECT p.player, p.wins, gc.games, w{_BT_ITERS}.w AS strength
FROM players p JOIN gc ON gc.player = p.player
JOIN w{_BT_ITERS} ON w{_BT_ITERS}.player = p.player
ORDER BY p.player
""")
def eval_bradley_terry(spark, sf):
    """Bradley-Terry leaderboard (ops/ranking.bradley_terry, 6 MM
    rounds) over a planted 8-player arena: player k has true strength
    8-k and each order stages a game whose winner is drawn by an
    exact integer residue against the strength odds — the fitted
    strengths must recover the planted ordering. The oracle unrolls
    the identical BIGINT MM rounds (opponent sums, integer-DIV
    updates, per-round normalization) CTE by CTE."""
    from lamapi_spark.ops.ranking import bradley_terry

    o = load(spark, sf, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    p, q = ok % 8, (ok * 3 + 1) % 8
    r = ok * 7 + ck
    pw = F.when(r % (16 - p - q) < 8 - p, p).otherwise(q)
    pl = F.when(r % (16 - p - q) < 8 - p, q).otherwise(p)
    g = (o.filter(p != q)
         .select(F.concat(F.lit("p"), pw).alias("winner"),
                 F.concat(F.lit("p"), pl).alias("loser")))
    return bradley_terry(g, iters=_BT_ITERS).orderBy("player")


# ------------------------------------------------- vocab richness

@register("corpus_vocab_richness", """
WITH tf AS (
  SELECT t, count(*)::BIGINT AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
    FROM documents)
  GROUP BY t),
a AS (SELECT coalesce(sum(c), 0)::BIGINT AS n_tokens,
             count(*)::BIGINT AS distinct_tokens,
             coalesce(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END),
                      0)::BIGINT AS f1,
             coalesce(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END),
                      0)::BIGINT AS f2
      FROM tf)
SELECT n_tokens, distinct_tokens, f1, f2,
       round_even(distinct_tokens
                  + (f1 * (f1 - 1)) / (2.0 * (f2 + 1)), 6) AS chao1,
       round_even(CASE WHEN n_tokens > 0
                  THEN 1.0 - f1 / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0 END, 6) AS coverage
FROM a
""")
def corpus_vocab_richness(spark, sf):
    """Chao1 unseen-vocabulary lower bound + Good-Turing seen-mass
    coverage (ops/textstats.vocab_richness) over the documents
    corpus — three integers off one frequency-of-frequencies pass.
    The oracle replays tokenization, the token census, and both
    estimators. NOTE the tokenization twin: ops/textstats._tokens
    splits lower(text) WITHOUT trim (documents have no edge
    whitespace; the oracle matches the op, not trim conventions
    elsewhere)."""
    from lamapi_spark.ops.textstats import vocab_richness

    return vocab_richness(load(spark, sf, "documents"))
