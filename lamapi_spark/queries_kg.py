"""Round-4 KG-construction contract queries: conversation-window
pronoun coreference (resolve + the cross-turn triples it unlocks),
N-Triples graph export, and deterministic label-propagation
communities — each with a DuckDB oracle that rebuilds the full
dataflow independently (registered into the queries.py registry).

The coref queries synthesize a deterministic transcript from the
orders table (conv per customer, turns ordered by orderkey, four text
templates planting entity tokens and pronouns) — both engines build
the identical transcript from the same parquet, per the repo's
planted-corpus discipline (queries_corpus.text_normalize et al.).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lamapi_spark.ops.graph import label_propagation, ntriples_lines
from lamapi_spark.pipeline.coref import (
    coref_resolve, coref_triples, token_occurrences,
)
from lamapi_spark.queries import load, register
from lamapi_spark.queries_graph import _EDGES_SQL, _edges

_ENT_RE = "^[cs][0-9]+$"
_PRONOUN_SQL = "('it','they','he','she','this','that','them','its')"
_MAX_TURNS = 10

# deterministic transcript synth: conv = customer, turn order = orderkey.
# Template 0 plants two entities; 1 opens with a pronoun (cross-turn
# resolution) then an entity; 2 is pronoun-only; 3 is entity-then-pronoun
# (same-turn resolution).
_TR_SQL = f"""
tr AS (
  SELECT 'c' || o_custkey AS conv_id,
         (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey))::INT
           AS turn_idx,
         CASE o_orderkey % 4
           WHEN 0 THEN 'user asked about c' || o_custkey || ' and s'
                       || (1 + o_orderkey % 10)
           WHEN 1 THEN 'it was handled by s' || (1 + o_orderkey % 10)
           WHEN 2 THEN 'they confirmed the schedule'
           ELSE 'c' || o_custkey || ' said this looked fine'
         END AS text
  FROM orders)"""

# tokenize with 1-based positions, keep entity/pronoun tokens only
_OCC_SQL = f"""
occ AS (
  SELECT conv_id, turn_idx, (u.p)::INT AS pos, u.tok FROM (
    SELECT conv_id, turn_idx,
           unnest(list_transform(range(1, len(toks) + 1),
                  i -> struct_pack(p := i, tok := toks[i]))) AS u
    FROM (SELECT conv_id, turn_idx,
                 string_split_regex(trim(text), '\\s+') AS toks FROM tr))),
cls AS (
  SELECT conv_id, turn_idx, pos,
         CASE WHEN regexp_matches(tok, '{_ENT_RE}') THEN tok END AS entity,
         CASE WHEN NOT regexp_matches(tok, '{_ENT_RE}')
              AND lower(tok) IN {_PRONOUN_SQL} THEN lower(tok) END AS pronoun
  FROM occ
  WHERE regexp_matches(tok, '{_ENT_RE}')
     OR lower(tok) IN {_PRONOUN_SQL})"""

# the one-window antecedent carry (IGNORE NULLS running last)
_RES_SQL = f"""
res AS (
  SELECT conv_id, turn_idx, pos, pronoun,
         last_value(CASE WHEN entity IS NOT NULL THEN
                      struct_pack(t := turn_idx, e := entity) END
                    IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx, pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a
  FROM cls),
resolved AS (
  SELECT conv_id, turn_idx, pos, pronoun,
         CASE WHEN a IS NOT NULL AND turn_idx - a.t <= {_MAX_TURNS}
              THEN a.e END AS antecedent,
         CASE WHEN a IS NOT NULL AND turn_idx - a.t <= {_MAX_TURNS}
              THEN a.t END AS antecedent_turn
  FROM res WHERE pronoun IS NOT NULL)"""


def _transcripts(spark, sf):
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    m4 = F.col("o_orderkey") % 4
    sx = (F.lit(1) + F.col("o_orderkey") % 10).cast("string")
    cust = F.col("o_custkey").cast("string")
    text = (
        F.when(m4 == 0, F.concat(F.lit("user asked about c"), cust,
                                 F.lit(" and s"), sx))
        .when(m4 == 1, F.concat(F.lit("it was handled by s"), sx))
        .when(m4 == 2, F.lit("they confirmed the schedule"))
        .otherwise(F.concat(F.lit("c"), cust, F.lit(" said this looked fine")))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        F.concat(F.lit("c"), cust).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        text.alias("text"))


@register("kg_coref_resolve", f"""
WITH {_TR_SQL}, {_OCC_SQL}, {_RES_SQL}
SELECT conv_id, turn_idx, pos, pronoun, antecedent, antecedent_turn
FROM resolved ORDER BY conv_id, turn_idx, pos
""")
def kg_coref_resolve(spark, sf):
    """Conversation-window pronoun coreference over the planted
    transcript: every pronoun occurrence resolves to the nearest
    preceding entity mention within max_turns=10 turns via ONE
    partitioned window (pipeline/coref.coref_resolve) — no transcript
    self-join. The oracle replays tokenization, classification, and
    the IGNORE-NULLS running carry independently."""
    occ = token_occurrences(_transcripts(spark, sf), _ENT_RE)
    return (coref_resolve(occ, max_turns=_MAX_TURNS)
            .orderBy("conv_id", "turn_idx", "pos"))


@register("kg_coref_triples", f"""
WITH {_EDGES_SQL}, {_TR_SQL}, {_OCC_SQL}, {_RES_SQL},
pairs AS (
  SELECT DISTINCT r.conv_id, r.turn_idx,
         CASE WHEN r.pos < m.pos THEN r.antecedent ELSE m.entity END AS subj,
         CASE WHEN r.pos < m.pos THEN m.entity ELSE r.antecedent END AS obj
  FROM resolved r JOIN cls m
    ON m.conv_id = r.conv_id AND m.turn_idx = r.turn_idx
  WHERE r.antecedent IS NOT NULL AND m.entity IS NOT NULL
    AND m.entity <> r.antecedent)
SELECT p.subj, 'linked_to' AS pred, p.obj, p.conv_id, p.turn_idx
FROM pairs p JOIN edges e ON e.src = p.subj AND e.dst = p.obj
ORDER BY conv_id, turn_idx, subj, obj
""")
def kg_coref_triples(spark, sf):
    """The cross-turn triples the coref pass unlocks: resolved
    pronouns stand in for their antecedents, pair with entity mentions
    in the pronoun's turn (earlier position = subject), and probe the
    symmetric customer-supplier edge set exactly like
    pipeline/triples.probe_edges. Every hop — transcript synth, coref
    window, pair build, edge probe — is replayed by the oracle."""
    tr = _transcripts(spark, sf)
    occ = token_occurrences(tr, _ENT_RE)
    resolved = coref_resolve(occ, max_turns=_MAX_TURNS)
    edges = _edges(spark, sf).select(
        F.col("src").alias("subj"), F.lit("linked_to").alias("pred"),
        F.col("dst").alias("obj"))
    return (coref_triples(resolved, occ, edges)
            .orderBy("conv_id", "turn_idx", "subj", "obj"))


# literal planting for the export: quote, backslash, newline, tab — the
# four ECHAR classes nt_escape exists for (CR is covered by the same
# replace chain; planting it would be invisible in sorted text anyway)
_LIT_SQL = r"""
lits AS (
  SELECT 'c' || c_custkey AS subj, 'comment' AS pred,
         CASE c_custkey % 4
           WHEN 0 THEN c_name || ' says "hi"'
           WHEN 1 THEN c_name || ' back\slash'
           WHEN 2 THEN c_name || chr(10) || 'line2' || chr(9) || 'tabbed'
           ELSE c_name
         END AS obj
  FROM customer)"""

# DuckDB single-quoted literals treat backslash literally, so '\' is
# one backslash and '\"' is backslash+quote — exactly the ECHAR forms
_NT_ESC_SQL = (
    r"""replace(replace(replace(replace(replace(obj,"""
    r""" '\', '\\'),"""
    r""" '"', '\"'),"""
    r""" chr(10), '\n'),"""
    r""" chr(13), '\r'),"""
    r""" chr(9), '\t')"""
)


@register("kg_ntriples", f"""
WITH {_EDGES_SQL}, {_LIT_SQL},
triples AS (
  SELECT src AS subj, 'linked_to' AS pred, dst AS obj FROM edges
  UNION ALL SELECT subj, pred, obj FROM lits)
SELECT subj, pred,
       CASE WHEN pred = 'comment' THEN
         '<http://kg.local/e/' || subj || '> <http://kg.local/p/' || pred
         || '> "' || {_NT_ESC_SQL} || '" .'
       ELSE
         '<http://kg.local/e/' || subj || '> <http://kg.local/p/' || pred
         || '> <http://kg.local/e/' || obj || '> .'
       END AS line
FROM triples ORDER BY line
""")
def kg_ntriples(spark, sf):
    """RDF N-Triples export of the constructed graph: resource triples
    (the symmetric edge set) plus literal attribute triples with
    PLANTED escape work (quotes, a backslash, a newline, a tab in
    customer comments). The oracle rebuilds every line including the
    ECHAR replace chain, so the escaping is checked character-for-
    character on both arms."""
    edges = _edges(spark, sf).select(
        F.col("src").alias("subj"), F.lit("linked_to").alias("pred"),
        F.col("dst").alias("obj"))
    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    m4 = F.col("c_custkey") % 4
    lit_obj = (
        F.when(m4 == 0, F.concat(F.col("c_name"), F.lit(' says "hi"')))
        .when(m4 == 1, F.concat(F.col("c_name"), F.lit(" back\\slash")))
        .when(m4 == 2, F.concat(F.col("c_name"),
                                F.lit("\nline2\ttabbed")))
        .otherwise(F.col("c_name"))
    )
    lits = c.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("subj"),
        F.lit("comment").alias("pred"), lit_obj.alias("obj"))
    return (ntriples_lines(edges.unionByName(lits), literal_pred="comment")
            .orderBy("line"))


_LP_ITER = 2


def _lp_round(k: int) -> str:
    prev = f"l{k - 1}"
    return f"""
v{k} AS (
  SELECT e.dst AS node, l.label, count(*) AS c
  FROM edges e JOIN {prev} l ON l.node = e.src GROUP BY 1, 2),
w{k} AS (
  SELECT node, label,
         row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
  FROM v{k}),
l{k} AS (
  SELECT n.node, coalesce(w.label, n.node) AS label
  FROM nodes n LEFT JOIN (SELECT node, label FROM w{k} WHERE rn = 1) w
    USING (node))"""


@register("graph_label_prop", f"""
WITH {_EDGES_SQL},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
l0 AS (SELECT node, node AS label FROM nodes),
{",".join(_lp_round(k + 1) for k in range(_LP_ITER))}
SELECT node, label FROM l{_LP_ITER} ORDER BY node
""")
def graph_label_prop(spark, sf):
    """Deterministic synchronous label propagation (2 rounds,
    plurality vote with count-desc/label-asc tie-break) over the
    symmetric customer-supplier graph — ops/graph.label_propagation.
    The oracle replays both rounds' votes and argmaxes CTE by CTE."""
    return (label_propagation(_edges(spark, sf), n_iter=_LP_ITER,
                              checkpoint_every=1)
            .orderBy("node"))


@register("kg_bgp_query", f"""
WITH {_EDGES_SQL},
t AS (
  SELECT src AS subj, 'linked_to' AS pred, dst AS obj FROM edges
  UNION ALL
  SELECT 'c' || c_custkey, 'name', c_name FROM customer),
p1 AS (SELECT obj AS s FROM t WHERE pred = 'linked_to' AND subj = 'c1'),
p2 AS (SELECT subj AS s, obj AS c FROM t WHERE pred = 'linked_to'),
p3 AS (SELECT subj AS c, obj AS n FROM t WHERE pred = 'name')
SELECT p1.s, p2.c, p3.n
FROM p1 JOIN p2 USING (s) JOIN p3 USING (c)
WHERE p2.c <> 'c1'
ORDER BY s, c
""")
def kg_bgp_query(spark, sf):
    """SPARQL-style basic-graph-pattern query over the materialized
    graph (ops/graph.bgp_match): the constant-anchored 2-hop
    conjunction ``c1 linked_to ?s . ?s linked_to ?c . ?c name ?n``
    with a ``?c != c1`` post-filter — the "who shares a supplier with
    customer c1, by name" question a KG consumer asks. The triple
    store is the symmetric edge set plus customer-name attribute
    triples; the oracle runs the same three pattern scans and
    equi-joins in SQL (bag semantics on both arms)."""
    from lamapi_spark.ops.graph import bgp_match

    edges = _edges(spark, sf).select(
        F.col("src").alias("subj"), F.lit("linked_to").alias("pred"),
        F.col("dst").alias("obj"))
    names = load(spark, sf, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("subj"),
        F.lit("name").alias("pred"), F.col("c_name").alias("obj"))
    triples = edges.unionByName(names)
    return (
        bgp_match(triples, [("c1", "linked_to", "?s"),
                            ("?s", "linked_to", "?c"),
                            ("?c", "name", "?n")])
        .filter(F.col("c") != "c1")
        .orderBy("s", "c")
    )


@register("link_eval", """
WITH truth AS (
  SELECT o_orderkey AS k, 'c' || o_custkey AS v,
         'g' || (o_orderkey % 3) AS s
  FROM orders),
pred AS (
  SELECT k, CASE WHEN k % 17 = 0 THEN 'x' ELSE v END AS v, s
  FROM truth WHERE k % 23 <> 0
  UNION ALL
  SELECT k + 10000000, v, s FROM truth WHERE k % 29 = 0),
j AS (
  SELECT coalesce(t.s, p.s) AS slice, p.v AS pv, t.v AS tv
  FROM pred p FULL OUTER JOIN truth t ON p.k = t.k),
agg AS (
  SELECT slice, count(pv)::BIGINT AS n_pred, count(tv)::BIGINT AS n_truth,
         sum(CASE WHEN pv = tv THEN 1 ELSE 0 END)::BIGINT AS tp
  FROM j GROUP BY slice),
pr AS (
  SELECT slice, n_pred, n_truth, tp,
         (n_pred - tp)::BIGINT AS fp, (n_truth - tp)::BIGINT AS fn,
         round_even(CASE WHEN n_pred > 0
                         THEN tp::DOUBLE / n_pred ELSE 0.0 END, 6)
           AS precision,
         round_even(CASE WHEN n_truth > 0
                         THEN tp::DOUBLE / n_truth ELSE 0.0 END, 6)
           AS recall
  FROM agg)
SELECT slice, n_pred, n_truth, tp, fp, fn, precision, recall,
       round_even(CASE WHEN precision + recall > 0
                       THEN 2.0 * precision * recall
                            / (precision + recall)
                       ELSE 0.0 END, 6) AS f1
FROM pr ORDER BY slice
""")
def link_eval(spark, sf):
    """Distributed P/R/F1 evaluation (ops/metrics.prf_eval) of a
    planted-error prediction frame against gold links derived from
    orders: every 17th key predicts the wrong entity, every 23rd is
    missing (recall loss), every 29th adds a spurious key (precision
    loss), sliced by orderkey%3. F1 derives from the ROUNDED P/R (the
    op's documented parity rule); the oracle replays the full outer
    join, all counts, and every rounded ratio."""
    from lamapi_spark.ops.metrics import prf_eval

    truth = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.concat(F.lit("c"), F.col("o_custkey")).alias("entity"),
        F.concat(F.lit("g"), F.col("o_orderkey") % 3).alias("grp"))
    pred = (
        truth.filter(F.col("k") % 23 != 0)
        .select("k", F.when(F.col("k") % 17 == 0, F.lit("x"))
                .otherwise(F.col("entity")).alias("entity"), "grp")
        .unionByName(truth.filter(F.col("k") % 29 == 0).select(
            (F.col("k") + 10_000_000).alias("k"), "entity", "grp"))
    )
    return (prf_eval(pred, truth, keys=["k"], value_col="entity",
                     slice_col="grp")
            .orderBy("slice"))


# --------------------------------------------- tool provenance edges

# transcript synth WITH the input contract's role/tool columns: tool
# turns (templates 1/2) carry a tool name and no entity token, so they
# must resolve to a PRIOR turn's entity.
_TRT_SQL = """
trt AS (
  SELECT 'c' || o_custkey AS conv_id,
         (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey))::INT
           AS turn_idx,
         CASE WHEN o_orderkey % 4 IN (1, 2) THEN 'tool'
              WHEN o_orderkey % 4 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         CASE o_orderkey % 4 WHEN 1 THEN 'search' WHEN 2 THEN 'lookup'
         END AS tool,
         CASE o_orderkey % 4
           WHEN 0 THEN 'user asked about c' || o_custkey || ' and s'
                       || (1 + o_orderkey % 10)
           WHEN 1 THEN 'ran against it'
           WHEN 2 THEN 'they confirmed the schedule'
           ELSE 'c' || o_custkey || ' said this looked fine'
         END AS text
  FROM orders)"""


def _trt(spark, sf):
    """The Spark twin of _TRT_SQL (one row per order: conv = customer,
    turn order = orderkey, roles/tools/entity plants per template)."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    m4 = F.col("o_orderkey") % 4
    return o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.when(m4.isin(1, 2), F.lit("tool"))
        .when(m4 == 0, F.lit("user")).otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(m4 == 1, F.lit("search"))
        .when(m4 == 2, F.lit("lookup")).alias("tool"),
        F.when(m4 == 0, F.concat(
            F.lit("user asked about c"), F.col("o_custkey"), F.lit(" and s"),
            (F.lit(1) + F.col("o_orderkey") % 10)))
        .when(m4 == 1, F.lit("ran against it"))
        .when(m4 == 2, F.lit("they confirmed the schedule"))
        .otherwise(F.concat(F.lit("c"), F.col("o_custkey"),
                            F.lit(" said this looked fine")))
        .alias("text"))


@register("kg_tool_edges", f"""
WITH {_TRT_SQL},
ent AS (
  SELECT conv_id, turn_idx, role, tool,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> regexp_matches(t, '{_ENT_RE}'))[1] AS e
  FROM trt),
res AS (
  SELECT conv_id, turn_idx, role, tool,
         last_value(CASE WHEN e IS NOT NULL THEN
                      struct_pack(t := turn_idx, e := e) END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a
  FROM ent)
SELECT conv_id, turn_idx, tool, a.e AS entity
FROM res
WHERE role = 'tool' AND a IS NOT NULL AND turn_idx - a.t <= 10
ORDER BY conv_id, turn_idx
""")
def kg_tool_edges(spark, sf):
    """Tool-invocation provenance over agent transcripts
    (pipeline/triples.tool_invocation_edges): every role='tool' turn
    resolves to the most recent prior-turn entity in its conversation
    (one last_value IGNORE NULLS window — the coref carry shape) and
    emits a (tool, invoked_after, entity) edge. Exercises the input
    contract's role/tool columns end to end; the oracle replays the
    synth, the first-entity extraction, and the window carry."""
    from lamapi_spark.pipeline.triples import tool_invocation_edges

    return (tool_invocation_edges(_trt(spark, sf), entity_re=_ENT_RE,
                                  max_turns_back=10)
            .orderBy("conv_id", "turn_idx"))


@register("transcript_stats", f"""
WITH {_TRT_SQL},
t AS (
  SELECT role, coalesce(tool, '-') AS tool, conv_id,
         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_toks,
         CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                        x -> regexp_matches(x, '{_ENT_RE}'))) > 0
              THEN 1 ELSE 0 END AS has_ent
  FROM trt)
SELECT role, tool, count(*)::BIGINT AS n_turns,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       sum(has_ent)::BIGINT AS n_entity_turns,
       round_even(avg(n_toks), 4) AS avg_tokens,
       GROUPING(role, tool)::BIGINT AS gid
FROM t GROUP BY ROLLUP (role, tool)
ORDER BY gid, role, tool
""")
def transcript_stats(spark, sf):
    """Conversation-shape analytics over the role/tool transcript in
    ONE rollup pass: per (role, tool) / per role / global — turn
    counts, conversations touched, entity-bearing-turn counts, mean
    turn length. The operations dashboard a 10^12-turn transcript
    store runs before pipelining; grouping ids are engine-portable
    (events_rollup precedent) and the tool NULL is pre-coalesced so
    the rollup NULL stays unambiguous."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = _trt(spark, sf).select(
        "role", F.coalesce("tool", F.lit("-")).alias("tool"), "conv_id",
        F.size(toks).cast("long").alias("n_toks"),
        (F.size(F.filter(toks, lambda x: x.rlike(_ENT_RE))) > 0)
        .cast("long").alias("has_ent"))
    return (
        t.rollup("role", "tool")
        .agg(F.count("*").alias("n_turns"),
             F.countDistinct("conv_id").alias("n_convs"),
             F.sum("has_ent").alias("n_entity_turns"),
             F.bround(F.avg("n_toks"), 4).alias("avg_tokens"),
             F.grouping_id().alias("gid"))
        .orderBy("gid", "role", "tool")
    )


@register("kg_window_cooc", f"""
WITH {_TR_SQL}, {_OCC_SQL},
o AS (
  SELECT DISTINCT conv_id, turn_idx, entity
  FROM cls WHERE entity IS NOT NULL),
p AS (
  SELECT a.entity AS subj, b.entity AS obj
  FROM o a JOIN o b
    ON a.conv_id = b.conv_id
   AND b.turn_idx - a.turn_idx BETWEEN 1 AND 2
   AND a.entity <> b.entity)
SELECT subj, obj, count(*)::BIGINT AS n_cooc
FROM p GROUP BY subj, obj ORDER BY subj, obj
""")
def kg_window_cooc(spark, sf):
    """Cross-turn entity co-occurrence counts per conversation window
    (pipeline/triples.window_cooccurrence, window = 2 turns) over the
    planted transcript — the north star's per-window co-occurrence
    mining as a direct miner. The Spark side runs the skew-safe
    bin-replicated equi-join; the oracle is the INDEPENDENT naive
    inequality self-join, so the binning's exactly-once emission is
    value-hash-checked pair for pair."""
    from lamapi_spark.pipeline.coref import token_occurrences
    from lamapi_spark.pipeline.triples import window_cooccurrence

    occ = (token_occurrences(_transcripts(spark, sf), _ENT_RE)
           .filter(F.col("entity").isNotNull())
           .select("conv_id", "turn_idx", "entity"))
    return (window_cooccurrence(occ, max_turns=2)
            .groupBy("subj", "obj")
            .agg(F.count("*").alias("n_cooc"))
            .orderBy("subj", "obj"))


# ------------------------------------------------- tool-sequence mining

_TOOLSEQ_SQL = """
trt AS (
  SELECT 'c' || o_custkey AS conv_id,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey)::INT AS turn_idx,
         CASE WHEN o_orderkey % 2 = 1 THEN 'tool' ELSE 'user' END AS role,
         CASE WHEN o_orderkey % 2 = 1 THEN
           ['search', 'lookup', 'calc', 'fetch'][(o_orderkey % 8 + 1) // 2]
         END AS tool
  FROM orders
),
seq AS (
  SELECT conv_id, list(tool ORDER BY turn_idx) AS tools
  FROM trt WHERE role = 'tool' AND tool IS NOT NULL GROUP BY conv_id
)"""


def _toolseq_gram_sql(k: int) -> str:
    return f"""
SELECT unnest(CASE WHEN len(tools) >= {k} THEN
         list_transform(range(1, len(tools) - {k} + 2),
                        i -> array_to_string(tools[i : i + {k} - 1], '>'))
       ELSE [] END) AS pattern, {k} AS k, conv_id
FROM seq"""


@register("kg_tool_ngrams", f"""
WITH {_TOOLSEQ_SQL},
grams AS ({_toolseq_gram_sql(2)} UNION ALL {_toolseq_gram_sql(3)})
SELECT pattern, k::INT AS k, count(DISTINCT conv_id)::BIGINT AS n_convs,
       count(*)::BIGINT AS n_occ
FROM grams GROUP BY pattern, k ORDER BY pattern, k
""")
def kg_tool_ngrams(spark, sf):
    """Frequent tool-invocation chains over agent transcripts
    (pipeline/triples.tool_sequence_ngrams): per-conversation ordered
    tool calls mined for 2- and 3-grams with conversation support and
    overlapping occurrence counts — the in-row slice-loop formulation
    (no exploded token shuffle; one agg per k). Synth rotates four tool
    names on odd turns; the oracle replays the sequence assembly and
    every gram count."""
    from lamapi_spark.pipeline.triples import tool_sequence_ngrams

    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    names = F.array(F.lit("search"), F.lit("lookup"),
                    F.lit("calc"), F.lit("fetch"))
    trt = o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.when(F.col("o_orderkey") % 2 == 1, F.lit("tool"))
        .otherwise(F.lit("user")).alias("role"),
        F.when(F.col("o_orderkey") % 2 == 1,
               F.element_at(names, ((F.col("o_orderkey") % 8 + 1) / 2)
                            .cast("int"))).alias("tool"))
    out2 = tool_sequence_ngrams(trt, k=2)
    out3 = tool_sequence_ngrams(trt, k=3)
    return out2.unionByName(out3).orderBy("pattern", "k")


@register("graph_modularity", f"""
WITH {_EDGES_SQL},
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
l0 AS (SELECT node, node AS label FROM nodes),
{",".join(_lp_round(k + 1) for k in range(_LP_ITER))},
comm AS (SELECT node, label FROM l{_LP_ITER}),
tot AS (SELECT count(*)::BIGINT AS e FROM edges),
deg AS (SELECT src AS node, count(*)::BIGINT AS d FROM edges GROUP BY src),
inn AS (
  SELECT ca.label, count(*)::BIGINT AS in_edges
  FROM edges e JOIN comm ca ON ca.node = e.src
               JOIN comm cb ON cb.node = e.dst
  WHERE ca.label = cb.label GROUP BY ca.label),
ds AS (
  SELECT c.label, count(*)::BIGINT AS n_nodes, sum(d.d)::BIGINT AS degree_sum
  FROM comm c JOIN deg d USING (node) GROUP BY c.label)
SELECT ds.label AS community, ds.n_nodes,
       coalesce(inn.in_edges, 0)::BIGINT AS in_edges, ds.degree_sum,
       CAST(round_even(1e9 * (coalesce(inn.in_edges, 0)::DOUBLE / t.e
                              - (ds.degree_sum::DOUBLE / t.e)
                                * (ds.degree_sum::DOUBLE / t.e)), 0)
            AS BIGINT) AS q_units
FROM ds LEFT JOIN inn USING (label) CROSS JOIN tot t
ORDER BY community
""")
def graph_modularity(spark, sf):
    """Newman modularity terms (ops/graph.modularity_terms) of the
    label-propagation partition over the symmetric customer-supplier
    graph — the acceptance metric for graph_label_prop's communities
    (sum(q_units)/1e9 is the global Q; > 0 beats the degree-preserving
    null model). Each term is one float expression over four corpus
    integers rounded half-even to BIGINT units; the oracle replays the
    LP rounds CTE by CTE and the whole modularity computation."""
    from lamapi_spark.ops.graph import label_propagation, modularity_terms

    edges = _edges(spark, sf)
    comm = label_propagation(edges, n_iter=_LP_ITER, checkpoint_every=1)
    return modularity_terms(edges, comm).orderBy("community")
