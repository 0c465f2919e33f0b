"""Graph analytics over materialized KG-style edges — degree stats,
fixed-iteration PageRank, and k-hop expansion, each with a DuckDB
oracle that rebuilds the full computation independently.

A KG-construction engine's output is a graph; these are the first
queries a consumer runs against it (the reference exposes the adjacency
through its predicates endpoint — these go one step further to whole-
graph statistics). The contract tables have no explicit graph, so the
edge set derives from orders ⋈ lineitem: customer c ordered from
supplier s, SYMMETRIZED (both directions) so the graph has real cycles
rather than a one-hop bipartite cascade. Node ids are 'c<custkey>' /
's<suppkey>' strings — the two key spaces overlap numerically.

PageRank is computed in INTEGER FIXED POINT (BIGINT units of 1e-9):
per-edge contributions are integer divisions and the combine is a
BIGINT sum — exact, order-independent, identical in any engine, so the
result is bit-reproducible across partitionings and hash-comparable
against the oracle. Float PageRank would make the per-node sum depend
on the combine order (doubles don't associate); DECIMAL division scale
rules differ between engines. The truncation error is < 1e-9 per edge
per iteration — far below any ranking-relevant difference. Bound: the
weighted sums stay under 2^63 while n_nodes * SCALE * 85 < 9.2e18,
i.e. ~1e8 nodes at SCALE=1e9; a larger graph drops SCALE or moves the
accumulator to DECIMAL(38,0).

Scale notes: the edge derivation is one shuffle join + a distinct that
reuses its partitioning; degree/PageRank aggregations shuffle on node
id (hot hubs are handled by AQE skew splitting — contributions are
pre-divided so the hot side carries fixed-width rows); each PageRank
iteration is one join + one aggregation, and a long-running job would
localCheckpoint per iteration exactly as pipeline/canonicalize.py does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lamapi_spark.queries import load, register

_SCALE = 10**9          # fixed-point unit: 1.0 == 1e9 units
_TELEPORT = 15 * _SCALE // 100   # (1-d) with d = 0.85, sum-to-N convention
_N_ITER = 3

# symmetric edge set, shared by all three queries (SQL + Spark twins)
# MATERIALIZED is load-bearing at sf0.1: DuckDB inlines plain CTEs per
# reference, and the iterative oracles below reference edges/nodes in
# every unrolled round — re-executing the orders x lineitem distinct
# join exponentially (the rag_mmr_rerank / Bradley-Terry lesson).
_EDGES_SQL = """
base AS MATERIALIZED (
  SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM base
  UNION ALL
  SELECT dst AS src, src AS dst FROM base
)"""


def _edges(spark, sf):
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # symmetrize AFTER a distinct on the (custkey, suppkey) INT pairs —
    # the "c"/"s" prefixes put the two endpoints in disjoint namespaces,
    # so distinct{(c,s)} ∪ its mirror == distinct of the symmetric
    # string multiset (verified exceptAll-empty both ways at sf0.1).
    # The dedup exchange then ships half the rows at int width instead
    # of the full exploded string edge list, and the explode itself
    # costs no shuffle (round-6 guide §2.3 "shuffle fewer bytes";
    # derivation noop 1.78s -> 0.8s). The earlier round-6 form (ONE
    # distinct after the explode, replacing the doubled
    # unionAll(base, base.flipped) subtree) is subsumed.
    pairs = (o.join(l, o.o_orderkey == l.l_orderkey)
             .select("o_custkey", "l_suppkey").distinct())
    c = F.concat(F.lit("c"), F.col("o_custkey"))
    s = F.concat(F.lit("s"), F.col("l_suppkey"))
    return (
        pairs.select(F.explode(F.array(
            F.struct(c.alias("src"), s.alias("dst")),
            F.struct(s.alias("src"), c.alias("dst")))).alias("_e"))
        .select("_e.src", "_e.dst")
    )


@register("graph_degree", f"""
WITH {_EDGES_SQL}
SELECT src AS node, count(*)::BIGINT AS degree,
       count(DISTINCT dst)::BIGINT AS n_neighbors
FROM edges GROUP BY src ORDER BY node
""")
def graph_degree(spark, sf):
    """Per-node degree + distinct-neighbor count over the symmetric
    edge set (degree == n_neighbors iff the edge derivation is already
    distinct — a structural invariant the oracle double-checks)."""
    return (
        _edges(spark, sf)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"),
             F.countDistinct("dst").alias("n_neighbors"))
        .orderBy("node")
    )


def _pagerank_iter_sql(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""
r{k} AS (
  SELECT n.node,
         CAST({_TELEPORT} + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.degree) AS s
    FROM edges e
    JOIN {prev} r ON r.node = e.src
    JOIN outdeg d ON d.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""


@register("graph_pagerank", f"""
WITH {_EDGES_SQL},
outdeg AS (SELECT src AS node, count(*)::BIGINT AS degree
           FROM edges GROUP BY src),
nodes AS (SELECT node FROM outdeg),
r0 AS (SELECT node, {_SCALE}::BIGINT AS rank FROM nodes),
{",".join(_pagerank_iter_sql(k) for k in range(1, _N_ITER + 1))}
SELECT node, rank AS rank_units FROM r{_N_ITER} ORDER BY node
""")
def graph_pagerank(spark, sf):
    """{_N_ITER} PageRank iterations (d=0.85, ranks sum ~N convention,
    rank'[v] = 0.15 + 0.85 * sum(rank[u]/deg[u] over in-edges)) through
    ops/graph.pagerank_fixed_point — BIGINT fixed point, per-iteration
    localCheckpoint (the cluster-scale lineage discipline; see the op's
    docstring). Symmetric edges mean every node has out-degree >= 1, so
    no dangling-mass term."""
    from lamapi_spark.ops.graph import pagerank_fixed_point

    rank = pagerank_fixed_point(_edges(spark, sf), n_iter=_N_ITER,
                                scale=_SCALE, damping_pct=85)
    return rank.select("node", F.col("rank").alias("rank_units")).orderBy("node")


@register("graph_components", """
WITH RECURSIVE base AS (
  SELECT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
  SELECT a AS src, b AS dst FROM base
  UNION ALL
  SELECT b, a FROM base
),
reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node, least(node, min(r)) AS component
FROM reach GROUP BY node ORDER BY node
""")
def graph_components(spark, sf):
    """CONVERGED connected components through the engine's real CC
    operator (pipeline/canonicalize.connected_components — the exact
    code canonicalization and dedup_clusters run), under a DuckDB
    WITH RECURSIVE oracle that enumerates full reachability and takes
    the per-node minimum — so the gate checks true components, not a
    fixed-iteration approximation on both sides.

    The edge set is deliberately FRAGMENTING (repeat-trade pairs:
    customer bought from supplier in >= 2 distinct orders), because the
    raw c<->s graph is one giant component at any sf — trivially
    correct and structurally uninformative. Repeat edges scatter into
    many small components plus chains, the shape the hash-min loop's
    convergence logic actually has to handle.
    """
    from lamapi_spark.pipeline.canonicalize import connected_components

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
                 F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"))
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") >= 2)
        .select("a", "b")
    )
    return (
        connected_components(base)
        .select(F.col("entity").alias("node"), "component")
        .orderBy("node")
    )


@register("graph_common_neighbors", """
WITH cs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS c, 's' || l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT s, count(*)::BIGINT AS degree FROM cs GROUP BY s),
p AS (
  SELECT x.s AS node_a, y.s AS node_b, count(*)::BIGINT AS common
  FROM cs x JOIN cs y ON x.c = y.c AND x.s < y.s
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT node_a, node_b, common, da.degree AS degree_a,
       db.degree AS degree_b,
       common / (da.degree + db.degree - common) AS jaccard
FROM p
JOIN deg da ON da.s = node_a
JOIN deg db ON db.s = node_b
ORDER BY node_a, node_b
""")
def graph_common_neighbors(spark, sf):
    """Supplier pairs sharing >= 3 customers, with neighbor-set Jaccard
    — the graph-adjacency entity-resolution primitive (two nodes whose
    neighborhoods overlap heavily are merge candidates), through
    ops/graph.common_neighbor_pairs. max_fanout is lifted above any
    sf's per-customer supplier fanout (TPC-H orders carry ~4 items) so
    operator and brute-force oracle stay equivalent at every test sf;
    a web-scale hub-heavy graph would lower it and accept the
    documented recall trade on hub-mediated pairs.
    """
    from lamapi_spark.ops.graph import common_neighbor_pairs

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
    )
    return (
        common_neighbor_pairs(cs, min_common=3, max_fanout=1_000_000)
        .orderBy("node_a", "node_b")
    )


@register("graph_khop", f"""
WITH {_EDGES_SQL},
seeds AS (SELECT DISTINCT 'c' || o_custkey AS seed FROM orders
          WHERE o_custkey <= 20),
h1 AS (SELECT DISTINCT s.seed, e.dst AS n1
       FROM seeds s JOIN edges e ON e.src = s.seed),
h2 AS (SELECT DISTINCT h1.seed, e.dst AS n2
       FROM h1 JOIN edges e ON e.src = h1.n1)
SELECT a.seed, a.n_1hop, b.n_2hop
FROM (SELECT seed, count(DISTINCT n1)::BIGINT AS n_1hop
      FROM h1 GROUP BY seed) a
JOIN (SELECT seed, count(DISTINCT n2)::BIGINT AS n_2hop
      FROM h2 GROUP BY seed) b USING (seed)
ORDER BY seed
""")
def graph_khop(spark, sf):
    """1-hop and 2-hop distinct-reach counts from a fixed seed set
    (customers with custkey <= 20). The frontier is DISTINCT-ed before
    the second expansion — the difference between O(frontier) and
    O(paths) at hub nodes, which is what makes k-hop survive a
    hub-heavy graph at scale."""
    edges = _edges(spark, sf).cache()
    seeds = (load(spark, sf, "orders").filter(F.col("o_custkey") <= 20)
             .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("seed"))
             .distinct())
    h1 = (seeds.join(edges, seeds.seed == edges.src)
          .select("seed", F.col("dst").alias("n1")).distinct())
    h2 = (h1.join(edges, h1.n1 == edges.src)
          .select("seed", F.col("dst").alias("n2")).distinct())
    return (
        h1.groupBy("seed").agg(F.countDistinct("n1").alias("n_1hop"))
        .join(h2.groupBy("seed").agg(F.countDistinct("n2").alias("n_2hop")),
              "seed")
        .orderBy("seed")
    )


# ------------------------------------------------- negative sampling

_NEG_BUCKETS = 16

_NEG_SQL = f"""
WITH ent AS (SELECT DISTINCT p_partkey::BIGINT AS ent FROM part),
ranked AS MATERIALIZED (
  SELECT ent,
         ('0x' || substr(md5(ent::VARCHAR), 1, 12))::BIGINT % {_NEG_BUCKETS} AS bucket,
         row_number() OVER (
           PARTITION BY ('0x' || substr(md5(ent::VARCHAR), 1, 12))::BIGINT % {_NEG_BUCKETS}
           ORDER BY ent) AS rank
  FROM ent),
sizes AS (
  SELECT bucket, count(*)::BIGINT AS bsize,
         row_number() OVER (ORDER BY bucket) - 1 AS bidx
  FROM ranked GROUP BY bucket),
kk AS (SELECT count(*)::BIGINT AS k FROM sizes),
t AS (SELECT DISTINCT l_orderkey AS subj, 'has_part' AS pred, l_partkey AS obj
      FROM lineitem WHERE l_orderkey % 19 = 0),
addressed AS (
  SELECT a.subj, a.pred, a.obj, s.bucket, s.bsize,
         ('0x' || substr(md5(a.key || '|neg:i'), 1, 12))::BIGINT % s.bsize + 1 AS idx1
  FROM (
    SELECT subj, pred, obj,
           subj::VARCHAR || '|' || pred || '|' || obj::VARCHAR AS key,
           ('0x' || substr(md5(subj::VARCHAR || '|' || pred || '|' || obj::VARCHAR
                               || '|neg:b'), 1, 12))::BIGINT % kk.k AS bidx
    FROM t CROSS JOIN kk) a
  JOIN sizes s ON s.bidx = a.bidx),
drawn AS (
  SELECT ad.subj, ad.pred, ad.obj, r1.ent AS e1, r2.ent AS e2
  FROM addressed ad
  JOIN ranked r1 ON r1.bucket = ad.bucket AND r1.rank = ad.idx1
  JOIN ranked r2 ON r2.bucket = ad.bucket AND r2.rank = ad.idx1 % ad.bsize + 1)
SELECT subj, pred, obj,
       CASE WHEN e1 <> obj THEN e1 WHEN e2 <> obj THEN e2 END AS neg_obj
FROM drawn ORDER BY subj, obj
"""


@register("kg_negative_samples", _NEG_SQL)
def kg_negative_samples(spark, sf):
    """TransE-style corrupted tails for KG-embedding training
    (ops/graph.py:negative_samples) over (orderkey, has_part, partkey)
    triples with the part keys as the entity pool: md5-bucketed pool
    ranking, per-triple deterministic (bucket, rank) draw, bounded
    wrap-around collision handling. The oracle re-derives every bucket,
    rank, and draw in SQL integer arithmetic, so each of the ~3k
    sampled negatives is individually value-hash-checked."""
    from lamapi_spark.ops.graph import negative_samples

    t = (load(spark, sf, "lineitem")
         .filter(F.col("l_orderkey") % 19 == 0)
         .select(F.col("l_orderkey").alias("subj"),
                 F.lit("has_part").alias("pred"),
                 F.col("l_partkey").alias("obj"))
         .distinct())
    return (
        negative_samples(t, load(spark, sf, "part"), ent_col="p_partkey",
                         n_buckets=_NEG_BUCKETS)
        .orderBy("subj", "obj")
    )


# ---------------------------------------------------- PMI edge weights

@register("graph_edge_pmi", """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
deg AS (SELECT p, count(*)::BIGINT AS degree FROM op GROUP BY p),
n AS (SELECT count(DISTINCT o)::BIGINT AS n_ctx FROM op),
pairs AS (
  SELECT a.p AS node_a, b.p AS node_b, count(*)::BIGINT AS common
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= 2)
SELECT pr.node_a, pr.node_b, pr.common,
       da.degree AS degree_a, db.degree AS degree_b,
       round_even(ln((pr.common * n.n_ctx)::DOUBLE
                     / (da.degree * db.degree)::DOUBLE), 6) AS pmi
FROM pairs pr
JOIN deg da ON da.p = pr.node_a
JOIN deg db ON db.p = pr.node_b
CROSS JOIN n
ORDER BY node_a, node_b
""")
def graph_edge_pmi(spark, sf):
    """PMI association weights (ops/graph.py:pmi_edges) over the
    order->part co-occurrence graph: parts sharing >= 2 orders, scored
    by ln(c_ab * N / (c_a * c_b)) — the statistical edge weighting
    applied to raw co-occurrence edges before thresholding them into
    KG relations. The oracle recomputes contexts, marginals, and every
    ln from the same four integers."""
    from lamapi_spark.ops.graph import pmi_edges

    edges = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst"))
    return pmi_edges(edges, min_common=2).orderBy("node_a", "node_b")


# ------------------------------------------------------ triangle counts

@register("graph_triangles", """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pairs AS (
  SELECT a.p AS a, b.p AS b
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= 2),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, count(*)::BIGINT AS triangles
FROM corners GROUP BY node ORDER BY node
""")
def graph_triangles(spark, sf):
    """Per-node triangle counts (ops/graph.py:triangle_counts,
    degree-oriented wedge join — the |E|^1.5-bounded formulation) over
    the parts-sharing->=2-orders graph. The oracle is an INDEPENDENT
    formulation: the canonical ordered-triple join (a<b<c) — two
    different triangle algorithms must agree on every node."""
    from lamapi_spark.ops.graph import triangle_counts

    op = (load(spark, sf, "lineitem")
          .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
          .distinct())
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") >= 2)
        .select("src", "dst")
    )
    return triangle_counts(pairs).orderBy("node")


# ------------------------------------------------- TransE embedding GD

_TRANSE_D = 4
_TRANSE_ITERS = 2
_TRANSE_LR = 2
_TRANSE_MARGIN = 100
_TRANSE_INIT = 50
_TRANSE_CLAMP = 1000

# the kg_negative_samples dataflow again (proven oracle), cast to the
# VARCHAR id space the embedding grid keys on, degenerate negs dropped
_TRANSE_TN_SQL = f"""
WITH ent AS (SELECT DISTINCT p_partkey::BIGINT AS ent FROM part),
ranked AS (
  SELECT ent,
         ('0x' || substr(md5(ent::VARCHAR), 1, 12))::BIGINT % {_NEG_BUCKETS} AS bucket,
         row_number() OVER (
           PARTITION BY ('0x' || substr(md5(ent::VARCHAR), 1, 12))::BIGINT % {_NEG_BUCKETS}
           ORDER BY ent) AS rank
  FROM ent),
sizes AS (
  SELECT bucket, count(*)::BIGINT AS bsize,
         row_number() OVER (ORDER BY bucket) - 1 AS bidx
  FROM ranked GROUP BY bucket),
kk AS (SELECT count(*)::BIGINT AS k FROM sizes),
t AS (SELECT DISTINCT l_orderkey AS subj, 'has_part' AS pred, l_partkey AS obj
      FROM lineitem WHERE l_orderkey % 19 = 0),
addressed AS (
  SELECT a.subj, a.pred, a.obj, s.bucket, s.bsize,
         ('0x' || substr(md5(a.key || '|neg:i'), 1, 12))::BIGINT % s.bsize + 1 AS idx1
  FROM (
    SELECT subj, pred, obj,
           subj::VARCHAR || '|' || pred || '|' || obj::VARCHAR AS key,
           ('0x' || substr(md5(subj::VARCHAR || '|' || pred || '|' || obj::VARCHAR
                               || '|neg:b'), 1, 12))::BIGINT % kk.k AS bidx
    FROM t CROSS JOIN kk) a
  JOIN sizes s ON s.bidx = a.bidx),
drawn AS (
  SELECT ad.subj, ad.pred, ad.obj, r1.ent AS e1, r2.ent AS e2
  FROM addressed ad
  JOIN ranked r1 ON r1.bucket = ad.bucket AND r1.rank = ad.idx1
  JOIN ranked r2 ON r2.bucket = ad.bucket AND r2.rank = ad.idx1 % ad.bsize + 1),
tn AS MATERIALIZED (
  SELECT subj::VARCHAR AS subj, pred, obj::VARCHAR AS obj,
         neg_obj::VARCHAR AS neg_obj
  FROM (SELECT subj, pred, obj,
               CASE WHEN e1 <> obj THEN e1 WHEN e2 <> obj THEN e2 END AS neg_obj
        FROM drawn)
  WHERE neg_obj IS NOT NULL),
dims AS (SELECT range::BIGINT AS dim FROM range({_TRANSE_D})),
eids AS (SELECT DISTINCT id FROM (
  SELECT subj AS id FROM tn
  UNION SELECT obj FROM tn
  UNION SELECT neg_obj FROM tn)),
rids AS (SELECT DISTINCT pred AS id FROM tn),
emb0 AS MATERIALIZED (
  SELECT kind, id, dim,
         (('0x' || substr(md5(kind || '|' || id || '|' || dim::VARCHAR
                              || '|transe'), 1, 12))::BIGINT
          % (2 * {_TRANSE_INIT} + 1) - {_TRANSE_INIT})::BIGINT AS w_u
  FROM (SELECT 'e' AS kind, id FROM eids UNION ALL SELECT 'r', id FROM rids)
  CROSS JOIN dims)"""


def _transe_iter_sql(k: int) -> str:
    """One full-batch TransE-L1 GD step, emb{k-1} -> emb{k} — the SQL
    replay of one loop body of ops/kg_embed.py:transe_train."""
    p = f"emb{k - 1}"
    return f""",
coords{k} AS MATERIALIZED (
  SELECT t.subj, t.pred, t.obj, t.neg_obj, eh.dim,
         eh.w_u + er.w_u - et.w_u AS dp,
         eh.w_u + er.w_u - en.w_u AS dn
  FROM tn t
  JOIN {p} eh ON eh.kind = 'e' AND eh.id = t.subj
  JOIN {p} er ON er.kind = 'r' AND er.id = t.pred AND er.dim = eh.dim
  JOIN {p} et ON et.kind = 'e' AND et.id = t.obj AND et.dim = eh.dim
  JOIN {p} en ON en.kind = 'e' AND en.id = t.neg_obj AND en.dim = eh.dim),
scored{k} AS (
  SELECT subj, pred, obj, neg_obj,
         sum(abs(dp)) AS pos_u, sum(abs(dn)) AS neg_u
  FROM coords{k} GROUP BY subj, pred, obj, neg_obj),
viol{k} AS MATERIALIZED (
  SELECT c.subj, c.pred, c.obj, c.neg_obj, c.dim,
         CASE WHEN c.dp > 0 THEN 1 WHEN c.dp < 0 THEN -1 ELSE 0 END AS sp,
         CASE WHEN c.dn > 0 THEN 1 WHEN c.dn < 0 THEN -1 ELSE 0 END AS sn
  FROM coords{k} c
  JOIN scored{k} s ON s.subj = c.subj AND s.pred = c.pred
                  AND s.obj = c.obj AND s.neg_obj = c.neg_obj
  WHERE s.pos_u + {_TRANSE_MARGIN} > s.neg_u),
grad{k} AS (
  SELECT kind, id, dim, sum(gv)::BIGINT AS g_u FROM (
    SELECT 'e' AS kind, subj AS id, dim, sp - sn AS gv FROM viol{k}
    UNION ALL SELECT 'r', pred, dim, sp - sn FROM viol{k}
    UNION ALL SELECT 'e', obj, dim, -sp FROM viol{k}
    UNION ALL SELECT 'e', neg_obj, dim, sn FROM viol{k})
  GROUP BY kind, id, dim),
emb{k} AS MATERIALIZED (
  SELECT e.kind, e.id, e.dim,
         greatest((-{_TRANSE_CLAMP})::BIGINT, least(({_TRANSE_CLAMP})::BIGINT,
             e.w_u - {_TRANSE_LR} * coalesce(g.g_u, 0)))::BIGINT AS w_u
  FROM {p} e LEFT JOIN grad{k} g
    ON g.kind = e.kind AND g.id = e.id AND g.dim = e.dim)"""


_TRANSE_TRAIN_SQL = (
    _TRANSE_TN_SQL
    + "".join(_transe_iter_sql(k) for k in range(1, _TRANSE_ITERS + 1))
    + f"""
SELECT kind, id, dim, w_u FROM emb{_TRANSE_ITERS}
ORDER BY kind, id, dim""")

_TRANSE_SCORE_SQL = (
    _TRANSE_TN_SQL
    + "".join(_transe_iter_sql(k) for k in range(1, _TRANSE_ITERS + 1))
    + f"""
SELECT t.subj, t.pred, t.obj,
       sum(abs(eh.w_u + er.w_u - et.w_u))::BIGINT AS score_u
FROM (SELECT DISTINCT subj, pred, obj FROM tn) t
JOIN emb{_TRANSE_ITERS} eh ON eh.kind = 'e' AND eh.id = t.subj
JOIN emb{_TRANSE_ITERS} er ON er.kind = 'r' AND er.id = t.pred
                          AND er.dim = eh.dim
JOIN emb{_TRANSE_ITERS} et ON et.kind = 'e' AND et.id = t.obj
                          AND et.dim = eh.dim
GROUP BY t.subj, t.pred, t.obj
ORDER BY subj, pred, obj""")


def _transe_tn(spark, sf):
    from lamapi_spark.ops.graph import negative_samples

    t = (load(spark, sf, "lineitem")
         .filter(F.col("l_orderkey") % 19 == 0)
         .select(F.col("l_orderkey").alias("subj"),
                 F.lit("has_part").alias("pred"),
                 F.col("l_partkey").alias("obj"))
         .distinct())
    return negative_samples(t, load(spark, sf, "part"),
                            ent_col="p_partkey", n_buckets=_NEG_BUCKETS)


@register("kg_transe_train", _TRANSE_TRAIN_SQL)
def kg_transe_train(spark, sf):
    """TransE-L1 embeddings trained for 2 full-batch GD iterations over
    the (orderkey, has_part, partkey) triples with md5-drawn corrupted
    tails (ops/kg_embed.py:transe_train) — integer fixed point end to
    end, so the oracle replays init, both iterations' scores, hinge
    checks, sign gradients, and clamped steps CTE by CTE and every
    final coordinate must match bit for bit."""
    from lamapi_spark.ops.kg_embed import transe_train

    # checkpoint_every=1 (round-6): with None the 2-iteration dataflow
    # is ONE lazy plan in which every reference to the previous
    # iteration's embeddings re-executes its whole subtree — the plan
    # audit counted 700 base-table scans. Per-iteration lineage
    # truncation is the op's own documented discipline; the integer
    # fixed-point values are unchanged (oracle-gated bit equality).
    emb = transe_train(_transe_tn(spark, sf), d=_TRANSE_D,
                       iters=_TRANSE_ITERS, lr_u=_TRANSE_LR,
                       margin_u=_TRANSE_MARGIN, init_u=_TRANSE_INIT,
                       clamp_u=_TRANSE_CLAMP, checkpoint_every=1)
    return emb.orderBy("kind", "id", "dim")


@register("kg_transe_score", _TRANSE_SCORE_SQL)
def kg_transe_score(spark, sf):
    """Serve side of the trained model: the L1 plausibility score of
    every training triple under the final embeddings
    (ops/kg_embed.py:transe_score) — the link-prediction scoring a KG
    consumer ranks candidate tails with. Exact integers, so the oracle
    gates every score, not a sample."""
    from lamapi_spark.ops.kg_embed import transe_score, transe_train

    tn = _transe_tn(spark, sf)
    emb = transe_train(tn, d=_TRANSE_D, iters=_TRANSE_ITERS,
                       lr_u=_TRANSE_LR, margin_u=_TRANSE_MARGIN,
                       init_u=_TRANSE_INIT, clamp_u=_TRANSE_CLAMP,
                       checkpoint_every=1)  # see kg_transe_train
    triples = (tn.filter(F.col("neg_obj").isNotNull())
               .select("subj", "pred", "obj").distinct())
    return transe_score(triples, emb).orderBy("subj", "pred", "obj")


# ------------------------------------ schema induction + type checking

# entity-type assignment with planted off-type minorities: most orders
# are 'order' (6% 'rush_order'), most parts 'part' (~8% 'odd_part') —
# so induction must find the majority and the checker must flag the
# planted deviants, deterministically in both engines.
_SCHEMA_TYPES_SQL = """
ty AS (
  SELECT 'o' || o_orderkey AS ent,
         CASE WHEN o_orderkey % 17 = 0 THEN 'rush_order'
              ELSE 'order' END AS ent_type
  FROM orders
  UNION ALL
  SELECT 'p' || p_partkey AS ent,
         CASE WHEN p_partkey % 13 = 0 THEN 'odd_part'
              ELSE 'part' END AS ent_type
  FROM part),
tr AS (
  SELECT DISTINCT 'o' || l_orderkey AS subj, 'has_part' AS pred,
         'p' || l_partkey AS obj
  FROM lineitem WHERE l_orderkey % 3 = 0),
typed AS (
  SELECT t.subj, t.pred, t.obj, ts.ent_type AS subj_type,
         tob.ent_type AS obj_type
  FROM tr t
  JOIN ty ts ON ts.ent = t.subj
  JOIN ty tob ON tob.ent = t.obj),
dom_s AS (
  SELECT pred, ent_type AS dom_subj_type, c,
         sum(c) OVER (PARTITION BY pred) AS tot,
         row_number() OVER (PARTITION BY pred
                            ORDER BY c DESC, ent_type) AS r
  FROM (SELECT pred, subj_type AS ent_type, count(*)::BIGINT AS c
        FROM typed GROUP BY pred, subj_type)),
dom_o AS (
  SELECT pred, ent_type AS dom_obj_type, c,
         sum(c) OVER (PARTITION BY pred) AS tot,
         row_number() OVER (PARTITION BY pred
                            ORDER BY c DESC, ent_type) AS r
  FROM (SELECT pred, obj_type AS ent_type, count(*)::BIGINT AS c
        FROM typed GROUP BY pred, obj_type))"""


@register("kg_schema_induction", f"""
WITH {_SCHEMA_TYPES_SQL}
SELECT s.pred, s.tot::BIGINT AS n_triples,
       s.dom_subj_type, (s.c * 10000 // s.tot)::BIGINT AS subj_share_bp,
       o.dom_obj_type, (o.c * 10000 // o.tot)::BIGINT AS obj_share_bp
FROM dom_s s JOIN dom_o o ON o.pred = s.pred AND o.r = 1
WHERE s.r = 1 ORDER BY s.pred
""")
def kg_schema_induction_q(spark, sf):
    """Predicate domain/range induction (ops/graph.py:induce_schema)
    over order->part triples with planted off-type minorities: the
    majority subject/object type per predicate with integer
    basis-point support shares — the schema-learning QA step after
    triple materialization. The oracle recomputes both majority
    windows and every share."""
    from lamapi_spark.ops.graph import induce_schema

    tr, ty = _schema_fixture(spark, sf)
    return induce_schema(tr, ty).orderBy("pred")


@register("kg_type_violations", f"""
WITH {_SCHEMA_TYPES_SQL}
SELECT t.subj, t.pred, t.obj, t.subj_type, t.obj_type,
       (t.subj_type <> s.dom_subj_type) AS bad_subj,
       (t.obj_type <> o.dom_obj_type) AS bad_obj
FROM typed t
JOIN dom_s s ON s.pred = t.pred AND s.r = 1
JOIN dom_o o ON o.pred = t.pred AND o.r = 1
WHERE t.subj_type <> s.dom_subj_type OR t.obj_type <> o.dom_obj_type
ORDER BY t.subj, t.obj
""")
def kg_type_violations_q(spark, sf):
    """Triples deviating from the induced schema
    (ops/graph.py:type_violations): every planted rush_order/odd_part
    participant is flagged with per-side verdicts. The oracle
    re-derives the schema and every flag independently."""
    from lamapi_spark.ops.graph import type_violations

    tr, ty = _schema_fixture(spark, sf)
    return type_violations(tr, ty).orderBy("subj", "obj")


def _schema_fixture(spark, sf):
    ty = (load(spark, sf, "orders")
          .select(F.concat(F.lit("o"), F.col("o_orderkey")).alias("ent"),
                  F.when(F.col("o_orderkey") % 17 == 0, "rush_order")
                  .otherwise("order").alias("ent_type"))
          .unionByName(
              load(spark, sf, "part")
              .select(F.concat(F.lit("p"), F.col("p_partkey")).alias("ent"),
                      F.when(F.col("p_partkey") % 13 == 0, "odd_part")
                      .otherwise("part").alias("ent_type"))))
    tr = (load(spark, sf, "lineitem")
          .filter(F.col("l_orderkey") % 3 == 0)
          .select(F.concat(F.lit("o"), F.col("l_orderkey")).alias("subj"),
                  F.lit("has_part").alias("pred"),
                  F.concat(F.lit("p"), F.col("l_partkey")).alias("obj"))
          .distinct())
    return tr, ty


_TRANSE_EVAL_N = 16

_TRANSE_RANKS_SQL = (
    _TRANSE_TN_SQL
    + "".join(_transe_iter_sql(k) for k in range(1, _TRANSE_ITERS + 1))
    + f""",
cand AS MATERIALIZED (
  SELECT id AS cand_id FROM (SELECT DISTINCT id FROM emb{_TRANSE_ITERS}
                             WHERE kind = 'e')
  ORDER BY ('0x' || substr(md5(id || '|transe-eval'), 1, 12))::BIGINT, id
  LIMIT {_TRANSE_EVAL_N}),
tt AS (SELECT DISTINCT subj, pred, obj FROM tn),
true_s AS MATERIALIZED (
  SELECT t.subj, t.pred, t.obj,
         sum(abs(eh.w_u + er.w_u - et.w_u))::BIGINT AS true_u
  FROM tt t
  JOIN emb{_TRANSE_ITERS} eh ON eh.kind = 'e' AND eh.id = t.subj
  JOIN emb{_TRANSE_ITERS} er ON er.kind = 'r' AND er.id = t.pred
                            AND er.dim = eh.dim
  JOIN emb{_TRANSE_ITERS} et ON et.kind = 'e' AND et.id = t.obj
                            AND et.dim = eh.dim
  GROUP BY t.subj, t.pred, t.obj),
cand_s AS MATERIALIZED (
  SELECT t.subj, t.pred, t.obj, c.cand_id,
         sum(abs(eh.w_u + er.w_u - ec.w_u))::BIGINT AS cand_u
  FROM tt t CROSS JOIN cand c
  JOIN emb{_TRANSE_ITERS} eh ON eh.kind = 'e' AND eh.id = t.subj
  JOIN emb{_TRANSE_ITERS} er ON er.kind = 'r' AND er.id = t.pred
                            AND er.dim = eh.dim
  JOIN emb{_TRANSE_ITERS} ec ON ec.kind = 'e' AND ec.id = c.cand_id
                            AND ec.dim = eh.dim
  GROUP BY t.subj, t.pred, t.obj, c.cand_id),
ranks AS (
  SELECT s.subj, s.pred, s.obj, s.true_u AS true_score_u,
         (1 + sum(CASE WHEN c.cand_id <> s.obj
                        AND (c.cand_u < s.true_u
                             OR (c.cand_u = s.true_u
                                 AND c.cand_id < s.obj))
                  THEN 1 ELSE 0 END))::BIGINT AS rank
  FROM true_s s
  JOIN cand_s c ON c.subj = s.subj AND c.pred = s.pred AND c.obj = s.obj
  GROUP BY s.subj, s.pred, s.obj, s.true_u)
SELECT subj, pred, obj, true_score_u, rank,
       (rank <= 1) AS hit1, (rank <= 3) AS hit3
FROM ranks ORDER BY subj, pred, obj""")


@register("kg_transe_ranks", _TRANSE_RANKS_SQL)
def kg_transe_ranks(spark, sf):
    """Pooled link-prediction evaluation of the trained TransE model
    (ops/kg_embed.py:transe_eval_ranks): every training triple's true
    tail ranked against the md5-smallest 16-entity candidate pool
    under the final embeddings — rank, hit@1, hit@3 per triple, all
    exact integers, every rank individually oracle-checked. Completes
    the train -> serve -> evaluate arc."""
    from lamapi_spark.ops.kg_embed import (
        embedding_vectors, transe_eval_ranks, transe_train,
    )

    tn = _transe_tn(spark, sf)
    emb = transe_train(tn, d=_TRANSE_D, iters=_TRANSE_ITERS,
                       lr_u=_TRANSE_LR, margin_u=_TRANSE_MARGIN,
                       init_u=_TRANSE_INIT, clamp_u=_TRANSE_CLAMP,
                       checkpoint_every=1)  # see kg_transe_train
    triples = (tn.filter(F.col("neg_obj").isNotNull())
               .select("subj", "pred", "obj").distinct())
    return (transe_eval_ranks(triples, embedding_vectors(emb),
                              n_candidates=_TRANSE_EVAL_N)
            .orderBy("subj", "pred", "obj"))


# ----------------------------------------------------------------- HITS

def _hits_iter_sql(k: int) -> str:
    """One HITS round: auth from hubs, hub from the NEW auth, each
    max-normalized to _SCALE by integer division (HUGEINT-exact)."""
    prev = f"h{k - 1}"
    return f""",
a{k}r AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.hub) AS a
  FROM edges e JOIN {prev} h ON h.node = e.src GROUP BY e.dst),
a{k}m AS (SELECT max(a) AS m FROM a{k}r),
a{k} AS MATERIALIZED (
  SELECT n.node,
         (coalesce(r.a, 0) * {_SCALE} // greatest(m.m, 1))::BIGINT AS auth
  FROM nodes n LEFT JOIN a{k}r r ON r.node = n.node CROSS JOIN a{k}m m),
h{k}r AS MATERIALIZED (
  SELECT e.src AS node, sum(a.auth) AS h
  FROM edges e JOIN a{k} a ON a.node = e.dst GROUP BY e.src),
h{k}m AS (SELECT max(h) AS m FROM h{k}r),
h{k} AS MATERIALIZED (
  SELECT n.node,
         (coalesce(r.h, 0) * {_SCALE} // greatest(m.m, 1))::BIGINT AS hub
  FROM nodes n LEFT JOIN h{k}r r ON r.node = n.node CROSS JOIN h{k}m m)"""


_HITS_SQL = (f"""
WITH {_EDGES_SQL},
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
h0 AS (SELECT node, {_SCALE}::BIGINT AS hub FROM nodes)"""
    + "".join(_hits_iter_sql(k) for k in range(1, _N_ITER + 1))
    + f"""
SELECT h.node, h.hub, a.auth
FROM h{_N_ITER} h JOIN a{_N_ITER} a ON a.node = h.node
ORDER BY h.node""")


@register("graph_hits", _HITS_SQL)
def graph_hits(spark, sf):
    """Fixed-iteration HITS hubs/authorities
    (ops/graph.py:hits_fixed_point) over the symmetric customer <->
    supplier graph, in BIGINT fixed point with max-normalization by
    integer division — exact sums and divisions only, so every hub and
    authority score is bit-checked against the oracle's HUGEINT replay
    of all three rounds."""
    from lamapi_spark.ops.graph import hits_fixed_point

    return (hits_fixed_point(_edges(spark, sf), n_iter=_N_ITER,
                             scale=_SCALE, checkpoint_every=1)
            .orderBy("node"))


# --------------------------------------------------------- random walks

_WALK_LEN, _WALK_N, _WALK_CAP = 4, 2, 1000


def _walk_iter_sql(k: int) -> str:
    prev = f"w{k - 1}"
    return f""",
w{k} AS MATERIALIZED (
  SELECT j.start, j.walk_no,
         coalesce(j._next, j.cur) AS cur,
         CASE WHEN j._next IS NOT NULL
              THEN list_append(j.path, j._next) ELSE j.path END AS path
  FROM (
    SELECT w.start, w.walk_no, w.cur, w.path,
           n.nbrs[(('0x' || substr(md5(w.start || '|' || w.walk_no::VARCHAR
                                   || '|{k - 1}|walk'), 1, 12))::BIGINT
                   % len(n.nbrs) + 1)::INT] AS _next
    FROM {prev} w LEFT JOIN nb n ON n.src = w.cur) j)"""


_WALKS_SQL = (f"""
WITH {_EDGES_SQL},
rk AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
  FROM (SELECT DISTINCT src, dst FROM edges)),
nb AS MATERIALIZED (
  SELECT src, list(dst ORDER BY dst) AS nbrs
  FROM rk WHERE rn <= {_WALK_CAP} GROUP BY src),
w0 AS (
  SELECT n.src AS start, wn.walk_no, n.src AS cur, [n.src] AS path
  FROM nb n CROSS JOIN
       (SELECT unnest(range({_WALK_N})) AS walk_no) wn)"""
    + "".join(_walk_iter_sql(k) for k in range(1, _WALK_LEN + 1))
    + f"""
SELECT start, walk_no::BIGINT AS walk_no,
       array_to_string(path, ' ') AS walk
FROM w{_WALK_LEN} ORDER BY start, walk_no""")


@register("graph_random_walks", _WALKS_SQL)
def graph_random_walks(spark, sf):
    """Deterministic DeepWalk corpus (ops/graph.py:random_walks) over
    the symmetric customer <-> supplier graph: 2 walks of length 4
    from every node, each step an md5 draw over the node's sorted
    capped neighbor array. The oracle replays the adjacency arrays and
    all four steps — every emitted path string must match exactly."""
    from lamapi_spark.ops.graph import random_walks

    return (random_walks(_edges(spark, sf), length=_WALK_LEN,
                         n_walks=_WALK_N, max_fanout=_WALK_CAP)
            .withColumn("walk_no", F.col("walk_no").cast("long"))
            .orderBy("start", "walk_no"))


# ------------------------------------------------ personalized PageRank

_PPR_SEEDS = ("c1", "c2")
_PPR_SEED_SQL = ", ".join(f"'{s}'" for s in _PPR_SEEDS)


def _ppr_iter_sql(k: int) -> str:
    prev = f"p{k - 1}"
    return f"""
p{k} AS (
  SELECT n.node,
         CAST(CASE WHEN n.node IN ({_PPR_SEED_SQL}) THEN {_TELEPORT}
                   ELSE 0 END
              + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.degree) AS s
    FROM edges e
    JOIN {prev} r ON r.node = e.src
    JOIN outdeg d ON d.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""


@register("graph_ppr", f"""
WITH {_EDGES_SQL},
outdeg AS (SELECT src AS node, count(*)::BIGINT AS degree
           FROM edges GROUP BY src),
nodes AS (SELECT node FROM outdeg),
p0 AS (SELECT node,
              CASE WHEN node IN ({_PPR_SEED_SQL})
                   THEN {_SCALE} ELSE 0 END::BIGINT AS rank
       FROM nodes),
{",".join(_ppr_iter_sql(k) for k in range(1, _N_ITER + 1))}
SELECT node, rank AS rank_units FROM p{_N_ITER}
WHERE rank > 0 ORDER BY node
""")
def graph_ppr(spark, sf):
    """Personalized PageRank from seeds c1 and c2 (random walk with
    restart; ops/graph.ppr_fixed_point) — 3 iterations in BIGINT
    fixed point, restart mass only on the seeds, sparse result (ranks
    outside the 3-hop neighborhood are exact 0 and filtered). The
    oracle replays every iteration's integer arithmetic CTE by CTE."""
    from lamapi_spark.ops.graph import ppr_fixed_point

    seeds = spark.createDataFrame([(s,) for s in _PPR_SEEDS],
                                  "node string")
    rank = ppr_fixed_point(_edges(spark, sf), seeds, n_iter=_N_ITER,
                           scale=_SCALE, damping_pct=85)
    return (rank.filter(F.col("rank") > 0)
            .select("node", F.col("rank").alias("rank_units"))
            .orderBy("node"))



# ------------------------------------------------------------------ SCC

@register("graph_scc", """
WITH RECURSIVE pairs AS (
  SELECT o.o_custkey AS ck, l.l_suppkey AS sk, count(*) AS cnt
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey % 3 = 0 AND l.l_suppkey % 2 = 0
  GROUP BY 1, 2 HAVING count(*) >= 2
),
base AS (
  SELECT CASE WHEN (ck + sk) % 4 < 2 THEN 'c'||ck ELSE 's'||sk END AS src,
         CASE WHEN (ck + sk) % 4 < 2 THEN 's'||sk ELSE 'c'||ck END AS dst
  FROM pairs
  UNION
  SELECT CASE WHEN (ck + sk) % 4 < 2 THEN 's'||sk ELSE 'c'||ck END,
         CASE WHEN (ck + sk) % 4 < 2 THEN 'c'||ck ELSE 's'||sk END
  FROM pairs WHERE cnt >= 3
),
reach AS (
  SELECT src AS node, dst AS r FROM base
  UNION
  SELECT reach.node, e.dst FROM reach JOIN base e ON e.src = reach.r
),
mutual AS (
  SELECT a.node, a.r FROM reach a JOIN reach b ON b.node = a.r AND b.r = a.node
),
nodes AS (SELECT src AS node FROM base UNION SELECT dst FROM base)
SELECT n.node, least(n.node, coalesce(min(m.r), n.node)) AS scc
FROM nodes n LEFT JOIN mutual m ON m.node = n.node
GROUP BY n.node ORDER BY n.node
""")
def graph_scc(spark, sf):
    """CONVERGED strongly connected components of a DIRECTED graph
    through the engine's FW-BW coloring loop
    (ops/graph.strongly_connected_components) — the directed twin of
    graph_components. The oracle enumerates full directed reachability
    with WITH RECURSIVE, pairs mutually-reachable nodes, and takes the
    per-class minimum — true SCCs, algorithm-independent, so the gate
    checks semantics, not a shared approximation.

    Edge synth: repeat-trade (customer, supplier) pairs, direction by
    key parity, BOTH directions only for >= 3 repeat orders — plants
    2-cycles that chain into larger cyclic cores (one 368-node SCC at
    sf0.01) while keeping the recursive closure oracle-tractable; key
    modulus filters bound the graph at any sf."""
    from lamapi_spark.ops.graph import strongly_connected_components

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .filter((F.col("o_custkey") % 3 == 0) & (F.col("l_suppkey") % 2 == 0))
        .groupBy(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    fwd = F.when((F.col("ck") + F.col("sk")) % 4 < 2, True).otherwise(False)
    c = F.concat(F.lit("c"), F.col("ck"))
    s = F.concat(F.lit("s"), F.col("sk"))
    one_dir = pairs.select(F.when(fwd, c).otherwise(s).alias("src"),
                           F.when(fwd, s).otherwise(c).alias("dst"))
    back = (pairs.filter(F.col("cnt") >= 3)
            .select(F.when(fwd, s).otherwise(c).alias("src"),
                    F.when(fwd, c).otherwise(s).alias("dst")))
    edges = one_dir.unionByName(back).distinct()
    return (
        strongly_connected_components(edges)
        .orderBy("node")
    )


# -------------------------------------------------------- type inference

@register("kg_type_inference", """
WITH ty_all AS (
  SELECT 'o' || o_orderkey AS ent,
         CASE WHEN o_orderkey % 17 = 0 THEN 'rush_order' ELSE 'order' END AS ent_type
  FROM orders
  UNION ALL
  SELECT 'p' || p_partkey,
         CASE WHEN p_partkey % 13 = 0 THEN 'odd_part' ELSE 'part' END
  FROM part
),
ty AS (  -- VISIBLE types: entities with key % 5 = 1 are hidden (untyped)
  SELECT ent, ent_type FROM ty_all
  WHERE substr(ent, 2)::BIGINT % 5 <> 1
),
tr AS (
  SELECT DISTINCT 'o' || l_orderkey AS subj, 'has_part' AS pred,
         'p' || l_partkey AS obj
  FROM lineitem WHERE l_orderkey % 3 = 0
),
dist AS (
  SELECT pred, pos, ent_type, (c * 10000 // tot)::BIGINT AS share_bp
  FROM (
    SELECT pred, pos, ent_type, c, sum(c) OVER (PARTITION BY pred, pos) AS tot
    FROM (
      SELECT t.pred, 's' AS pos, y.ent_type, count(*)::BIGINT AS c
      FROM tr t JOIN ty y ON y.ent = t.subj GROUP BY 1, 2, 3
      UNION ALL
      SELECT t.pred, 'o', y.ent_type, count(*)::BIGINT
      FROM tr t JOIN ty y ON y.ent = t.obj GROUP BY 1, 2, 3
    )
  )
),
occ AS (
  SELECT subj AS ent, pred, 's' AS pos FROM tr
  UNION ALL
  SELECT obj, pred, 'o' FROM tr
),
votes AS (
  SELECT o.ent, d.ent_type, sum(d.share_bp)::BIGINT AS votes_bp,
         count(*)::BIGINT AS n_evidence
  FROM occ o JOIN dist d ON d.pred = o.pred AND d.pos = o.pos
  WHERE o.ent NOT IN (SELECT ent FROM ty)
  GROUP BY 1, 2
)
SELECT ent, ent_type AS inferred_type, votes_bp, n_evidence
FROM votes
QUALIFY row_number() OVER (PARTITION BY ent
                           ORDER BY votes_bp DESC, ent_type) = 1
ORDER BY ent
""")
def kg_type_inference(spark, sf):
    """Type inference for untyped entities by predicate voting
    (ops/graph.infer_types) — the KG-completion step after schema
    induction: a deterministic 20% of the schema fixture's entities
    have their types HIDDEN, and every occurrence of a hidden entity
    casts the (pred, position) type distribution learned from the
    still-typed ones as an integer basis-point vote. The oracle
    recomputes distributions, tallies, and the tie-broken argmax."""
    from lamapi_spark.ops.graph import infer_types

    tr, ty_all = _schema_fixture(spark, sf)
    ty = ty_all.filter(F.substring("ent", 2, 100).cast("bigint") % 5 != 1)
    return infer_types(tr, ty).orderBy("ent")


# -------------------------------------------------------------- DistMult

_DISTMULT_RANKS_SQL = _TRANSE_TN_SQL + f""",
cand AS MATERIALIZED (
  SELECT id AS cand_id FROM (SELECT DISTINCT id FROM emb0 WHERE kind = 'e')
  ORDER BY ('0x' || substr(md5(id || '|distmult-eval'), 1, 12))::BIGINT, id
  LIMIT {_TRANSE_EVAL_N}),
tt AS (SELECT DISTINCT subj, pred, obj FROM tn),
true_s AS MATERIALIZED (
  SELECT t.subj, t.pred, t.obj,
         sum(eh.w_u * er.w_u * et.w_u)::BIGINT AS true_u
  FROM tt t
  JOIN emb0 eh ON eh.kind = 'e' AND eh.id = t.subj
  JOIN emb0 er ON er.kind = 'r' AND er.id = t.pred AND er.dim = eh.dim
  JOIN emb0 et ON et.kind = 'e' AND et.id = t.obj AND et.dim = eh.dim
  GROUP BY 1, 2, 3),
cand_s AS MATERIALIZED (
  SELECT t.subj, t.pred, t.obj, c.cand_id,
         sum(eh.w_u * er.w_u * ec.w_u)::BIGINT AS cand_u
  FROM tt t CROSS JOIN cand c
  JOIN emb0 eh ON eh.kind = 'e' AND eh.id = t.subj
  JOIN emb0 er ON er.kind = 'r' AND er.id = t.pred AND er.dim = eh.dim
  JOIN emb0 ec ON ec.kind = 'e' AND ec.id = c.cand_id AND ec.dim = eh.dim
  GROUP BY 1, 2, 3, 4)
SELECT s.subj, s.pred, s.obj, s.true_u AS true_score_u,
       (1 + sum(CASE WHEN c.cand_id <> s.obj
                      AND (c.cand_u > s.true_u
                           OR (c.cand_u = s.true_u AND c.cand_id < s.obj))
                THEN 1 ELSE 0 END))::BIGINT AS rank,
       (1 + sum(CASE WHEN c.cand_id <> s.obj
                      AND (c.cand_u > s.true_u
                           OR (c.cand_u = s.true_u AND c.cand_id < s.obj))
                THEN 1 ELSE 0 END)) <= 1 AS hit1,
       (1 + sum(CASE WHEN c.cand_id <> s.obj
                      AND (c.cand_u > s.true_u
                           OR (c.cand_u = s.true_u AND c.cand_id < s.obj))
                THEN 1 ELSE 0 END)) <= 3 AS hit3
FROM true_s s
JOIN cand_s c ON c.subj = s.subj AND c.pred = s.pred AND c.obj = s.obj
GROUP BY s.subj, s.pred, s.obj, s.true_u
ORDER BY s.subj, s.pred, s.obj"""


@register("kg_distmult_ranks", _DISTMULT_RANKS_SQL)
def kg_distmult_ranks(spark, sf):
    """Pooled link-prediction evaluation under DISTMULT scoring
    (ops/kg_embed.py:distmult_eval_ranks) — the bilinear-diagonal
    higher-is-better twin of kg_transe_ranks, over the md5-initialized
    embedding grid (scoring/eval only: DistMult's product gradients
    have no integer-exact full-batch GD, see the operator docstring).
    Every triple's rank, hit@1, hit@3 against the 16-entity
    md5-smallest pool is individually oracle-checked."""
    from lamapi_spark.ops.kg_embed import (
        distmult_eval_ranks, embedding_vectors, transe_init,
    )

    tn = _transe_tn(spark, sf)
    emb = transe_init(tn, d=_TRANSE_D, init_u=_TRANSE_INIT)
    triples = (tn.filter(F.col("neg_obj").isNotNull())
               .select("subj", "pred", "obj").distinct())
    return (distmult_eval_ranks(triples, embedding_vectors(emb),
                                n_candidates=_TRANSE_EVAL_N)
            .orderBy("subj", "pred", "obj"))


# ----------------------------------------------------- coherence rerank

@register("kg_coherence_rerank", """
WITH m AS (  -- mentions: lineitems of every 13th order; 3 candidates each
  -- (orderkey, linenumber) is not unique in the synthetic lineitem:
  -- collapse to min(partkey) so the mention key is unique
  SELECT l_orderkey AS group_id, l_linenumber AS mention_id,
         min(l_partkey) AS true_part
  FROM lineitem WHERE l_orderkey % 13 = 0
  GROUP BY 1, 2
),
cands AS (
  SELECT group_id, mention_id, 'p' || (true_part + d.off) AS cand_id,
         ('0x' || substr(md5(group_id || '|' || mention_id || '|p'
                             || (true_part + d.off)), 1, 12))::BIGINT % 100
           AS base_score_u
  FROM m CROSS JOIN (SELECT unnest([0, 1, 2]) AS off) d
),
edges AS (  -- KG: parts co-ordered in every 3rd order (p_a < p_b once)
  SELECT DISTINCT 'p' || a.l_partkey AS a, 'p' || b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey % 3 = 0
),
sym AS (SELECT a AS x, b AS y FROM edges UNION SELECT b, a FROM edges),
support AS (
  SELECT DISTINCT c.group_id, c.mention_id, c.cand_id, c2.mention_id AS m2
  FROM cands c
  JOIN sym s ON s.x = c.cand_id
  JOIN cands c2 ON c2.group_id = c.group_id AND c2.cand_id = s.y
  WHERE c2.mention_id <> c.mention_id
),
votes AS (
  SELECT group_id, mention_id, cand_id, count(*)::BIGINT AS votes
  FROM support GROUP BY 1, 2, 3
),
scored AS (
  SELECT c.group_id, c.mention_id, c.cand_id, c.base_score_u,
         coalesce(v.votes, 0)::BIGINT AS votes,
         (c.base_score_u + 1000 * coalesce(v.votes, 0))::BIGINT AS final_u
  FROM cands c LEFT JOIN votes v
    ON v.group_id = c.group_id AND v.mention_id = c.mention_id
   AND v.cand_id = c.cand_id
)
SELECT group_id, mention_id, cand_id, base_score_u, votes, final_u
FROM scored
QUALIFY row_number() OVER (PARTITION BY group_id, mention_id
                           ORDER BY final_u DESC, cand_id) = 1
ORDER BY group_id, mention_id
""")
def kg_coherence_rerank(spark, sf):
    """Collective entity linking (pipeline/coherence.coherence_rerank):
    per-mention candidate lists reranked by KG coherence — a candidate
    connected to OTHER mentions' candidates in the same conversation
    collects one vote per distinct supporting mention, votes dominate
    the (deliberately noisy) md5 base score. Synth plants the signal:
    each mention's true part plus two +1/+2 decoys, KG edges = parts
    actually co-ordered — so the true candidates support each other and
    the decoys are isolated. The oracle recomputes edges, supporter
    sets, tallies, and the tie-broken winner per mention."""
    from lamapi_spark.functions.hashing import h48
    from lamapi_spark.pipeline.coherence import coherence_rerank

    li = load(spark, sf, "lineitem")
    m = (li.filter(F.col("l_orderkey") % 13 == 0)
         .groupBy(F.col("l_orderkey").alias("group_id"),
                  F.col("l_linenumber").alias("mention_id"))
         .agg(F.min("l_partkey").alias("true_part")))
    offs = spark.range(3).select(F.col("id").cast("int").alias("off"))
    cands = (m.crossJoin(F.broadcast(offs))
             .select("group_id", "mention_id",
                     F.concat(F.lit("p"),
                              F.col("true_part") + F.col("off")).alias("cand_id"))
             .withColumn("base_score_u",
                         h48(F.concat_ws("|", "group_id", "mention_id",
                                         "cand_id")) % 100))
    a = li.filter(F.col("l_orderkey") % 3 == 0).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pb"))
    edges = (a.join(b, "ok").filter(F.col("pa") < F.col("pb"))
             .select(F.concat(F.lit("p"), F.col("pa")).alias("a"),
                     F.concat(F.lit("p"), F.col("pb")).alias("b"))
             .distinct())
    return (coherence_rerank(cands, edges, vote_scale=1000)
            .orderBy("group_id", "mention_id"))


# ------------------------------------------------------- weighted SSSP

_SSSP_K = 4

def _sssp_round_sql(j: int) -> str:
    p = f"d{j - 1}"
    return f""",
d{j} AS MATERIALIZED (
  SELECT node, min(dist)::BIGINT AS dist FROM (
    SELECT node, dist FROM {p}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM {p} d JOIN wedges e ON e.src = d.node)
  GROUP BY node)"""


@register("graph_sssp_bounded", f"""
WITH {_EDGES_SQL},
wedges AS (
  SELECT src, dst,
         (('0x' || substr(md5(src || '>' || dst), 1, 12))::BIGINT % 9 + 1)
           AS w
  FROM edges
),
d0 AS (
  SELECT DISTINCT src AS node, 0::BIGINT AS dist FROM wedges
  WHERE src LIKE 'c%' AND substr(src, 2)::BIGINT % 100 = 0
)""" + "".join(_sssp_round_sql(j) for j in range(1, _SSSP_K + 1)) + f"""
SELECT node, dist FROM d{_SSSP_K} ORDER BY node
""")
def graph_sssp_bounded(spark, sf):
    """Multi-source weighted shortest paths bounded to {4} edges
    (ops/graph.sssp_bounded — k rounds of Bellman-Ford relaxation,
    BIGINT weights) over the shared symmetric trade graph with
    md5-derived edge weights and every 100th customer as a seed. The
    oracle unrolls the same 4 rounds CTE by CTE, so every distance is
    value-checked with no convergence coupling."""
    from lamapi_spark.functions.hashing import h48
    from lamapi_spark.ops.graph import sssp_bounded

    e = _edges(spark, sf).select(
        "src", "dst",
        (h48(F.concat(F.col("src"), F.lit(">"), F.col("dst"))) % 9 + 1)
        .alias("w"))
    seeds = (e.select("src").distinct()
             .filter(F.col("src").startswith("c")
                     & (F.substring("src", 2, 100).cast("bigint") % 100 == 0))
             .select(F.col("src").alias("node")))
    return (sssp_bounded(e, seeds, k=_SSSP_K, checkpoint_every=1)
            .orderBy("node"))


# --------------------------------------------------------- NIL clusters

@register("kg_nil_clusters", """
WITH RECURSIVE surf AS (
  SELECT DISTINCT surface FROM (
    SELECT lower(p_name || ' ' || p_brand) AS surface FROM part
    UNION ALL
    SELECT lower(p_name) FROM part WHERE p_partkey % 3 = 0
  )
),
toks AS (
  SELECT surface, unnest(list_distinct(string_split(surface, ' '))) AS tok
  FROM surf
),
dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
arr AS (
  SELECT t.surface, list(t.tok ORDER BY d.df, t.tok) AS toks,
         count(*)::BIGINT AS n
  FROM toks t JOIN dfreq d ON d.tok = t.tok GROUP BY t.surface
),
pref AS (
  SELECT surface, unnest(toks[1 : (n - ((3*n + 4) // 5) + 1)::INT]) AS tok
  FROM arr WHERE n > 0
),
cand AS (
  SELECT DISTINCT a.surface AS id_a, b.surface AS id_b
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.surface < b.surface
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN arr x ON x.surface = c.id_a
              JOIN arr y ON y.surface = c.id_b
  WHERE 5 * len(list_intersect(x.toks, y.toks))
        >= 3 * (x.n + y.n - len(list_intersect(x.toks, y.toks)))
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT s.surface, least(s.surface, coalesce(min(r.r), s.surface)) AS cluster_id
FROM surf s LEFT JOIN reach r ON r.node = s.surface
GROUP BY s.surface ORDER BY s.surface
""")
def kg_nil_clusters(spark, sf):
    """Cross-conversation NIL clustering (pipeline/linking.nil_clusters):
    unresolved surfaces pair by EXACT token-set Jaccard >= 3/5 (the
    prefix-filter setjoin) and collapse under the converged CC loop to
    one NIL node per real-world entity. Surface synth plants the shape:
    '<name> <brand>' surfaces star around their bare '<name>' variant
    (J = 2/3) while sibling brands stay apart (J = 1/2) — 64 name
    clusters whose membership the oracle re-derives with the
    reconstruction setjoin + full recursive reachability."""
    from lamapi_spark.pipeline.linking import nil_clusters

    p = load(spark, sf, "part")
    surfaces = (p.select(F.lower(F.concat_ws(" ", "p_name", "p_brand"))
                         .alias("surface"))
                .unionByName(p.filter(F.col("p_partkey") % 3 == 0)
                             .select(F.lower(F.col("p_name"))
                                     .alias("surface"))))
    return nil_clusters(surfaces, taun=3, taud=5).orderBy("surface")


# ------------------------------------------------------------- k-core

_KCORE_K, _KCORE_ROUNDS = 2, 12

_KCORE_BASE_SQL = """
base AS (
  SELECT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
s0 AS (
  SELECT a AS x, b AS y FROM base
  UNION
  SELECT b, a FROM base
)"""


def _kcore_round_sql(j: int) -> str:
    p = f"s{j - 1}"
    return f""",
k{j} AS (SELECT x FROM (SELECT x, count(*) AS c FROM {p} GROUP BY x)
         WHERE c >= {_KCORE_K}),
s{j} AS MATERIALIZED (
  SELECT s.x, s.y FROM {p} s
  JOIN k{j} ka ON ka.x = s.x
  JOIN k{j} kb ON kb.x = s.y)"""


@register("graph_kcore", f"""
WITH {_KCORE_BASE_SQL}"""
          + "".join(_kcore_round_sql(j) for j in range(1, _KCORE_ROUNDS + 1))
          + f"""
SELECT x AS node, count(*)::BIGINT AS degree
FROM s{_KCORE_ROUNDS} GROUP BY x ORDER BY node
""")
def graph_kcore(spark, sf):
    """{2}-core of the fragmenting repeat-trade graph
    (ops/graph.k_core): fixed-round peel — every round drops nodes with
    in-subgraph degree < k — under the fixed-iteration determinism
    contract, so the oracle unrolls the identical 12 rounds CTE by CTE.
    The peel prunes the tree fringe and keeps the cyclic cores (the
    dense-subgraph census step of KG quality analysis); pytest asserts
    12 rounds reach the true fixed point on this synth, making the
    fixed-round result THE k-core, not an approximation."""
    from lamapi_spark.ops.graph import k_core

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
                 F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"))
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") >= 2)
        .select("a", "b")
    )
    return (k_core(base, k=_KCORE_K, rounds=_KCORE_ROUNDS)
            .orderBy("node"))


# -------------------------------------------------- record linkage (FS)

@register("kg_record_linkage", """
WITH l AS (
  SELECT 'L' || p_partkey AS id_l, p_name || '|' || p_size AS blk,
         p_brand, p_type FROM part
),
r AS (  -- perturbed second source: every 4th brand smudged, every 5th type
  SELECT 'R' || p_partkey AS id_r, p_name || '|' || p_size AS blk,
         CASE WHEN p_partkey % 4 = 0 THEN 'Brand#0' ELSE p_brand END AS p_brand,
         CASE WHEN p_partkey % 5 = 0 THEN 'SMUDGED' ELSE p_type END AS p_type
  FROM part
),
pairs AS (
  SELECT l.id_l, r.id_r,
         l.p_brand IS NOT DISTINCT FROM r.p_brand AS agree_p_brand,
         l.p_type IS NOT DISTINCT FROM r.p_type AS agree_p_type
  FROM l JOIN r ON r.blk = l.blk
)
SELECT id_l, id_r, agree_p_brand, agree_p_type,
       ((CASE WHEN agree_p_brand THEN 2000 ELSE -1500 END)
        + (CASE WHEN agree_p_type THEN 1200 ELSE -800 END))::BIGINT AS score_bp,
       CASE WHEN (CASE WHEN agree_p_brand THEN 2000 ELSE -1500 END)
                 + (CASE WHEN agree_p_type THEN 1200 ELSE -800 END) >= 2500
            THEN 'match'
            WHEN (CASE WHEN agree_p_brand THEN 2000 ELSE -1500 END)
                 + (CASE WHEN agree_p_type THEN 1200 ELSE -800 END) <= -1000
            THEN 'nonmatch'
            ELSE 'review' END AS verdict
FROM pairs ORDER BY id_l, id_r
""")
def kg_record_linkage(spark, sf):
    """Fellegi-Sunter probabilistic record linkage
    (ops/linkage.fs_link_pairs): part vs a perturbed second source
    (every 4th brand smudged, every 5th type), blocked on (name, size),
    integer log-odds basis-point weights, the paper's three-region
    decision rule. Unperturbed twins land 'match' (3200 bp), single-
    field smudges fall to 'review', double smudges to 'nonmatch' — and
    blocking also surfaces genuine cross-part pairs that share
    (name, size). The oracle replays blocking, null-safe agreements,
    scores, verdicts row for row."""
    from lamapi_spark.ops.linkage import fs_link_pairs

    p = load(spark, sf, "part")
    blk = F.concat_ws("|", F.col("p_name"), F.col("p_size")).alias("blk")
    l = p.select(F.concat(F.lit("L"), F.col("p_partkey")).alias("lid"),
                 blk, "p_brand", "p_type")
    r = p.select(
        F.concat(F.lit("R"), F.col("p_partkey")).alias("rid"), blk,
        F.when(F.col("p_partkey") % 4 == 0, F.lit("Brand#0"))
        .otherwise(F.col("p_brand")).alias("p_brand"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("SMUDGED"))
        .otherwise(F.col("p_type")).alias("p_type"))
    return (fs_link_pairs(l, r, ("lid", "rid"), "blk",
                          {"p_brand": (2000, -1500),
                           "p_type": (1200, -800)},
                          upper_bp=2500, lower_bp=-1000)
            .orderBy("id_l", "id_r"))


# ------------------------------------------------ FS weight EM training

_FS_PAIRS_SQL = """
l AS (
  SELECT 'L' || p_partkey AS id_l, p_name || '|' || p_size AS blk,
         p_brand, p_type FROM part
),
r AS (
  SELECT 'R' || p_partkey AS id_r, p_name || '|' || p_size AS blk,
         CASE WHEN p_partkey % 4 = 0 THEN 'Brand#0' ELSE p_brand END AS p_brand,
         CASE WHEN p_partkey % 5 = 0 THEN 'SMUDGED' ELSE p_type END AS p_type
  FROM part
),
pairs AS (
  SELECT l.id_l, r.id_r,
         l.p_brand IS NOT DISTINCT FROM r.p_brand AS agree_p_brand,
         l.p_type IS NOT DISTINCT FROM r.p_type AS agree_p_type
  FROM l JOIN r ON r.blk = l.blk
)"""

_EM_FIELDS = ("p_brand", "p_type")
_EM_ITERS = 3


def _em_iter_sql(i: int) -> str:
    prev = f"it{i - 1}"
    mprod = " * ".join(
        f"(CASE WHEN p.agree_{f} THEN t.m_{f}_bp"
        f" ELSE 10000 - t.m_{f}_bp END)" for f in _EM_FIELDS)
    uprod = " * ".join(
        f"(CASE WHEN p.agree_{f} THEN t.u_{f}_bp"
        f" ELSE 10000 - t.u_{f}_bp END)" for f in _EM_FIELDS)
    agrees = ", ".join(f"agree_{f}" for f in _EM_FIELDS)
    aggs = ", ".join(
        f"sum(CASE WHEN agree_{f} THEN g ELSE 0 END)::BIGINT AS sga_{f}, "
        f"sum(CASE WHEN agree_{f} THEN 10000 - g ELSE 0 END)::BIGINT"
        f" AS dga_{f}" for f in _EM_FIELDS)
    news = ", ".join(
        f"greatest(1, least(9999, (20000 * sga_{f} + greatest(1, sg))"
        f" // (2 * greatest(1, sg))))::BIGINT AS m_{f}_bp, "
        f"greatest(1, least(9999, (20000 * dga_{f}"
        f" + greatest(1, 10000 * n - sg))"
        f" // (2 * greatest(1, 10000 * n - sg))))::BIGINT AS u_{f}_bp"
        for f in _EM_FIELDS)
    return f""",
e{i} AS (
  SELECT (20000 * num + den) // (2 * den) AS g, {agrees}
  FROM (SELECT {agrees}, num, num + q_u AS den
        FROM (SELECT p.agree_p_brand, p.agree_p_type,
                     t.p_bp * ({mprod}) AS num,
                     (10000 - t.p_bp) * ({uprod}) AS q_u
              FROM pairs p CROSS JOIN {prev} t))
),
a{i} AS (SELECT count(*)::BIGINT AS n, sum(g)::BIGINT AS sg, {aggs}
         FROM e{i}),
it{i} AS (SELECT greatest(1, least(9999,
                 (2 * sg + n) // (2 * n)))::BIGINT AS p_bp, {news}
          FROM a{i})"""


@register("kg_linkage_em", f"""
WITH {_FS_PAIRS_SQL},
it0 AS (SELECT 500::BIGINT AS p_bp,
               9000::BIGINT AS m_p_brand_bp, 1000::BIGINT AS u_p_brand_bp,
               9000::BIGINT AS m_p_type_bp, 1000::BIGINT AS u_p_type_bp)"""
          + "".join(_em_iter_sql(i) for i in range(1, _EM_ITERS + 1))
          + f"""
SELECT p_bp, m_p_brand_bp, u_p_brand_bp, m_p_type_bp, u_p_type_bp
FROM it{_EM_ITERS}
""")
def kg_linkage_em(spark, sf):
    """Fellegi-Sunter weight TRAINING (ops/linkage.fs_em_weights): 3 EM
    iterations in pure BIGINT basis-point arithmetic over the
    kg_record_linkage candidate pairs — the offline arc that produces
    the log-odds weights fs_link_pairs consumes. Fixed-iteration
    determinism: the oracle unrolls the identical E/M rounds CTE by
    CTE, every division the same integer DIV, so the learned
    (p, m_f, u_f) match bit for bit."""
    from lamapi_spark.ops.linkage import fs_em_weights, fs_link_pairs

    p = load(spark, sf, "part")
    blk = F.concat_ws("|", F.col("p_name"), F.col("p_size")).alias("blk")
    l = p.select(F.concat(F.lit("L"), F.col("p_partkey")).alias("lid"),
                 blk, "p_brand", "p_type")
    r = p.select(
        F.concat(F.lit("R"), F.col("p_partkey")).alias("rid"), blk,
        F.when(F.col("p_partkey") % 4 == 0, F.lit("Brand#0"))
        .otherwise(F.col("p_brand")).alias("p_brand"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("SMUDGED"))
        .otherwise(F.col("p_type")).alias("p_type"))
    pairs = fs_link_pairs(l, r, ("lid", "rid"), "blk",
                          {"p_brand": (2000, -1500),
                           "p_type": (1200, -800)},
                          upper_bp=2500, lower_bp=-1000)
    return fs_em_weights(pairs, list(_EM_FIELDS), iters=_EM_ITERS)


# --------------------------------------- cross-source entity clusters

@register("kg_xsource_clusters", f"""
WITH RECURSIVE {_FS_PAIRS_SQL},
matches AS (
  SELECT id_l, id_r FROM pairs
  WHERE (CASE WHEN agree_p_brand THEN 2000 ELSE -1500 END)
        + (CASE WHEN agree_p_type THEN 1200 ELSE -800 END) >= 2500
),
nodes AS (SELECT id_l AS rec_id FROM l UNION SELECT id_r FROM r),
edges AS (SELECT id_l AS a, id_r AS b FROM matches
          UNION SELECT id_r, id_l FROM matches),
reach AS (
  SELECT a AS node, b AS x FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.x
)
SELECT n.rec_id,
       least(n.rec_id, coalesce(min(r2.x), n.rec_id)) AS cluster_id
FROM nodes n LEFT JOIN reach r2 ON r2.node = n.rec_id
GROUP BY n.rec_id ORDER BY n.rec_id
""")
def kg_xsource_clusters(spark, sf):
    """The full cross-source entity-resolution arc composed end to end:
    block -> score (fs_link_pairs) -> keep verdict='match' edges ->
    collapse under the converged CC loop
    (pipeline/canonicalize.connected_components) -> every record from
    BOTH sources gets a cluster id (singletons resolve to themselves).
    Oracle = the same blocking/scoring replay + full recursive
    reachability with per-cluster least — algorithm-independent, like
    kg_nil_clusters."""
    from lamapi_spark.ops.linkage import fs_link_pairs
    from lamapi_spark.pipeline.canonicalize import connected_components

    p = load(spark, sf, "part")
    blk = F.concat_ws("|", F.col("p_name"), F.col("p_size")).alias("blk")
    l = p.select(F.concat(F.lit("L"), F.col("p_partkey")).alias("lid"),
                 blk, "p_brand", "p_type")
    r = p.select(
        F.concat(F.lit("R"), F.col("p_partkey")).alias("rid"), blk,
        F.when(F.col("p_partkey") % 4 == 0, F.lit("Brand#0"))
        .otherwise(F.col("p_brand")).alias("p_brand"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("SMUDGED"))
        .otherwise(F.col("p_type")).alias("p_type"))
    pairs = fs_link_pairs(l, r, ("lid", "rid"), "blk",
                          {"p_brand": (2000, -1500),
                           "p_type": (1200, -800)},
                          upper_bp=2500, lower_bp=-1000)
    edges = (pairs.filter(F.col("verdict") == "match")
             .select(F.col("id_l").alias("a"), F.col("id_r").alias("b")))
    nodes = (l.select(F.col("lid").alias("rec_id"))
             .unionByName(r.select(F.col("rid").alias("rec_id")))
             .distinct())
    cc = connected_components(edges)
    return (nodes.join(cc, nodes.rec_id == cc.entity, "left")
            .select("rec_id",
                    F.coalesce("component", "rec_id").alias("cluster_id"))
            .orderBy("rec_id"))


@register("graph_link_predict", """
WITH cs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS c, 's' || l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
fan AS (
  SELECT c, count(*)::BIGINT AS f FROM cs GROUP BY c HAVING count(*) >= 2
),
terms AS (
  SELECT cs.c, cs.s AS d,
         CAST(round_even(1000000 / ln(f), 0) AS BIGINT) AS aa_t,
         CAST(round_even(1000000 / f, 0) AS BIGINT) AS ra_t
  FROM cs JOIN fan USING (c)
)
SELECT x.d AS node_a, y.d AS node_b, count(*)::BIGINT AS common,
       sum(x.aa_t)::BIGINT AS aa_units, sum(x.ra_t)::BIGINT AS ra_units
FROM terms x JOIN terms y ON x.c = y.c AND x.d < y.d
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY node_a, node_b
""")
def graph_link_predict(spark, sf):
    """Adamic-Adar + resource-allocation link prediction
    (ops/graph.link_prediction_scores) over the customer->supplier
    adjacency: supplier pairs scored by their shared customers,
    inverse-weighted by each customer's fanout — the KG-completion
    candidate generator one step past raw common-neighbor counts.
    Scores are BIGINT units of 1e-6 (half-even per-term rounding,
    integer sum: order-independent and engine-portable); the oracle
    rebuilds fanouts, per-mediator terms, and the pair aggregation
    from scratch. max_fanout lifted above any sf's per-customer
    fanout (operator == brute force at test scale; a hub-heavy graph
    lowers it for the documented recall trade)."""
    from lamapi_spark.ops.graph import link_prediction_scores

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
    )
    return (
        link_prediction_scores(cs, min_common=2, max_fanout=1_000_000)
        .orderBy("node_a", "node_b")
    )


# ------------------------------------------------- HyperBall

# the estimate chain must match sketches.hll_estimate exactly — reuse
# the one the HLL contract query already pinned (module import is
# idempotent under Python's module cache; registration happens once)
from lamapi_spark.queries_temporal import _HLL_EST_SQL  # noqa: E402


@register("graph_hyperball", f"""
WITH ks AS (SELECT DISTINCT (c_custkey % 100) AS k FROM customer),
e AS (
  SELECT 'n' || k AS src, 'n' || ((k + 1) % 100) AS dst FROM ks
  UNION
  SELECT 'n' || k AS src, 'n' || ((k * 7) % 100) AS dst FROM ks),
b0 AS (SELECT src AS node, src AS member FROM e
       UNION SELECT dst, dst FROM e),
b1 AS (SELECT src AS node, dst AS member FROM e),
b2 AS (SELECT e1.src AS node, e2.dst AS member
       FROM e e1 JOIN e e2 ON e1.dst = e2.src),
ball AS (SELECT DISTINCT node, member FROM (
  SELECT * FROM b0 UNION ALL SELECT * FROM b1 UNION ALL SELECT * FROM b2)),
hx AS (SELECT DISTINCT node,
              (('0x' || substr(md5(member), 1, 12))::UBIGINT)::BIGINT AS h
       FROM ball),
hr AS (SELECT node, (h % 64)::INT AS reg, h // 64 AS w FROM hx),
rk AS (SELECT node, reg,
              max(CASE WHEN w = 0 THEN 43
                  ELSE 43 - length(to_base(w, 2)) END)::INT AS rank
       FROM hr GROUP BY node, reg),
dense AS (SELECT g.node, s.reg, coalesce(r.rank, 0) AS rank
          FROM (SELECT DISTINCT node FROM ball) g
          CROSS JOIN (SELECT reg::INT AS reg FROM range(0, 64) t(reg)) s
          LEFT JOIN rk r ON r.node = g.node AND r.reg = s.reg),
hll AS (SELECT node, list(rank ORDER BY reg) AS regs
        FROM dense GROUP BY node)
SELECT node, array_to_string(regs, ' ') AS regs_str,
       len(list_filter(regs, v -> v = 0))::INT AS n_zero,
       {_HLL_EST_SQL} AS est_distinct
FROM hll ORDER BY node
""")
def graph_hyperball(spark, sf):
    """HyperBall neighborhood function (ops/graph.hyperball) at
    radius 2 over a planted 100-node functional graph (k -> k+1 and
    k -> 7k mod 100, self-loops included at k=0,50). The oracle does
    NOT replay the propagation: it materializes the EXACT 2-hop ball
    per node in SQL and sketches that set directly with the md5
    register draw — green means the iterative register-max fixpoint
    is register-for-register identical to the sketch of the true
    ball (HyperBall's defining invariant), and the estimate chain
    reproduces bit-for-bit."""
    from lamapi_spark.ops.graph import hyperball

    ks = (load(spark, sf, "customer")
          .select((F.col("c_custkey") % 100).alias("k")).distinct())
    edges = (
        ks.select(F.concat(F.lit("n"), F.col("k")).alias("src"),
                  F.concat(F.lit("n"), (F.col("k") + 1) % 100).alias("dst"))
        .unionByName(
            ks.select(F.concat(F.lit("n"), F.col("k")).alias("src"),
                      F.concat(F.lit("n"),
                               (F.col("k") * 7) % 100).alias("dst")))
        .distinct())
    return (
        hyperball(edges, radius=2, b=6)
        .select("node",
                F.array_join(F.col("regs").cast("array<string>"),
                             " ").alias("regs_str"),
                "n_zero", "est_distinct")
        .orderBy("node"))


# ------------------------------------------------- harmonic centrality

def _hb_ball_est(t: str, ball: str) -> str:
    """Per-radius oracle block: md5 HLL registers + estimate over the
    exact ball table ``ball``, emitting es{t}(node, est)."""
    return f"""
hx{t} AS (SELECT DISTINCT node,
                 (('0x' || substr(md5(member), 1, 12))::UBIGINT)::BIGINT AS h
          FROM {ball}),
hr{t} AS (SELECT node, (h % 64)::INT AS reg, h // 64 AS w FROM hx{t}),
rk{t} AS (SELECT node, reg,
                 max(CASE WHEN w = 0 THEN 43
                     ELSE 43 - length(to_base(w, 2)) END)::INT AS rank
          FROM hr{t} GROUP BY node, reg),
dn{t} AS (SELECT g.node, s.reg, coalesce(r.rank, 0) AS rank
          FROM hbn g CROSS JOIN hbregs s
          LEFT JOIN rk{t} r ON r.node = g.node AND r.reg = s.reg),
es{t} AS (SELECT node, {_HLL_EST_SQL} AS est
          FROM (SELECT node, list(rank ORDER BY reg) AS regs
                FROM dn{t} GROUP BY node))"""


@register("graph_harmonic_centrality", f"""
WITH ks AS (SELECT DISTINCT (c_custkey % 100) AS k FROM customer),
e AS (
  SELECT 'n' || k AS src, 'n' || ((k + 1) % 100) AS dst FROM ks
  UNION
  SELECT 'n' || k AS src, 'n' || ((k * 7) % 100) AS dst FROM ks),
hbn AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
hbregs AS (SELECT reg::INT AS reg FROM range(0, 64) t(reg)),
b0 AS (SELECT node, node AS member FROM hbn),
b1 AS (SELECT node, member FROM b0
       UNION SELECT src, dst FROM e),
b2 AS (SELECT node, member FROM b1
       UNION SELECT e1.src, e2.dst FROM e e1 JOIN e e2 ON e1.dst = e2.src),
{_hb_ball_est('0', 'b0')},
{_hb_ball_est('1', 'b1')},
{_hb_ball_est('2', 'b2')}
SELECT n.node, es0.est AS est_r0, es1.est AS est_r1, es2.est AS est_r2,
       greatest(es1.est - es0.est, 0.0) / 1.0
         + greatest(es2.est - es1.est, 0.0) / 2.0 AS harmonic
FROM hbn n
JOIN es0 ON es0.node = n.node
JOIN es1 ON es1.node = n.node
JOIN es2 ON es2.node = n.node
ORDER BY n.node
""")
def graph_harmonic_centrality(spark, sf):
    """Truncated harmonic centrality (ops/graph.hyperball_harmonic,
    radius 2) over the same planted functional graph as
    graph_hyperball. The oracle sketches the EXACT ball at every
    radius independently and replays the clamped radius-ordered fold
    — green pins the per-radius snapshots AND the fold's association
    order, not just the final number."""
    from lamapi_spark.ops.graph import hyperball_harmonic

    ks = (load(spark, sf, "customer")
          .select((F.col("c_custkey") % 100).alias("k")).distinct())
    edges = (
        ks.select(F.concat(F.lit("n"), F.col("k")).alias("src"),
                  F.concat(F.lit("n"), (F.col("k") + 1) % 100).alias("dst"))
        .unionByName(
            ks.select(F.concat(F.lit("n"), F.col("k")).alias("src"),
                      F.concat(F.lit("n"),
                               (F.col("k") * 7) % 100).alias("dst")))
        .distinct())
    hb = hyperball_harmonic(edges, radius=2, b=6)
    return (
        hb.select(
            "node",
            F.element_at("arr", 1).est.alias("est_r0"),
            F.element_at("arr", 2).est.alias("est_r1"),
            F.element_at("arr", 3).est.alias("est_r2"),
            "harmonic")
        .orderBy("node"))


@register("graph_distance_cdf", f"""
WITH ks AS (SELECT DISTINCT (c_custkey % 100) AS k FROM customer),
e AS (
  SELECT 'n' || k AS src, 'n' || ((k + 1) % 100) AS dst FROM ks
  UNION
  SELECT 'n' || k AS src, 'n' || ((k * 7) % 100) AS dst FROM ks),
hbn AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
hbregs AS (SELECT reg::INT AS reg FROM range(0, 64) t(reg)),
b0 AS (SELECT node, node AS member FROM hbn),
b1 AS (SELECT node, member FROM b0
       UNION SELECT src, dst FROM e),
b2 AS (SELECT node, member FROM b1
       UNION SELECT e1.src, e2.dst FROM e e1 JOIN e e2 ON e1.dst = e2.src),
{_hb_ball_est('0', 'b0')},
{_hb_ball_est('1', 'b1')},
{_hb_ball_est('2', 'b2')},
nf AS (
  SELECT 0 AS r, sum(CAST(est AS DECIMAL(18,6))) AS v FROM es0
  UNION ALL
  SELECT 1, sum(CAST(est AS DECIMAL(18,6))) FROM es1
  UNION ALL
  SELECT 2, sum(CAST(est AS DECIMAL(18,6))) FROM es2),
mx AS (SELECT v AS vmax FROM nf WHERE r = 2)
SELECT r::INT AS r, CAST(v AS DOUBLE) AS nf,
       round_even(CAST(v AS DOUBLE) / CAST(vmax AS DOUBLE), 6) AS frac,
       round_even(CAST(v AS DOUBLE) / CAST(vmax AS DOUBLE), 6) >= 0.9
         AS ge90
FROM nf CROSS JOIN mx ORDER BY r
""")
def graph_distance_cdf(spark, sf):
    """Global neighborhood function / distance CDF
    (ops/graph.hyperball_nf, radius 2) over the planted functional
    graph — the ANF/HyperANF statistic behind the 90% effective
    diameter. The oracle sums the exact-ball sketch estimates per
    radius in DECIMAL (the operator's own order-independence
    discipline) and replays the single-division fraction."""
    from lamapi_spark.ops.graph import hyperball_nf

    ks = (load(spark, sf, "customer")
          .select((F.col("c_custkey") % 100).alias("k")).distinct())
    edges = (
        ks.select(F.concat(F.lit("n"), F.col("k")).alias("src"),
                  F.concat(F.lit("n"), (F.col("k") + 1) % 100).alias("dst"))
        .unionByName(
            ks.select(F.concat(F.lit("n"), F.col("k")).alias("src"),
                      F.concat(F.lit("n"),
                               (F.col("k") * 7) % 100).alias("dst")))
        .distinct())
    return hyperball_nf(edges, radius=2, b=6)
