"""Round-4 statistical-closers sweep: distribution-shift tests
(Jensen-Shannon, exact two-sample KS), association (chi-square +
Cramér's V), multiple-comparison control (Benjamini-Hochberg FDR),
agreement with missingness (Krippendorff's alpha), and grouped rank
correlation (Kendall tau-b) — the remaining measurement surface a
fleet-scale eval harness runs beside the round-4 McNemar/bootstrap/
Bradley-Terry family. Every query has a DuckDB oracle that rebuilds
the dataflow independently (counts, folds, thresholds, tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lamapi_spark.queries import load, register

# ------------------------------------------------- JS divergence


@register("corpus_js_divergence", """
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
t AS (SELECT sum(c_base)::BIGINT AS nb, sum(c_new)::BIGINT AS nn FROM j),
per AS (
  SELECT category, c_base, c_new,
         round_even(
           (CASE WHEN c_base > 0 THEN
              (c_base / CAST(nb AS DOUBLE)) / 2
              * ln((c_base / CAST(nb AS DOUBLE))
                   / ((c_base / CAST(nb AS DOUBLE)
                       + c_new / CAST(nn AS DOUBLE)) / 2)) / ln(2.0)
            ELSE 0.0 END)
           + (CASE WHEN c_new > 0 THEN
                (c_new / CAST(nn AS DOUBLE)) / 2
                * ln((c_new / CAST(nn AS DOUBLE))
                     / ((c_base / CAST(nb AS DOUBLE)
                         + c_new / CAST(nn AS DOUBLE)) / 2)) / ln(2.0)
              ELSE 0.0 END), 6) AS term
  FROM j CROSS JOIN t)
SELECT category, c_base, c_new, term FROM per
UNION ALL
SELECT '__total__', sum(c_base)::BIGINT, sum(c_new)::BIGINT,
       CAST(sum(term::DECIMAL(28,6)) AS DOUBLE)
FROM per ORDER BY category
""")
def corpus_js_divergence(spark, sf):
    """Base-2 Jensen-Shannon divergence (ops/metrics.js_divergence)
    between the even- and odd-orderkey halves of orders under the
    SAME planted 1-URGENT drop as corpus_psi_drift — the two drift
    monitors measure one shift, so their green rows cross-check each
    other (JSD bounded in [0,1], no smoothing; PSI smoothed,
    unbounded). The oracle replays counts, the union vocabulary, the
    per-category two-arm term (ln/ln2 in Spark's exact expression
    order), and the DECIMAL rollup."""
    from lamapi_spark.ops.metrics import js_divergence

    o = load(spark, sf, "orders")
    ok = F.col("o_orderkey")
    base = (o.filter(ok % 2 == 0)
            .select(F.col("o_orderpriority").alias("category")))
    new = (o.filter((ok % 2 == 1)
                    & ~((F.col("o_orderpriority") == "1-URGENT")
                        & (ok % 5 < 2)))
           .select(F.col("o_orderpriority").alias("category")))
    return js_divergence(base, new).orderBy("category")


# ------------------------------------------------- chi-square / Cramér's V


@register("eval_chi2_independence", """
WITH d AS (
  SELECT o_orderpriority AS a,
         CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0
              THEN 'expedited' ELSE 'standard' END AS b
  FROM orders),
obs AS (SELECT a, b, count(*)::BIGINT AS o FROM d GROUP BY a, b),
ra AS (SELECT a, sum(o)::BIGINT AS ra FROM obs GROUP BY a),
cb AS (SELECT b, sum(o)::BIGINT AS cb FROM obs GROUP BY b),
t AS (SELECT sum(o)::BIGINT AS n, count(DISTINCT a)::BIGINT AS r,
             count(DISTINCT b)::BIGINT AS c FROM obs),
cells AS (
  SELECT coalesce(obs.o, 0)::DOUBLE AS o,
         CAST(ra.ra * cb.cb / t.n AS DOUBLE) AS e
  FROM ra CROSS JOIN cb
  LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
  CROSS JOIN t),
chi AS (SELECT CAST(sum(round_even((o - e) * (o - e) / e, 6)
                        ::DECIMAL(28,6)) AS DOUBLE) AS chi2
        FROM cells)
SELECT t.n AS n, t.r AS r, t.c AS c,
       ((t.r - 1) * (t.c - 1))::BIGINT AS dof, chi.chi2 AS chi2,
       round_even(CASE WHEN least(t.r - 1, t.c - 1) > 0
         THEN sqrt(chi.chi2 / (CAST(t.n AS DOUBLE)
                               * least(t.r - 1, t.c - 1)))
         ELSE 0.0 END, 6) AS cramers_v
FROM t CROSS JOIN chi
""")
def eval_chi2_independence(spark, sf):
    """Chi-square independence + Cramér's V
    (ops/metrics.chi2_independence) between order priority and a
    PLANTED dependent shipping class (every third 1-URGENT order is
    'expedited' — a direct function of the priority, so the
    association is real and V is well off 0). The oracle replays the
    cell counts, both marginals, the full r x c cross including the
    absent observed cells, every rounded term, the DECIMAL rollup,
    and the effect-size formula."""
    from lamapi_spark.ops.metrics import chi2_independence

    o = load(spark, sf, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("a"),
        F.when((F.col("o_orderpriority") == "1-URGENT")
               & (F.col("o_orderkey") % 3 == 0), F.lit("expedited"))
        .otherwise(F.lit("standard")).alias("b"))
    return chi2_independence(d, "a", "b")


# ------------------------------------------------- exact two-sample KS


@register("eval_ks_two_sample", """
WITH a AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
           WHERE o_orderkey % 2 = 0),
b AS (SELECT CAST(o_totalprice AS DOUBLE) * 1.1 + 5000.0 AS v
      FROM orders WHERE o_orderkey % 2 = 1),
cnt AS (
  SELECT v, sum(ca)::BIGINT AS ca, sum(cb)::BIGINT AS cb FROM (
    SELECT v, 1 AS ca, 0 AS cb FROM a
    UNION ALL SELECT v, 0, 1 FROM b) GROUP BY v),
t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM cnt),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v)::DECIMAL(38,0) AS cua,
         sum(cb) OVER (ORDER BY v)::DECIMAL(38,0) AS cub
  FROM cnt),
d AS (SELECT v, abs(cua * t.nb - cub * t.na) AS d
      FROM cum CROSS JOIN t)
SELECT t.na AS n_a, t.nb AS n_b,
       round_even(CAST((SELECT d FROM d ORDER BY d DESC, v ASC LIMIT 1)
                       AS DOUBLE)
                  / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)), 6)
         AS d_stat,
       (SELECT v FROM d ORDER BY d DESC, v ASC LIMIT 1) AS at_value
FROM t
""")
def eval_ks_two_sample(spark, sf):
    """Exact two-sample Kolmogorov-Smirnov (ops/metrics.ks_two_sample)
    between the even-orderkey price distribution and the odd half
    SHIFTED AND SCALED (v*1.1 + 5000 — a planted location+scale
    drift, so D is large and the achieving value is meaningful). The
    oracle computes the step-function supremum INDEPENDENTLY with a
    plain global window over the distinct-value grid — green proves
    the two-level scan's cumulative counts equal the global window's,
    and that the exact-integer cross-multiplied diff + smallest-value
    tiebreak pick the same row."""
    from lamapi_spark.ops.metrics import ks_two_sample

    o = load(spark, sf, "orders")
    ok = F.col("o_orderkey")
    a = (o.filter(ok % 2 == 0)
         .select(F.col("o_totalprice").cast("double").alias("v")))
    b = (o.filter(ok % 2 == 1)
         .select((F.col("o_totalprice").cast("double") * 1.1 + 5000.0)
                 .alias("v")))
    return ks_two_sample(a, b)


# ------------------------------------------------- Benjamini-Hochberg FDR


@register("eval_bh_fdr", """
WITH ids AS (SELECT DISTINCT (o_orderkey % 400)::BIGINT AS i FROM orders),
tests AS (
  SELECT 't' || i AS test_id,
         CASE WHEN i % 10 = 0
              THEN CAST(i + 1 AS DOUBLE) / 1000000.0
              ELSE 0.05 + CAST(i AS DOUBLE) / 500.0 END AS p_value
  FROM ids),
m AS (SELECT count(*)::BIGINT AS m FROM tests),
ranked AS (
  SELECT test_id, p_value,
         row_number() OVER (ORDER BY p_value, test_id)::BIGINT AS rank
  FROM tests),
k AS (SELECT coalesce(max(CASE WHEN p_value * CAST(m.m AS DOUBLE)
                                    <= CAST(rank AS DOUBLE) * 0.05
                               THEN rank END), 0) AS kstar
      FROM ranked CROSS JOIN m)
SELECT test_id, p_value, rank, (rank <= k.kstar) AS reject
FROM ranked CROSS JOIN k ORDER BY rank
""")
def eval_bh_fdr(spark, sf):
    """Benjamini-Hochberg FDR control (ops/metrics.bh_fdr) over a
    planted 400-test family: every tenth test is a true effect with
    p ~ 1e-6..4e-4, the rest spread over [0.05, 0.85] — so the BH
    step-up bound rejects exactly the planted slice and the boundary
    rank is load-bearing. The oracle ranks with a global window
    (independent of the two-level scan), replays the p*m <= rank*q
    comparison in the same float order, and the max-rank threshold."""
    from lamapi_spark.ops.metrics import bh_fdr

    o = load(spark, sf, "orders")
    ids = o.select((F.col("o_orderkey") % 400).alias("i")).distinct()
    tests = ids.select(
        F.concat(F.lit("t"), F.col("i")).alias("test_id"),
        F.when(F.col("i") % 10 == 0,
               (F.col("i") + 1).cast("double") / 1000000.0)
        .otherwise(0.05 + F.col("i").cast("double") / 500.0)
        .alias("p_value"))
    return bh_fdr(tests, "test_id", "p_value", q=0.05).orderBy("rank")


# ------------------------------------------------- Krippendorff's alpha


@register("eval_krippendorff", """
WITH ids AS (SELECT DISTINCT (o_orderkey % 300)::BIGINT AS i FROM orders),
panel AS (
  SELECT i, r,
         CASE WHEN (i * 5 + r * 3) % 10 < 7 THEN i % 3
              ELSE (i % 3 + 1 + r % 2) % 3 END AS label
  FROM ids CROSS JOIN (SELECT unnest(range(5)) AS r)
  WHERE (i + 2 * r) % 5 <> 0
    AND NOT (i % 97 = 0 AND r > 0)),
nuc AS (SELECT i AS u, label AS c, count(*)::BIGINT AS n_uc
        FROM panel GROUP BY 1, 2),
per_u AS (
  SELECT u, sum(n_uc)::BIGINT AS n_u,
         sum(n_uc * n_uc)::BIGINT AS s2
  FROM nuc GROUP BY u HAVING sum(n_uc) >= 2),
do_t AS (
  SELECT count(*)::BIGINT AS n_units, sum(n_u)::BIGINT AS n_values,
         sum(round_even(CAST(n_u * n_u - s2 AS DOUBLE)
                        / CAST(n_u - 1 AS DOUBLE), 12)
             ::DECIMAL(38,12)) AS do_raw
  FROM per_u),
nc AS (SELECT c, sum(n_uc)::BIGINT AS n_c
       FROM nuc JOIN per_u ON nuc.u = per_u.u GROUP BY c),
de_t AS (SELECT sum((n_c * ((SELECT n_values FROM do_t) - n_c))
                    ::DECIMAL(38,0)) AS de_raw FROM nc)
SELECT n_units, n_values,
       CAST(do_raw AS DOUBLE) AS do_sum, CAST(de_raw AS DOUBLE) AS de_sum,
       round_even(CASE WHEN de_raw > 0
         THEN 1.0 - CAST(n_values - 1 AS DOUBLE)
              * CAST(do_raw AS DOUBLE) / CAST(de_raw AS DOUBLE)
         ELSE 1.0 END, 6) AS alpha
FROM do_t CROSS JOIN de_t
""")
def eval_krippendorff(spark, sf):
    """Krippendorff's alpha (ops/metrics.krippendorff_alpha) over a
    planted 300-item, up-to-5-rater panel with REAL missingness: a
    fifth of the slots are empty on a (item, rater) lattice (so n_u
    varies 2..5 — the shape fleiss_kappa's constant-n filter cannot
    rate), every-97th item keeps only rater 0 (n_u = 1, exercising
    the unpairable drop), and raters agree with the true label 70% of
    the time. The oracle replays the panel synth, both rollups, the
    12-dp DECIMAL Do sum, and the exact-integer De."""
    from lamapi_spark.ops.metrics import krippendorff_alpha

    o = load(spark, sf, "orders")
    ids = o.select((F.col("o_orderkey") % 300).alias("i")).distinct()
    raters = spark.range(5).select(F.col("id").alias("r"))
    li = F.col("i") % 3
    panel = (ids.crossJoin(raters)
             .filter(((F.col("i") + 2 * F.col("r")) % 5 != 0)
                     & ~((F.col("i") % 97 == 0) & (F.col("r") > 0)))
             .select(F.col("i").alias("item_id"),
                     F.col("r").alias("rater"),
                     F.when((F.col("i") * 5 + F.col("r") * 3) % 10 < 7, li)
                     .otherwise((li + 1 + F.col("r") % 2) % 3)
                     .alias("label")))
    return krippendorff_alpha(panel)


# ------------------------------------------------- grouped Kendall tau-b


@register("eval_kendall_tau", """
WITH v AS (
  SELECT 'g' || (o_orderkey % 400) AS key, o_orderkey,
         floor(CAST(o_totalprice AS DOUBLE) / 1000.0) AS x,
         CAST(o_totalprice AS DOUBLE)
           * (CASE WHEN o_custkey % 4 = 0 THEN -1 ELSE 1 END) AS y
  FROM orders),
p AS (
  SELECT a.key,
         sum(((a.x - b.x) * (a.y - b.y) > 0)::INT)::BIGINT AS nc,
         sum(((a.x - b.x) * (a.y - b.y) < 0)::INT)::BIGINT AS nd,
         sum((a.x = b.x AND a.y <> b.y)::INT)::BIGINT AS tx,
         sum((a.y = b.y AND a.x <> b.x)::INT)::BIGINT AS ty
  FROM v a JOIN v b ON a.key = b.key AND a.o_orderkey < b.o_orderkey
  GROUP BY a.key),
n AS (SELECT key, count(*)::BIGINT AS n FROM v GROUP BY key)
SELECT n.key AS key, n.n AS n, coalesce(p.nc, 0) AS nc,
       coalesce(p.nd, 0) AS nd, coalesce(p.tx, 0) AS tx,
       coalesce(p.ty, 0) AS ty,
       round_even(CASE WHEN (coalesce(p.nc,0) + coalesce(p.nd,0)
                             + coalesce(p.tx,0))
                       * (coalesce(p.nc,0) + coalesce(p.nd,0)
                          + coalesce(p.ty,0)) > 0
         THEN CAST(coalesce(p.nc,0) - coalesce(p.nd,0) AS DOUBLE)
              / sqrt(CAST((coalesce(p.nc,0) + coalesce(p.nd,0)
                           + coalesce(p.tx,0))
                          * (coalesce(p.nc,0) + coalesce(p.nd,0)
                             + coalesce(p.ty,0)) AS DOUBLE))
         ELSE 0.0 END, 6) AS tau
FROM n LEFT JOIN p ON n.key = p.key
WHERE n.n BETWEEN 2 AND 1000
ORDER BY key
""")
def eval_kendall_tau(spark, sf):
    """Per-group Kendall tau-b (ops/metrics.kendall_tau_by) between
    thousand-bucketed price (heavy x ties -> Tx is load-bearing) and
    a sign-flipped price copy (every 4th customer inverts -> tau sits
    mid-range, not +-1), grouped into 400 bounded keys. The oracle is
    the INDEPENDENT formulation: a pair self-join on (key, orderkey <
    orderkey) — no sorted array, no fold — green proves the in-row
    O(n^2) pair fold counts exactly the unordered-pair census."""
    from lamapi_spark.ops.metrics import kendall_tau_by

    o = load(spark, sf, "orders")
    v = o.select(
        F.concat(F.lit("g"), F.col("o_orderkey") % 400).alias("key"),
        F.floor(F.col("o_totalprice").cast("double") / 1000.0)
        .cast("double").alias("x"),
        (F.col("o_totalprice").cast("double")
         * F.when(F.col("o_custkey") % 4 == 0, -1).otherwise(1))
        .alias("y"))
    return kendall_tau_by(v, "key", "x", "y").orderBy("key")


# ------------------------------------------------- ROUGE-L


@register("eval_rouge_l", r"""
WITH RECURSIVE base AS (
  SELECT doc_id AS id,
    list_reverse(list_slice(CASE WHEN length(trim(lower(text))) > 0
      THEN string_split_regex(trim(lower(text)), '\s+') ELSE [] END,
      1, 15)) AS c,
    list_slice(CASE WHEN length(trim(lower(text))) > 0
      THEN string_split_regex(trim(lower(text)), '\s+') ELSE [] END,
      1, 15) AS r
  FROM documents),
dp AS (
  SELECT id, c, r, 0 AS i,
         list_transform(range(0, len(r) + 1), x -> 0) AS row
  FROM base
  UNION ALL
  SELECT id, c, r, i + 1,
    list_prepend(0, list_transform(range(1, len(r) + 1), j ->
      greatest(row[j + 1],
               list_max(list_transform(range(1, j + 1), k ->
                 row[k] + (r[k] = c[i + 1])::INT)))))
  FROM dp WHERE i < len(c))
SELECT id, len(c)::BIGINT AS cand_n, len(r)::BIGINT AS ref_n,
       row[len(r) + 1]::BIGINT AS lcs,
       round_even(row[len(r) + 1] / CAST(greatest(len(c), 1) AS DOUBLE), 6)
         AS p,
       round_even(row[len(r) + 1] / CAST(greatest(len(r), 1) AS DOUBLE), 6)
         AS r,
       round_even(2 * row[len(r) + 1]
                  / CAST(greatest(len(c) + len(r), 1) AS DOUBLE), 6) AS f1
FROM dp WHERE i = len(c) ORDER BY id
""")
def eval_rouge_l(spark, sf):
    """ROUGE-L (ops/metrics.rouge_l_scores) where each document's
    candidate is the REVERSE of its first 15 tokens and the reference
    is those tokens in order — LCS of a sequence against its reversal
    is the longest palindromic subsequence, so the DP's max-branch is
    load-bearing on every pair (a prefix candidate would make lcs ==
    cand_n trivially). The oracle is an INDEPENDENT formulation: a
    recursive CTE over candidate positions whose row update uses the
    prefix-max identity new[j] = max(prev[j], max_{k<=j}(prev[k-1] +
    eq_k)) — no sequential in-row dependency, so green proves the
    Spark nested fold against a structurally different DP."""
    from lamapi_spark.ops.metrics import rouge_l_scores

    d = load(spark, sf, "documents")
    t = F.trim(F.lower(F.col("text")))
    toks = F.slice(
        F.when(F.length(t) > 0, F.split(t, r"\s+"))
        .otherwise(F.array().cast("array<string>")), 1, 15)
    pairs = d.select(
        F.col("doc_id").alias("pair_id"),
        F.concat_ws(" ", F.reverse(toks)).alias("cand"),
        F.concat_ws(" ", toks).alias("ref"))
    return (rouge_l_scores(pairs, max_tokens=15)
            .withColumnRenamed("id", "id").orderBy("id"))


@register("eval_rouge_l_vec", r"""
WITH RECURSIVE base AS (
  SELECT doc_id AS id,
    list_reverse(list_slice(CASE WHEN length(trim(lower(text))) > 0
      THEN string_split_regex(trim(lower(text)), '\s+') ELSE [] END,
      1, 15)) AS c,
    list_slice(CASE WHEN length(trim(lower(text))) > 0
      THEN string_split_regex(trim(lower(text)), '\s+') ELSE [] END,
      1, 15) AS r
  FROM documents),
dp AS (
  SELECT id, c, r, 0 AS i,
         list_transform(range(0, len(r) + 1), x -> 0) AS row
  FROM base
  UNION ALL
  SELECT id, c, r, i + 1,
    list_prepend(0, list_transform(range(1, len(r) + 1), j ->
      greatest(row[j + 1],
               list_max(list_transform(range(1, j + 1), k ->
                 row[k] + (r[k] = c[i + 1])::INT)))))
  FROM dp WHERE i < len(c))
SELECT id, len(c)::BIGINT AS cand_n, len(r)::BIGINT AS ref_n,
       row[len(r) + 1]::BIGINT AS lcs,
       round_even(row[len(r) + 1] / CAST(greatest(len(c), 1) AS DOUBLE), 6)
         AS p,
       round_even(row[len(r) + 1] / CAST(greatest(len(r), 1) AS DOUBLE), 6)
         AS r,
       round_even(2 * row[len(r) + 1]
                  / CAST(greatest(len(c) + len(r), 1) AS DOUBLE), 6) AS f1
FROM dp WHERE i = len(c) ORDER BY id
""")
def eval_rouge_l_vec(spark, sf):
    """The Arrow-batched numpy arm of rouge_l_scores (engine='pandas',
    round-5 BENCH crossover: ~8x the interpreted fold) against the
    IDENTICAL independent recursive-CTE oracle as eval_rouge_l —
    green proves the vectorized LCS (running-max identity) on the
    palindromic-subsequence stress input."""
    from lamapi_spark.ops.metrics import rouge_l_scores

    d = load(spark, sf, "documents")
    t = F.trim(F.lower(F.col("text")))
    toks = F.slice(
        F.when(F.length(t) > 0, F.split(t, r"\s+"))
        .otherwise(F.array().cast("array<string>")), 1, 15)
    pairs = d.select(
        F.col("doc_id").alias("pair_id"),
        F.concat_ws(" ", F.reverse(toks)).alias("cand"),
        F.concat_ws(" ", toks).alias("ref"))
    return (rouge_l_scores(pairs, max_tokens=15, engine="pandas")
            .orderBy("id"))


# ------------------------------------------------- TF-IDF keywords


@register("corpus_tfidf_keywords", r"""
WITH tf AS (
  SELECT doc_id, unnest(CASE WHEN length(trim(lower(text))) > 0
           THEN string_split_regex(trim(lower(text)), '\s+')
           ELSE [] END) AS token
  FROM documents),
tfc AS (SELECT doc_id, token, count(*)::BIGINT AS tf
        FROM tf GROUP BY doc_id, token),
dfc AS (SELECT token, count(*)::BIGINT AS df FROM tfc GROUP BY token),
n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM documents),
scored AS (
  SELECT tfc.doc_id, tfc.token, tfc.tf, dfc.df,
         round_even(CAST(tfc.tf AS DOUBLE)
                    * (ln(CAST(n.n + 1 AS DOUBLE)
                          / CAST(dfc.df + 1 AS DOUBLE)) + 1.0), 6)
           AS score
  FROM tfc JOIN dfc USING (token) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token ASC) AS rk
  FROM scored)
SELECT doc_id, token, tf, df, score, rk::INT AS rk
FROM ranked WHERE rk <= 5 ORDER BY doc_id, rk
""")
def corpus_tfidf_keywords(spark, sf):
    """Per-document top-5 TF-IDF keywords (ops/corpus.tfidf_keywords)
    over the documents table — the synthetic corpus's template
    vocabulary makes df near-N for filler words and small for the
    rarer terms, so idf genuinely reorders raw term counts. The
    oracle replays tokenization, both count aggs, the smooth-idf
    expression in the same float order, and the (score desc, token
    asc) tie-broken window."""
    from lamapi_spark.ops.corpus import tfidf_keywords

    d = load(spark, sf, "documents")
    return (tfidf_keywords(d, "doc_id", "text", k=5)
            .orderBy("doc_id", "rk"))


# ------------------------------------------------- bipartiteness audit


@register("graph_bipartite", """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 'n' || k AS a,
         'n' || ((k // 24) * 24 + ((k % 24 + 1) % 24)) AS b
  FROM (SELECT (o_orderkey % 240)::BIGINT AS k FROM orders)
  UNION SELECT 'n0', 'n2'),
sym AS (SELECT a AS src, b AS dst FROM e0
        UNION SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM sym),
reach(start, node, d) AS (
  SELECT node, node, 0 FROM nodes
  UNION
  SELECT reach.start, sym.dst, reach.d + 1
  FROM reach JOIN sym ON reach.node = sym.src WHERE reach.d < 24),
comp AS (SELECT start AS node, min(node) AS component
         FROM reach GROUP BY start),
reps AS (SELECT node AS seed FROM comp WHERE node = component),
walk(node, d) AS (
  SELECT seed, 0 FROM reps
  UNION
  SELECT sym.dst, walk.d + 1
  FROM walk JOIN sym ON walk.node = sym.src WHERE walk.d < 16),
dist AS (SELECT node, min(d) AS dist FROM walk GROUP BY node),
par AS (SELECT comp.node, comp.component, dist.dist % 2 AS par
        FROM comp LEFT JOIN dist ON comp.node = dist.node),
ce AS (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y FROM e0),
ex AS (SELECT px.component,
              (px.par IS NOT NULL AND py.par IS NOT NULL) AS known,
              (px.par IS NOT NULL AND py.par IS NOT NULL
               AND (ce.x = ce.y OR px.par = py.par)) AS odd
       FROM ce JOIN par px ON ce.x = px.node
               JOIN par py ON ce.y = py.node),
e_per AS (SELECT component, sum(known::INT)::BIGINT AS n_edges,
                 sum(odd::INT)::BIGINT AS odd_edges
          FROM ex GROUP BY component),
n_per AS (SELECT component, count(*)::BIGINT AS n_nodes,
                 sum((par IS NULL)::INT)::BIGINT AS n_unreached
          FROM par GROUP BY component)
SELECT n_per.component, n_nodes,
       coalesce(n_edges, 0) AS n_edges,
       coalesce(odd_edges, 0) AS odd_edges, n_unreached,
       CASE WHEN n_unreached > 0 THEN NULL
            ELSE coalesce(odd_edges, 0) = 0 END AS is_bipartite
FROM n_per LEFT JOIN e_per ON n_per.component = e_per.component
ORDER BY n_per.component
""")
def graph_bipartite(spark, sf):
    """Bipartiteness audit (ops/graph.bipartite_check) over ten
    planted 24-cycles (even cycles — bipartite) with ONE chord in
    block 0 (n0-n2 closes a triangle, so exactly that component reads
    is_bipartite = false with one odd edge... the odd-edge COUNT is
    parity-witness edges, oracle-replayed, not hand-assumed). The
    oracle recomputes components (bounded recursive reachability +
    min-label), BFS parities from the same min-node representatives,
    and the canonical edge census — fully independent of the Spark
    fixpoint loops."""
    from lamapi_spark.ops.graph import bipartite_check

    o = load(spark, sf, "orders")
    k = (F.col("o_orderkey") % 240).cast("long")
    ring = o.select(
        F.concat(F.lit("n"), k).alias("src"),
        F.concat(F.lit("n"), (k - k % 24)
                 + ((k % 24 + 1) % 24)).alias("dst")).distinct()
    chord = spark.createDataFrame([("n0", "n2")], "src string, dst string")
    edges = ring.unionByName(chord).distinct()
    return bipartite_check(edges).orderBy("component")


# ------------------------------------------------- Allen interval algebra


_ALLEN_SYNTH = """
iv AS (
  SELECT 'k' || (i // 12) AS key, 'i' || i AS id, p,
         CASE p
           WHEN 6 THEN (0 * 31) % 50
           WHEN 7 THEN ((1 * 31) % 50) + 10 + 1 * 7
           WHEN 8 THEN (2 * 31) % 50
           WHEN 9 THEN ((3 * 31) % 50) + 10 + 3 * 7 - 3
           WHEN 10 THEN ((4 * 31) % 50) + 1
           WHEN 11 THEN ((5 * 31) % 50) - 1
           ELSE (p * 31) % 50 END::BIGINT AS lo_us,
         CASE p
           WHEN 6 THEN ((0 * 31) % 50) + 10 + 0 * 7
           WHEN 7 THEN ((1 * 31) % 50) + 10 + 1 * 7 + 9
           WHEN 8 THEN ((2 * 31) % 50) + 5
           WHEN 9 THEN ((3 * 31) % 50) + 10 + 3 * 7
           WHEN 10 THEN ((4 * 31) % 50) + 10 + 4 * 7 - 1
           WHEN 11 THEN ((5 * 31) % 50) + 10 + 5 * 7 + 1
           ELSE ((p * 31) % 50) + 10 + p * 7 END::BIGINT AS hi_us
  FROM (SELECT DISTINCT (o_orderkey % 600)::BIGINT AS i,
               (o_orderkey % 12)::BIGINT AS p FROM orders))
"""


@register("events_allen_relations", f"""
WITH {_ALLEN_SYNTH},
p AS (
  SELECT a.key, a.id AS id_a, b.id AS id_b,
         a.lo_us AS al, a.hi_us AS ah, b.lo_us AS bl, b.hi_us AS bh
  FROM iv a JOIN iv b ON a.key = b.key AND a.id < b.id)
SELECT key, id_a, id_b,
       CASE WHEN al = bl AND ah = bh THEN 'equals'
            WHEN ah < bl THEN 'before'
            WHEN bh < al THEN 'after'
            WHEN ah = bl THEN 'meets'
            WHEN bh = al THEN 'met_by'
            WHEN al = bl AND ah < bh THEN 'starts'
            WHEN al = bl AND ah > bh THEN 'started_by'
            WHEN ah = bh AND al > bl THEN 'finishes'
            WHEN ah = bh AND al < bl THEN 'finished_by'
            WHEN al > bl AND ah < bh THEN 'during'
            WHEN al < bl AND ah > bh THEN 'contains'
            WHEN al < bl AND ah < bh THEN 'overlaps'
            ELSE 'overlapped_by' END AS relation
FROM p ORDER BY key, id_a, id_b
""")
def events_allen_relations(spark, sf):
    """Allen interval-algebra census (ops/temporal.allen_relations)
    over 50 keys x 12 planted validity intervals: positions 0-5 are
    pseudo-random spans, and positions 6-11 are constructed AGAINST
    them — a copy of p0 (equals), a span starting at p1's end
    (meets), a shared-start prefix of p2 (starts), a shared-end
    suffix of p3 (finishes), a strict interior of p4 (during), and a
    strict cover of p5 (contains) — so the measure-zero equality
    relations all occur by construction, not luck. The oracle
    replays the synth and the ordered decision cascade over its own
    pair join."""
    from lamapi_spark.ops.temporal import allen_relations

    o = load(spark, sf, "orders")
    d = o.select((F.col("o_orderkey") % 600).alias("i"),
                 (F.col("o_orderkey") % 12).alias("p")).distinct()
    base = F.col("p") * 31 % 50
    blen = base + 10 + F.col("p") * 7
    lo = (F.when(F.col("p") == 6, F.lit(0))
          .when(F.col("p") == 7, F.lit((1 * 31) % 50 + 10 + 1 * 7))
          .when(F.col("p") == 8, F.lit((2 * 31) % 50))
          .when(F.col("p") == 9, F.lit((3 * 31) % 50 + 10 + 3 * 7 - 3))
          .when(F.col("p") == 10, F.lit((4 * 31) % 50 + 1))
          .when(F.col("p") == 11, F.lit((5 * 31) % 50 - 1))
          .otherwise(base)).cast("long")
    hi = (F.when(F.col("p") == 6, F.lit((0 * 31) % 50 + 10))
          .when(F.col("p") == 7, F.lit((1 * 31) % 50 + 10 + 1 * 7 + 9))
          .when(F.col("p") == 8, F.lit((2 * 31) % 50 + 5))
          .when(F.col("p") == 9, F.lit((3 * 31) % 50 + 10 + 3 * 7))
          .when(F.col("p") == 10, F.lit((4 * 31) % 50 + 10 + 4 * 7 - 1))
          .when(F.col("p") == 11, F.lit((5 * 31) % 50 + 10 + 5 * 7 + 1))
          .otherwise(blen)).cast("long")
    iv = d.select(
        F.concat(F.lit("k"), (F.col("i") / 12).cast("long")).alias("key"),
        F.concat(F.lit("i"), F.col("i")).alias("id"),
        lo.alias("lo_us"), hi.alias("hi_us"))
    return (allen_relations(iv).orderBy("key", "id_a", "id_b"))


# ------------------------------------------------- stress centrality


@register("graph_stress_centrality", """
WITH RECURSIVE ids AS (
  SELECT DISTINCT (o_orderkey % 16)::BIGINT AS i FROM orders),
e0 AS (
  SELECT 'g' || i AS src, 'g' || (i + 1) AS dst FROM ids WHERE i % 8 < 7
  UNION SELECT 'g' || i, 'g' || (i + 8) FROM ids WHERE i < 8),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
walks(s, node, d, path) AS (
  SELECT src, src, 0, [src] FROM (SELECT DISTINCT src FROM sym)
  UNION ALL
  SELECT w.s, sym.dst, w.d + 1, list_append(w.path, sym.dst)
  FROM walks w JOIN sym ON w.node = sym.src
  WHERE w.d < 9 AND NOT list_contains(w.path, sym.dst)),
sp AS (SELECT s, node AS t, min(d) AS dmin FROM walks GROUP BY s, node),
short AS (
  SELECT w.s, w.node AS t, w.path
  FROM walks w JOIN sp ON w.s = sp.s AND w.node = sp.t AND w.d = sp.dmin
  WHERE w.s <> w.node),
interior AS (
  SELECT s, t, unnest(list_slice(path, 2, len(path) - 1)) AS v
  FROM short)
SELECT v AS node, count(*)::DECIMAL(38,0) AS stress
FROM interior GROUP BY v ORDER BY node
""")
def graph_stress_centrality(spark, sf):
    """Exact stress centrality (ops/graph.stress_centrality, every
    node a seed) on a 2x8 grid graph — the grid's parallel rows give
    every inner pair MULTIPLE shortest paths (up to binomial
    multiplicity), so the sigma-weighted continuation products are
    load-bearing, not all 1s as on a tree. The oracle is maximally
    independent: it ENUMERATES all simple walks up to the diameter
    with a recursive CTE, keeps exactly the shortest per (s, t), and
    counts interior-node occurrences — no BFS layers, no sigma, no
    backward recurrence — so green proves the Brandes two-phase
    against a from-first-principles path census."""
    from lamapi_spark.ops.graph import stress_centrality

    o = load(spark, sf, "orders")
    ids = o.select((F.col("o_orderkey") % 16).alias("i")).distinct()
    right = (ids.filter(F.col("i") % 8 < 7)
             .select(F.concat(F.lit("g"), F.col("i")).alias("src"),
                     F.concat(F.lit("g"), F.col("i") + 1).alias("dst")))
    down = (ids.filter(F.col("i") < 8)
            .select(F.concat(F.lit("g"), F.col("i")).alias("src"),
                    F.concat(F.lit("g"), F.col("i") + 8).alias("dst")))
    e0 = right.unionByName(down).distinct()
    sym = (e0.unionByName(e0.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
           .distinct())
    seeds = sym.select(F.col("src").alias("seed")).distinct()
    return (stress_centrality(sym, seeds, max_depth=9)
            .filter(F.col("stress") > 0).orderBy("node"))


# ------------------------------------------------- community conductance


@register("graph_conductance", """
WITH ids AS (SELECT DISTINCT (o_orderkey % 240)::BIGINT AS k FROM orders),
ring AS (
  SELECT 'n' || k AS src,
         'n' || ((k // 24) * 24 + ((k % 24 + 1) % 24)) AS dst
  FROM ids),
cross_e AS (
  SELECT 'n' || (b * 24) AS src, 'n' || (((b + 1) % 10) * 24) AS dst
  FROM (SELECT DISTINCT (k // 24)::BIGINT AS b FROM ids)),
e0 AS (SELECT src, dst FROM ring UNION SELECT src, dst FROM cross_e),
ce AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
       FROM e0 WHERE src <> dst),
lab AS (SELECT 'n' || k AS node, 'b' || (k // 24) AS community FROM ids),
ex AS (SELECT lx.community AS cx, ly.community AS cy
       FROM ce JOIN lab lx ON ce.x = lx.node
               JOIN lab ly ON ce.y = ly.node),
ends AS (SELECT cx AS community, (cx <> cy) AS cut FROM ex
         UNION ALL SELECT cy, (cx <> cy) FROM ex),
per AS (SELECT community, count(*)::BIGINT AS vol,
               sum(cut::INT)::BIGINT AS cut
        FROM ends GROUP BY community),
nn AS (SELECT community, count(*)::BIGINT AS n_nodes
       FROM lab GROUP BY community),
tot AS (SELECT sum(vol)::BIGINT AS tv FROM per)
SELECT nn.community, n_nodes, coalesce(vol, 0) AS vol,
       coalesce(cut, 0) AS cut,
       CASE WHEN least(coalesce(vol, 0), tv - coalesce(vol, 0)) > 0
            THEN round_even(coalesce(cut, 0)
                 / CAST(least(coalesce(vol, 0), tv - coalesce(vol, 0))
                        AS DOUBLE), 6)
            ELSE 0.0 END AS conductance
FROM nn LEFT JOIN per ON nn.community = per.community
CROSS JOIN tot ORDER BY nn.community
""")
def graph_conductance(spark, sf):
    """Community conductance (ops/graph.community_conductance) over
    ten 24-cycles joined into a ring of blocks by one cross edge per
    adjacent block pair — each community has vol 50 (48 internal
    endpoints + 2 boundary) and cut 2, so phi = 2/50 uniformly, and
    the min(vol, total-vol) side is load-bearing (450 vs 50). The
    oracle replays the canonical edge census, both endpoint
    projections, and every guarded ratio."""
    from lamapi_spark.ops.graph import community_conductance

    o = load(spark, sf, "orders")
    k = (F.col("o_orderkey") % 240).cast("long")
    ids = o.select(k.alias("k")).distinct()
    ring = ids.select(
        F.concat(F.lit("n"), F.col("k")).alias("src"),
        F.concat(F.lit("n"), (F.col("k") - F.col("k") % 24)
                 + ((F.col("k") % 24 + 1) % 24)).alias("dst"))
    blocks = ids.select((F.col("k") / 24).cast("long").alias("b")).distinct()
    cross = blocks.select(
        F.concat(F.lit("n"), F.col("b") * 24).alias("src"),
        F.concat(F.lit("n"), ((F.col("b") + 1) % 10) * 24).alias("dst"))
    edges = ring.unionByName(cross).distinct()
    lab = ids.select(
        F.concat(F.lit("n"), F.col("k")).alias("node"),
        F.concat(F.lit("b"), (F.col("k") / 24).cast("long"))
        .alias("community"))
    return community_conductance(edges, lab).orderBy("community")


# ------------------------------------------------- multiclass MCC


@register("eval_mcc", """
WITH t AS (
  SELECT o_orderkey AS id, 'c' || (o_orderkey % 4) AS label
  FROM orders WHERE o_orderkey % 13 <> 0),
p AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 5 = 0 THEN 'c' || ((o_orderkey + 1) % 4)
              ELSE 'c' || (o_orderkey % 4) END AS label
  FROM orders WHERE o_orderkey % 11 <> 0),
j AS (SELECT t.label AS tl, p.label AS pl
      FROM t JOIN p ON t.id = p.id),
per_t AS (SELECT tl AS k, count(*)::HUGEINT AS tk FROM j GROUP BY tl),
per_p AS (SELECT pl AS k, count(*)::HUGEINT AS pk FROM j GROUP BY pl),
m AS (SELECT sum(coalesce(pk, 0) * coalesce(tk, 0)) AS pt,
             sum(coalesce(pk, 0) * coalesce(pk, 0)) AS pp,
             sum(coalesce(tk, 0) * coalesce(tk, 0)) AS tt
      FROM per_t FULL OUTER JOIN per_p USING (k)),
base AS (SELECT count(*)::HUGEINT AS n,
                sum((tl = pl)::INT)::HUGEINT AS c FROM j)
SELECT CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS correct,
       CASE WHEN (n * n - pp) > 0 AND (n * n - tt) > 0
            THEN round_even(CAST(c * n - pt AS DOUBLE)
                 / sqrt(CAST(n * n - pp AS DOUBLE)
                        * CAST(n * n - tt AS DOUBLE)), 6)
            ELSE 0.0 END AS mcc
FROM base CROSS JOIN m
""")
def eval_mcc(spark, sf):
    """Multiclass Matthews correlation (ops/metrics.mcc_multiclass)
    for the 4-class rotating-error predictor (every 5th item shifts
    one class over) with DISJOINT missing slices on each side (every
    11th prediction and 13th truth absent — the inner join must
    shrink n before any marginal is counted). The oracle replays the
    join, the diagonal, both marginals, and the R_K identity in
    HUGEINT."""
    from lamapi_spark.ops.metrics import mcc_multiclass

    o = load(spark, sf, "orders")
    ok = F.col("o_orderkey")
    truth = (o.filter(ok % 13 != 0)
             .select(ok.alias("id"),
                     F.concat(F.lit("c"), ok % 4).alias("label")))
    pred = (o.filter(ok % 11 != 0)
            .select(ok.alias("id"),
                    F.when(ok % 5 == 0,
                           F.concat(F.lit("c"), (ok + 1) % 4))
                    .otherwise(F.concat(F.lit("c"), ok % 4))
                    .alias("label")))
    return mcc_multiclass(pred, truth, ["id"])


# ------------------------------------------------- 1-D Wasserstein


@register("eval_wasserstein", """
WITH a AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
           WHERE o_orderkey % 2 = 0),
b AS (SELECT CAST(o_totalprice AS DOUBLE) * 1.1 + 5000.0 AS v
      FROM orders WHERE o_orderkey % 2 = 1),
cnt AS (
  SELECT v, sum(ca)::BIGINT AS ca, sum(cb)::BIGINT AS cb FROM (
    SELECT v, 1 AS ca, 0 AS cb FROM a
    UNION ALL SELECT v, 0, 1 FROM b) GROUP BY v),
t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM cnt),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v)::DECIMAL(38,0) AS cua,
         sum(cb) OVER (ORDER BY v)::DECIMAL(38,0) AS cub,
         lead(v) OVER (ORDER BY v) AS nxt
  FROM cnt),
terms AS (
  SELECT CASE WHEN nxt IS NOT NULL THEN
           round_even(CAST(abs(cua * t.nb - cub * t.na) AS DOUBLE)
                      / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE))
                      * (nxt - v), 9)
         ELSE 0.0 END AS term, t.na, t.nb
  FROM cum CROSS JOIN t)
SELECT na AS n_a, nb AS n_b,
       CAST(sum(term::DECIMAL(38,9)) AS DOUBLE) AS w1
FROM terms GROUP BY na, nb
""")
def eval_wasserstein(spark, sf):
    """Exact 1-D Wasserstein-1 (ops/metrics.wasserstein_1d) between
    the same planted location+scale price drift as eval_ks_two_sample
    — the two shift tests share one synth, so KS's supremum and W1's
    integral cross-check each other on the same grid. The oracle is
    the INDEPENDENT global-window formulation (cumulative sums and
    lead over the whole distinct-value grid — no buckets, no
    boundary patch), so green proves the two-level scan plus the
    bucket-boundary next-value stitching against plain SQL."""
    from lamapi_spark.ops.metrics import wasserstein_1d

    o = load(spark, sf, "orders")
    ok = F.col("o_orderkey")
    a = (o.filter(ok % 2 == 0)
         .select(F.col("o_totalprice").cast("double").alias("v")))
    b = (o.filter(ok % 2 == 1)
         .select((F.col("o_totalprice").cast("double") * 1.1 + 5000.0)
                 .alias("v")))
    return wasserstein_1d(a, b)


# ------------------------------------------------- Heaps-law growth


@register("corpus_vocab_growth", r"""
WITH ranks AS (
  SELECT doc_id, text,
         row_number() OVER (ORDER BY doc_id)::BIGINT AS rank
  FROM documents),
toks_b AS (
  SELECT floor(log2(rank))::BIGINT AS g,
         sum(len(string_split_regex(lower(text), '\s+')))::BIGINT AS tok,
         count(*)::BIGINT AS docs
  FROM ranks GROUP BY 1),
types_b AS (
  SELECT floor(log2(fr))::BIGINT AS g, count(*)::BIGINT AS new FROM (
    SELECT t, min(rank) AS fr FROM (
      SELECT rank, unnest(string_split_regex(lower(text), '\s+')) AS t
      FROM ranks) GROUP BY t)
  GROUP BY 1)
SELECT CAST(pow(2.0, toks_b.g + 1) AS BIGINT) AS checkpoint_docs,
       sum(docs) OVER w AS cum_docs,
       sum(tok) OVER w AS cum_tokens,
       sum(coalesce(new, 0)) OVER w AS cum_types
FROM toks_b LEFT JOIN types_b ON toks_b.g = types_b.g
WINDOW w AS (ORDER BY toks_b.g ROWS UNBOUNDED PRECEDING)
ORDER BY checkpoint_docs
""")
def corpus_vocab_growth(spark, sf):
    """Heaps-law vocabulary growth (ops/textstats.vocab_growth) over
    the documents corpus in doc_id order — the template vocabulary
    saturates early, so cum_types visibly bends while cum_tokens
    stays linear (the curve shape is itself the check). The oracle
    replays ranks with a plain global row_number, the log2 bucketing
    of both arrival frames, and the running sums."""
    from lamapi_spark.ops.textstats import vocab_growth

    return (vocab_growth(load(spark, sf, "documents"))
            .orderBy("checkpoint_docs"))


# ------------------------------------------------- BIO span F1


_BIO_SYNTH = """
tok AS (
  SELECT (i // 12)::BIGINT AS seq, (i % 12 + 1)::BIGINT AS pos,
         CASE
           WHEN (i // 12) % 5 = 0 AND (i % 12 + 1) IN (4) THEN 'B'
           WHEN (i // 12) % 5 = 0 AND (i % 12 + 1) IN (5, 6) THEN 'I'
           WHEN (i // 12) % 5 = 0 AND (i % 12 + 1) = 3 THEN 'O'
           WHEN (i % 12 + 1) = 3 THEN 'B'
           WHEN (i % 12 + 1) IN (4, 5) THEN 'I'
           WHEN (i % 12 + 1) = 9 AND (i // 12) % 7 <> 0 THEN 'B'
           WHEN (i % 12 + 1) = 11 THEN 'I'
           ELSE 'O' END AS tag
  FROM (SELECT DISTINCT (o_orderkey % 6000)::BIGINT AS i FROM orders)),
gold AS (
  SELECT (i // 12)::BIGINT AS seq, (i % 12 + 1)::BIGINT AS pos,
         CASE WHEN (i % 12 + 1) = 3 THEN 'B'
              WHEN (i % 12 + 1) IN (4, 5) THEN 'I'
              WHEN (i % 12 + 1) = 9 THEN 'B'
              WHEN (i % 12 + 1) = 11 THEN 'I'
              ELSE 'O' END AS tag
  FROM (SELECT DISTINCT (o_orderkey % 6000)::BIGINT AS i FROM orders))
"""


@register("eval_bio_span_f1", f"""
WITH {_BIO_SYNTH},
pspan AS (
  SELECT seq, grp, min(pos) AS s, max(pos) AS e FROM (
    SELECT seq, pos, tag,
           sum(st::INT) OVER (PARTITION BY seq ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS grp
    FROM (
      SELECT seq, pos, tag,
             (tag = 'B' OR (tag = 'I'
              AND coalesce(lag(tag) OVER (PARTITION BY seq
                                          ORDER BY pos), 'O') = 'O'))
               AS st
      FROM tok))
  WHERE tag <> 'O' GROUP BY seq, grp),
gspan AS (
  SELECT seq, grp, min(pos) AS s, max(pos) AS e FROM (
    SELECT seq, pos, tag,
           sum(st::INT) OVER (PARTITION BY seq ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS grp
    FROM (
      SELECT seq, pos, tag,
             (tag = 'B' OR (tag = 'I'
              AND coalesce(lag(tag) OVER (PARTITION BY seq
                                          ORDER BY pos), 'O') = 'O'))
               AS st
      FROM gold))
  WHERE tag <> 'O' GROUP BY seq, grp),
c AS (SELECT (SELECT count(*) FROM pspan)::BIGINT AS pn,
             (SELECT count(*) FROM gspan)::BIGINT AS gn,
             (SELECT count(*) FROM pspan JOIN gspan
              USING (seq, s, e))::BIGINT AS tp)
SELECT pn AS pred_spans, gn AS gold_spans, tp,
       round_even(CASE WHEN pn > 0 THEN tp / CAST(pn AS DOUBLE)
                       ELSE 0.0 END, 6) AS p,
       round_even(CASE WHEN gn > 0 THEN tp / CAST(gn AS DOUBLE)
                       ELSE 0.0 END, 6) AS r,
       round_even(CASE WHEN pn + gn > 0
                       THEN 2 * tp / CAST(pn + gn AS DOUBLE)
                       ELSE 0.0 END, 6) AS f1
FROM c
""")
def eval_bio_span_f1(spark, sf):
    """Span-level conlleval F1 (ops/metrics.bio_span_f1) over 500
    planted 12-token BIO sequences: gold has spans (3-5), (9,9) and
    an orphan-I (11,11) per sequence; the predictor SHIFTS the first
    span right by one in every 5th sequence (boundary error — zero
    credit under exact span match, the conlleval point) and DROPS the
    (9,9) span in every 7th. The oracle extracts spans with an
    INDEPENDENT formulation — a lag-window start flag and a running
    start count as the span group key, no in-row fold — so green
    proves the fold's segmentation (incl. the orphan-I rule) against
    plain SQL windows."""
    from lamapi_spark.ops.metrics import bio_span_f1

    o = load(spark, sf, "orders")
    d = o.select((F.col("o_orderkey") % 6000).alias("i")).distinct()
    seq = (F.col("i") / 12).cast("long")
    pos = (F.col("i") % 12 + 1).cast("long")
    gold_tag = (F.when(pos == 3, "B").when(pos.isin(4, 5), "I")
                .when(pos == 9, "B").when(pos == 11, "I")
                .otherwise("O"))
    pred_tag = (
        F.when((seq % 5 == 0) & (pos == 4), "B")
        .when((seq % 5 == 0) & pos.isin(5, 6), "I")
        .when((seq % 5 == 0) & (pos == 3), "O")
        .when(pos == 3, "B").when(pos.isin(4, 5), "I")
        .when((pos == 9) & (seq % 7 != 0), "B")
        .when(pos == 11, "I").otherwise("O"))
    gold = d.select(seq.alias("seq"), pos.alias("pos"),
                    gold_tag.alias("tag"))
    pred = d.select(seq.alias("seq"), pos.alias("pos"),
                    pred_tag.alias("tag"))
    return bio_span_f1(pred, gold, ["seq"])


# ------------------------------------------------- Zipf fit


@register("corpus_zipf_fit", r"""
WITH tf AS (
  SELECT t, count(*)::BIGINT AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\s+')) AS t
    FROM documents) GROUP BY t),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t ASC)::BIGINT AS rank
  FROM tf QUALIFY rank <= 1000),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(round_even(ln(CAST(rank AS DOUBLE)), 12)
             ::DECIMAL(38,12)) AS sx,
         sum(round_even(ln(CAST(c AS DOUBLE)), 12)
             ::DECIMAL(38,12)) AS sy,
         sum(round_even(ln(CAST(rank AS DOUBLE))
                        * ln(CAST(c AS DOUBLE)), 12)
             ::DECIMAL(38,12)) AS sxy,
         sum(round_even(ln(CAST(rank AS DOUBLE))
                        * ln(CAST(rank AS DOUBLE)), 12)
             ::DECIMAL(38,12)) AS sxx,
         sum(round_even(ln(CAST(c AS DOUBLE))
                        * ln(CAST(c AS DOUBLE)), 12)
             ::DECIMAL(38,12)) AS syy
  FROM ranked)
SELECT n AS n_ranks,
       round_even(CASE WHEN n >= 2 AND (n * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
         THEN (n * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (n * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         ELSE 0.0 END, 6) AS slope,
       round_even(CASE WHEN n >= 2 AND (n * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
         THEN (CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (n * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
              * CAST(sx AS DOUBLE)) / n
         ELSE 0.0 END, 6) AS intercept,
       round_even(CASE WHEN n >= 2 AND (n * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                  AND (n * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
         THEN ((n * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               * (n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
              / ((n * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (n * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         ELSE 0.0 END, 6) AS r2
FROM m
""")
def corpus_zipf_fit(spark, sf):
    """Zipf rank-frequency OLS (ops/textstats.zipf_fit) over the
    documents corpus's top-1000 token ranks — the synthetic template
    vocabulary is nearly uniform, so the fitted exponent sits far
    from natural text's -1 (the diagnosis the operator exists to
    make). The oracle replays ranks with a global window (frequency
    desc, token asc — the Spark side uses the two-level scan on
    (-freq, token)), the 12-dp DECIMAL moment sums, and every closed
    form."""
    from lamapi_spark.ops.textstats import zipf_fit

    return zipf_fit(load(spark, sf, "documents"))
