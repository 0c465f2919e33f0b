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
