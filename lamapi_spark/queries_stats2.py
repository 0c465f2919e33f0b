"""Round-4 tenth-part sweep: governance (k-anonymity / l-diversity),
forecast-quality decomposition (Brier / Murphy), sequence analytics
(per-key autocorrelation, Markov role-transition stationary
distribution, gapped sequential patterns), robust trend (Theil-Sen),
and character-level MT eval (chrF) — measurement and release-gate
surface a fleet-scale training-data pipeline runs beside the
round-4 stats family. Every query has a DuckDB oracle that rebuilds
the dataflow independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lamapi_spark.queries import load, register

# ------------------------------------------------- k-anonymity census


@register("privacy_k_anonymity", """
WITH g AS (
  SELECT c_mktsegment, c_nationkey, c_custkey % 3 AS zip_bin,
         count(*)::BIGINT AS k,
         count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'pos'
                             ELSE 'neg' END)::BIGINT AS l
  FROM customer GROUP BY 1, 2, 3)
SELECT k, count(*)::BIGINT AS n_groups, sum(k)::BIGINT AS n_rows,
       sum(CASE WHEN k < 5 THEN 1 ELSE 0 END)::BIGINT AS groups_below_k,
       sum(CASE WHEN l < 2 THEN 1 ELSE 0 END)::BIGINT AS groups_low_l
FROM g GROUP BY k ORDER BY k
""")
def privacy_k_anonymity(spark, sf):
    """k-anonymity / l-diversity release census
    (ops/governance.k_anonymity_census) over customer with the QI
    tuple (mktsegment, nationkey, custkey%3) — the %3 bin plays the
    zip-code role, keeping sub-threshold groups real at every sf — and the
    account-balance sign as the sensitive attribute (l in {1, 2}, so
    the l-diversity branch is load-bearing). The oracle replays the
    QI grouping, both thresholds, and the census rollup."""
    from lamapi_spark.ops.governance import k_anonymity_census

    c = load(spark, sf, "customer").select(
        "c_mktsegment", "c_nationkey",
        (F.col("c_custkey") % 3).alias("zip_bin"),
        F.when(F.col("c_acctbal") >= 0, F.lit("pos"))
        .otherwise(F.lit("neg")).alias("bal_sign"))
    return k_anonymity_census(
        c, ["c_mktsegment", "c_nationkey", "zip_bin"], "bal_sign",
        k_threshold=5, l_threshold=2).orderBy("k")
