"""Deterministic, mergeable sketches — the builder's-brief "novel
sketch" custom-operator axis (reference analogue: none). Both sketches
are chosen for ENGINE-PORTABLE determinism: identical results at any
parallelism, any partitioning, and exactly reproducible in the DuckDB
SQL oracles (unlike HLL/t-digest, whose register/centroid layouts are
engine- and merge-order-dependent).

- KMV (k-minimum-values) distinct counting: the sketch IS the sorted
  array of the k smallest 48-bit md5 hashes of the distinct values.
  Merge = union, re-take k smallest — associative, commutative,
  idempotent, so daily/partition sketches roll up to exactly the
  sketch of the union (tested in tests/test_temporal.py).
- Fixed-width histogram quantiles: the sketch is (bin, count); merge =
  counts add. Quantile estimate interpolates linearly inside the
  target bin — deterministic given only the bin width.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 64
HASH48_SPACE = float(2 ** 48)


def hash48(col) -> F.Column:
    """The repo's engine-portable hash: first 12 hex chars of md5 as a
    48-bit integer — exact in BIGINT and DOUBLE alike (fits float53),
    so estimates reproduce bit-for-bit in any engine."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12),
                  16, 10).cast("long")


def kmv_sketch(df: DataFrame, keys: Sequence[str], col: str,
               k: int = KMV_K) -> DataFrame:
    """Per key group: ``kmv`` = ascending array of the k smallest
    distinct 48-bit hashes of ``col`` (shorter when the group has fewer
    distinct values — then the sketch is EXACT).

    Scale shape: distinct on (keys, hash) then a row_number window
    keyed on the group — the only rows that survive to the collect are
    the <= k winners per group, so the collected array is bounded by k
    regardless of group size. (A single-agg ``slice(array_sort(
    collect_set))`` would hold ALL distinct hashes of a group in one
    aggregation buffer — unbounded; this shape never does.)"""
    h = df.select(*keys, hash48(col).alias("h")).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return (h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .groupBy(*keys)
            .agg(F.sort_array(F.collect_list("h")).alias("kmv")))


def kmv_merge(sketches: DataFrame, keys: Sequence[str],
              k: int = KMV_K) -> DataFrame:
    """Merge sketches down to a coarser key set: union the hash arrays,
    dedup, re-take the k smallest. Exactly the sketch that would have
    been built from the union of the inputs (KMV's defining property —
    the k smallest of a union are a subset of the per-part k smallest)."""
    ex = sketches.select(*keys, F.explode("kmv").alias("h")).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return (ex.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .groupBy(*keys)
            .agg(F.sort_array(F.collect_list("h")).alias("kmv")))


def kmv_estimate(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Attach ``k_used``, ``kth_hash``, ``est_distinct``: exact size
    when the group had < k distinct values, else (k-1) * 2^48 / kth."""
    full = F.size("kmv") >= k
    kth = F.element_at("kmv", k)
    return sketches.select(
        "*",
        F.size("kmv").cast("long").alias("k_used"),
        F.element_at("kmv", F.size("kmv")).alias("kth_hash"),
        F.when(full, F.lit(float(k - 1)) * F.lit(HASH48_SPACE) / kth)
        .otherwise(F.size("kmv").cast("double")).alias("est_distinct"),
    )


def hist_sketch(df: DataFrame, keys: Sequence[str], col: str,
                width: float) -> DataFrame:
    """Fixed-width histogram: (keys..., bin, cnt) with
    bin = floor(col / width). Mergeable by summing cnt. One partial-agg
    shuffle; the state per group is one counter per OCCUPIED bin."""
    return (df.filter(F.col(col).isNotNull())
            .groupBy(*keys, F.floor(F.col(col) / F.lit(float(width)))
                     .alias("bin"))
            .agg(F.count("*").alias("cnt")))


def hist_quantiles(hist: DataFrame, keys: Sequence[str], width: float,
                   qs: Sequence[float]) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, find the
    first bin whose cumulative count reaches q * n and interpolate
    linearly inside it:

        est = bin*width + width * (q*n - cum_prev) / cnt

    Deterministic given the sketch; max error = one bin width. The
    formula is plain double arithmetic in a fixed order, so the DuckDB
    oracle reproduces it bit-for-bit. Returns (keys..., q, est)."""
    w_cum = (Window.partitionBy(*keys).orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*keys)
    c = (hist.withColumn("cum", F.sum("cnt").over(w_cum))
         .withColumn("n", F.sum("cnt").over(w_all)))
    qdf = c.sparkSession.createDataFrame([(float(q),) for q in qs],
                                         "q double")
    j = c.join(F.broadcast(qdf),
               (F.col("cum") >= F.col("q") * F.col("n"))
               & (F.col("cum") - F.col("cnt") < F.col("q") * F.col("n")))
    return j.select(
        *keys, "q",
        (F.col("bin") * F.lit(float(width))
         + F.lit(float(width))
         * (F.col("q") * F.col("n") - (F.col("cum") - F.col("cnt")))
         / F.col("cnt")).alias("est"),
    )
