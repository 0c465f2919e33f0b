"""Deterministic, mergeable sketches — the builder's-brief "novel
sketch" custom-operator axis (reference analogue: none). Every member
is chosen for ENGINE-PORTABLE determinism: identical results at any
parallelism, any partitioning, and exactly reproducible in the DuckDB
SQL oracles (unlike engines' BUILT-IN HLL/t-digest aggregates, whose
register/centroid layouts are engine-private and merge-order-
dependent — the md5-drawn HLL below is portable precisely because it
owns its hash and register layout).

- KMV (k-minimum-values) distinct counting: the sketch IS the sorted
  array of the k smallest 48-bit md5 hashes of the distinct values.
  Merge = union, re-take k smallest — associative, commutative,
  idempotent, so daily/partition sketches roll up to exactly the
  sketch of the union (tested in tests/test_temporal.py).
- Fixed-width histogram quantiles: the sketch is (bin, count); merge =
  counts add. Quantile estimate interpolates linearly inside the
  target bin — deterministic given only the bin width.
- Bloom filter (membership): md5 bit draws into 32-bit words carried
  in BIGINTs; merge = bit_or. No false negatives by construction.
- Count-Min (frequency): md5 cell draws into a d x w BIGINT counter
  matrix; merge = element-wise sum. Estimates never undercount.
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


# ------------------------------------------------------------- Bloom

BLOOM_BITS = 256
BLOOM_HASHES = 4
_BLOOM_WORD = 32  # bits per word: 1 << 31 stays positive in BIGINT in
#                   every engine (1 << 63 overflows or flips sign
#                   differently across engines)


def _bloom_positions(col, m_bits: int, j: int) -> F.Column:
    """Array of the value's j bit positions: h48 of 'i|value' mod m —
    each an independent engine-portable draw."""
    return F.array(*[
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"),
                                          F.col(col).cast("string"))), 1, 12),
               16, 10).cast("long") % m_bits
        for i in range(j)
    ])


def _bloom_assemble(words: DataFrame, keys: Sequence[str],
                    n_words: int) -> DataFrame:
    """(keys, widx, bits) -> (keys, bloom array<bigint> of n_words),
    zero-filling absent words. The collect is bounded by n_words."""
    return (
        words.groupBy(*keys)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("widx", "bits"))).alias("_m"))
        .select(*keys, F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("_m", i.cast("int")),
                                 F.lit(0).cast("long"))).alias("bloom"))
    )


def bloom_sketch(df: DataFrame, keys: Sequence[str], col: str,
                 m_bits: int = BLOOM_BITS, j: int = BLOOM_HASHES) -> DataFrame:
    """Per key group: a ``m_bits``-bit Bloom filter over the distinct
    values of ``col`` as an array of 32-bit words in BIGINTs — the
    MEMBERSHIP member of the sketch family (KMV = distinct count,
    histogram = quantiles). Deterministic and engine-portable like its
    siblings: bit positions are md5 draws, the aggregation is bit_or
    (associative, commutative, idempotent), so the sketch is a pure
    function of the value SET — any partitioning, any engine, and
    merge-of-parts == sketch-of-union bit-for-bit (the contract query
    proves it against a direct global oracle). No false negatives
    ever; false-positive rate is the standard (1-e^{-jn/m})^j.

    Scale shape: distinct -> j-position explode -> (key, word) bit_or
    with map-side combine; only <= m_bits/32 word rows per group reach
    the assembling collect."""
    n_words = m_bits // _BLOOM_WORD
    # nulls are ignored (a membership set has no null member; an
    # unfiltered null would propagate into map_from_entries' key and
    # kill the job)
    vals = (df.select(*keys, F.col(col).alias("_v"))
            .filter(F.col("_v").isNotNull()).distinct())
    pos = vals.select(*keys, F.explode(
        _bloom_positions("_v", m_bits, j)).alias("_p"))
    words = (
        pos.select(*keys,
                   (F.col("_p") / _BLOOM_WORD).cast("int").alias("widx"),
                   F.expr(f"shiftleft(1L, int(_p % {_BLOOM_WORD}))").alias("_b"))
        .groupBy(*keys, "widx").agg(F.bit_or("_b").alias("bits"))
    )
    return _bloom_assemble(words, keys, n_words)


def bloom_merge(sketches: DataFrame, keys: Sequence[str],
                m_bits: int = BLOOM_BITS) -> DataFrame:
    """Merge sketches down to a coarser key set: element-wise bit_or."""
    n_words = m_bits // _BLOOM_WORD
    words = (
        sketches.select(*keys, F.posexplode("bloom").alias("widx", "_b"))
        .groupBy(*keys, "widx").agg(F.bit_or("_b").alias("bits"))
    )
    return _bloom_assemble(words, keys, n_words)


def _cells_assemble(cells: DataFrame, keys: Sequence[str], n_cells: int,
                    out_col: str) -> DataFrame:
    """(keys, idx, cnt) -> (keys, out_col array<bigint> of n_cells),
    zero-filling absent cells. The collect is bounded by n_cells."""
    return (
        cells.groupBy(*keys)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("idx", "cnt"))).alias("_m"))
        .select(*keys, F.transform(
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda i: F.coalesce(F.element_at("_m", i.cast("int")),
                                 F.lit(0).cast("long"))).alias(out_col))
    )


# --------------------------------------------------------- Count-Min

CMS_WIDTH = 64
CMS_DEPTH = 4


def _cms_positions(col, w: int, d: int) -> F.Column:
    """Array of the value's d flat cell indexes (row r occupies
    [r*w, (r+1)*w)): h48 of 'r|value' mod w, offset by r*w — the same
    independent md5 draws as the Bloom positions."""
    return F.array(*[
        (F.lit(r * w)
         + F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}|"),
                                             F.col(col).cast("string"))),
                              1, 12), 16, 10).cast("long") % w)
        for r in range(d)
    ])


def cms_sketch(df: DataFrame, keys: Sequence[str], col: str,
               w: int = CMS_WIDTH, d: int = CMS_DEPTH) -> DataFrame:
    """Per key group: a Count-Min sketch over the OCCURRENCES of
    ``col`` (Cormode & Muthukrishnan 2005) — the FREQUENCY member of
    the sketch family (KMV = distinct count, histogram = quantiles,
    Bloom = membership), as a flat d*w array of BIGINT counters.
    Deterministic and engine-portable like its siblings: cell indexes
    are md5 draws, counters are plain sums (associative, commutative),
    so the sketch is a pure function of the value BAG — any
    partitioning, any engine, and merge-of-parts == sketch-of-union
    counter-for-counter (the contract query proves it against a direct
    global oracle). Estimates never undercount; overcount is the
    standard collision term (expected <= n/w per row, min over d rows).

    Scale shape: d-position explode -> (key, idx) count with map-side
    combine; only <= d*w cell rows per group reach the assembling
    collect. Null values carry no countable identity and are ignored
    (same contract as bloom_sketch)."""
    pos = (df.select(*keys, F.col(col).alias("_v"))
           .filter(F.col("_v").isNotNull())
           .select(*keys, F.explode(_cms_positions("_v", w, d)).alias("idx")))
    cells = pos.groupBy(*keys, "idx").agg(F.count("*").alias("cnt"))
    return _cells_assemble(cells, keys, d * w, "cms")


def cms_merge(sketches: DataFrame, keys: Sequence[str],
              w: int = CMS_WIDTH, d: int = CMS_DEPTH) -> DataFrame:
    """Merge sketches down to a coarser key set: element-wise sum."""
    cells = (
        sketches.select(*keys, F.posexplode("cms").alias("idx", "_c"))
        .groupBy(*keys, "idx").agg(F.sum("_c").alias("cnt"))
    )
    return _cells_assemble(cells, keys, d * w, "cms")


def cms_estimate(sketches: DataFrame, probes: DataFrame,
                 keys: Sequence[str], col: str,
                 w: int = CMS_WIDTH, d: int = CMS_DEPTH) -> DataFrame:
    """Attach ``est`` to each probe row: min over the d counters the
    value hashes to — >= the true occurrence count ALWAYS (counters
    only ever add). A probe whose key group has no sketch gets est=0
    (definitely zero occurrences), not a dropped row."""
    p = probes.join(sketches, list(keys), "left")
    est = F.least(*[
        F.element_at("cms", (F.element_at(_cms_positions(col, w, d), r + 1)
                             ).cast("int") + 1)
        for r in range(d)
    ])
    return p.withColumn(
        "est",
        F.when(F.col("cms").isNull(), F.lit(0).cast("long")).otherwise(est)
    ).drop("cms")


def bloom_contains(sketches: DataFrame, probes: DataFrame,
                   keys: Sequence[str], col: str,
                   m_bits: int = BLOOM_BITS, j: int = BLOOM_HASHES) -> DataFrame:
    """Probe rows against the per-key sketch: ``maybe_present`` is true
    iff every one of the value's j bits is set (false => definitely
    absent; the no-false-negative guarantee)."""
    # LEFT join: a probe whose key group has no sketch is DEFINITELY
    # absent (maybe_present=false), not a silently dropped row
    p = probes.join(sketches, list(keys), "left")

    def bit_set(pos):
        # words hold 32-bit masks in BIGINTs (always positive), so the
        # bit test is exact integer arithmetic: floor(word / 2^b) % 2.
        # 2^b via double pow is exact for b <= 31 in every engine.
        word = F.element_at("bloom", (pos / _BLOOM_WORD).cast("int") + 1)
        mask = F.pow(F.lit(2.0), (pos % _BLOOM_WORD).cast("double")).cast("long")
        return ((word / mask).cast("long") % 2) == 1

    check = F.aggregate(
        _bloom_positions(col, m_bits, j), F.lit(True),
        lambda acc, pos: acc & bit_set(pos))
    return p.withColumn(
        "maybe_present",
        F.when(F.col("bloom").isNull(), F.lit(False)).otherwise(check))


# ------------------------------------------------------ HyperLogLog

HLL_B = 6  # m = 2^b = 64 registers
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    """The HLL paper's bias constant (Flajolet et al. 2007)."""
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _hll_dense(ranked: DataFrame, keys: Sequence[str], m: int) -> DataFrame:
    """(keys, reg, rank) -> (keys, regs array<int> of length m), dense,
    zero-filling absent registers. The collect is bounded by m."""
    return (
        ranked.groupBy(*keys)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("reg", "rank"))).alias("_m"))
        .select(*keys, F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda r: F.coalesce(F.element_at("_m", r.cast("int")),
                                 F.lit(0).cast("int"))).alias("regs"))
    )


def hll_sketch(df: DataFrame, keys: Sequence[str], col: str,
               b: int = HLL_B) -> DataFrame:
    """Per key group: a dense 2^b-register HyperLogLog over the
    distinct values of ``col`` — the CARDINALITY member of the sketch
    family at fixed size (where KMV's k-array gives better accuracy
    per byte at small k but this is the classical fixed-2^b-register
    shape). Engines' BUILT-IN HLLs (approx_count_distinct,
    approx_distinct) have engine-private hash/register layouts and
    can't be compared or merged across systems; this one is md5-drawn
    and therefore a pure function of the value SET — identical at any
    partitioning, in any engine (the DuckDB oracle rebuilds every
    register), and merge-of-parts == sketch-of-union bit-for-bit
    because the register aggregation is max (associative, commutative,
    idempotent).

    Register draw: h = 48-bit md5; reg = h mod m; the remaining
    w = h div m carries 48-b suffix bits and the register rank is the
    count of leading zeros in them + 1 = (48-b) + 1 - bitlen(w)
    (w = 0 -> the max rank 48-b+1). bitlen is the length of the
    base-2 string — exact integer ops end to end, no float in the
    sketch itself.

    Scale shape: distinct -> (key, reg) max-agg with map-side combine;
    only <= m register rows per group reach the assembling collect.

    -> (keys..., regs array<int> length 2^b)."""
    m, suf = 1 << b, 48 - b
    h = df.select(*keys, hash48(col).alias("h")).distinct()
    w = F.floor(F.col("h") / m).cast("long")
    rank = (F.when(w == 0, F.lit(suf + 1))
            .otherwise(F.lit(suf + 1)
                       - F.length(F.conv(w.cast("string"), 10, 2)))
            .cast("int"))
    ranked = (h.select(*keys, (F.col("h") % m).cast("int").alias("reg"),
                       rank.alias("rank"))
              .groupBy(*keys, "reg").agg(F.max("rank").alias("rank")))
    return _hll_dense(ranked, keys, m)


def hll_merge(sketches: DataFrame, keys: Sequence[str],
              b: int = HLL_B) -> DataFrame:
    """Merge sketches down to a coarser key set: element-wise register
    max. Exactly the sketch of the union of the inputs."""
    m = 1 << b
    ex = (sketches.select(*keys, F.posexplode("regs").alias("reg", "rank"))
          .filter(F.col("rank") > 0)
          .groupBy(*keys, "reg").agg(F.max("rank").alias("rank")))
    return _hll_dense(ex, keys, m)


def hll_estimate(sketches: DataFrame, b: int = HLL_B) -> DataFrame:
    """Attach ``n_zero`` and ``est_distinct``: the HLL raw estimate
    alpha_m * m^2 / sum_j 2^-M_j with the paper's small-range
    correction (linear counting m*ln(m/zeros) when raw <= 2.5m and
    zero registers remain). 2^-M terms are exact powers of two folded
    in fixed register order; the one libm op (ln) sits behind a
    round-even at 6 decimals — the repo's float-parity discipline."""
    m = 1 << b
    alpha = hll_alpha(m)
    s = F.aggregate(F.col("regs"), F.lit(0.0),
                    lambda acc, v: acc + F.pow(F.lit(2.0), -v))
    zeros = F.size(F.filter(F.col("regs"), lambda v: v == 0))
    raw = F.lit(alpha * m * m) / s
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                 ).otherwise(raw)
    return sketches.select(
        "*", zeros.cast("int").alias("n_zero"),
        F.bround(est, 6).alias("est_distinct"))
