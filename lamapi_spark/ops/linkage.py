"""Probabilistic record linkage (Fellegi & Sunter 1969): blocked
candidate pairs scored by integer log-odds field-agreement weights.

The cross-source flavor of entity resolution the KG pipeline needs when
a SECOND structured source arrives (the reference ingests crunchbase
next to wikidata — scripts/parsing_cb.py — and leaves cross-source
identity to the consumer): decide match / possible / non-match per
record pair from per-field agreement, not from a single fuzzy string
score.

Semantics (integer-exact, engine-portable):
- candidate pairs = equi-join on a BLOCKING key (the classic scale
  device: |L_k| x |R_k| per block, never |L| x |R|; pick keys whose
  groups stay small, salt or split hot blocks at cluster scale — the
  same hot-bucket trade ops/dedup.py documents for LSH bands);
- per field f: agreement a_f = exact equality of the (pre-normalized)
  columns, null-safe (NULL vs anything = disagreement, NULL vs NULL =
  agreement — eqNullSafe);
- score_bp = sum_f (a_f ? w_agree[f] : w_disagree[f]) in BASIS POINTS
  of log-odds (the m/u-probability ratios of the paper, log-scaled and
  integer-quantized offline — weight ESTIMATION (EM) is a separate
  offline concern; this operator is the deterministic scoring/decision
  stage);
- verdict: score_bp >= upper -> 'match', <= lower -> 'nonmatch',
  else 'review' (the paper's three-region decision rule).

One shuffle on the block key, then a narrow projection — no windows,
no UDFs; the weights ride the expression tree as literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_link_pairs(
    left: DataFrame,
    right: DataFrame,
    id_cols: tuple[str, str],
    block_col: str,
    weights_bp: dict[str, tuple[int, int]],
    upper_bp: int,
    lower_bp: int,
) -> DataFrame:
    """-> (id_l, id_r, agree_<field>... , score_bp, verdict) for every
    blocked candidate pair. ``weights_bp[field] = (w_agree, w_disagree)``
    in basis points; both record frames must carry ``block_col`` and
    every weighted field."""
    idl, idr = id_cols
    l = fs_project(left, idl, "id_l", block_col, weights_bp, "_l_")
    r = fs_project(right, idr, "id_r", block_col, weights_bp, "_r_")
    return fs_score(l.join(r, "_blk"), weights_bp, upper_bp, lower_bp)


def fs_project(df: DataFrame, id_col: str, id_out: str, block_col: str,
               weights_bp: dict, prefix: str) -> DataFrame:
    """One source's join-ready projection: (id, _blk, <prefix><field>…).
    Shared by the batch join and the stream-static twin
    (streaming/linkage.py) so both sides feed fs_score identically."""
    return df.select(F.col(id_col).alias(id_out),
                     F.col(block_col).alias("_blk"),
                     *[F.col(f).alias(f"{prefix}{f}") for f in weights_bp])


def fs_score(pairs: DataFrame, weights_bp: dict,
             upper_bp: int, lower_bp: int) -> DataFrame:
    """Post-join agreement/score/verdict expressions over a
    (id_l, _blk, _l_*…) x (id_r, _blk, _r_*…) pair frame — pure
    stateless column algebra, so the streaming twin reuses it verbatim
    (stream == batch row for row by construction)."""
    score = F.lit(0).cast("long")
    out_cols = []
    for f, (wa, wd) in weights_bp.items():
        agree = F.col(f"_l_{f}").eqNullSafe(F.col(f"_r_{f}"))
        pairs = pairs.withColumn(f"agree_{f}", agree)
        score = score + F.when(agree, wa).otherwise(wd)
        out_cols.append(f"agree_{f}")
    return (
        pairs.withColumn("score_bp", score)
        .withColumn("verdict",
                    F.when(F.col("score_bp") >= upper_bp, "match")
                    .when(F.col("score_bp") <= lower_bp, "nonmatch")
                    .otherwise("review"))
        .select("id_l", "id_r", *out_cols, "score_bp", "verdict")
    )


def _clamp_bp(col):
    """Clamp a basis-point column into the open unit interval [1, 9999]
    — EM's m/u/p parameters must never reach 0 or 1 exactly (a zero
    likelihood factor would absorb the whole product and freeze the
    iteration; the paper's probabilities are interior points)."""
    return F.greatest(F.lit(1).cast("long"),
                      F.least(F.lit(9999).cast("long"), col))


def fs_em_weights(
    pairs: DataFrame,
    fields: list[str],
    iters: int = 3,
    init_m_bp: int = 9000,
    init_u_bp: int = 1000,
    init_p_bp: int = 500,
) -> DataFrame:
    """Fellegi-Sunter parameter estimation (Winkler's EM over binary
    agreement vectors) — the offline TRAINING arc that produces the
    log-odds weights :func:`fs_link_pairs` consumes, run for a FIXED
    number of iterations in pure BIGINT basis-point arithmetic so the
    result is a bit-exact pure function of (pairs, fields, iters,
    inits) and a SQL oracle can unroll the identical rounds (the
    fixed-iteration determinism contract of pagerank_fixed_point /
    sssp_bounded / k_core).

    Model: each blocked pair i carries a binary agreement vector a_i
    (the ``agree_<field>`` booleans fs_link_pairs emits). Latent class
    membership g_i = P(match | a_i) under the naive-Bayes likelihood
    with per-field m = P(agree|match), u = P(agree|unmatch) and class
    prior p. All parameters live in BASIS POINTS (1/10000):

    - E-step, per pair:  M_i = prod_f (a_if ? m_f : 10000-m_f),
      U_i likewise with u; g_i = round(10000 * p*M_i / (p*M_i +
      (10000-p)*U_i)) via the integer round-half-up form
      ``(20000*N + D) DIV (2*D)``. Pure per-row expression — no
      cross-row float accumulation anywhere.
    - M-step: m_f = round-bp(sum(g_i*a_if)/sum(g_i)), u_f with
      (10000-g_i), p = round-bp(mean g_i) — BIGINT sums, so the
      reduction commutes and the result is partitioning- and
      arrival-order-independent.

    Overflow bounds (BIGINT = 9.2e18): the E-step numerator is
    20000 * p * M <= 2e8 * M, so the raw product M (<= 1e4 per field)
    is RESCALED to <= 1e8 when len(fields) > 2 (round-half-up by
    10^(4*(F-2)), clamped >= 1) — a documented deterministic
    quantization, relative error <= 5e-9. M-step sums bound pair count
    at 4.6e10 per EM batch; shard larger corpora by blocking key.

    Parameters stay a 1-row DataFrame crossJoin-broadcast into the
    E-step (the repo's 1-row stat-frame discipline — no driver
    round-trip inside the loop); localCheckpoint truncates per-round
    lineage exactly as the other fixed-round loops do.

    -> 1-row (p_bp, m_<field>_bp, u_<field>_bp ...) after ``iters``
    rounds.
    """
    spark = pairs.sparkSession
    a = pairs.select(
        *[F.col(f"agree_{f}").cast("long").alias(f"_a_{f}") for f in fields])

    params = spark.createDataFrame(
        [tuple([init_p_bp] + [v for _ in fields
                              for v in (init_m_bp, init_u_bp)])],
        "p_bp long, " + ", ".join(
            f"m_{f}_bp long, u_{f}_bp long" for f in fields))

    # every division below is SQL's integer DIV (exact BIGINT
    # truncation) — Column `/` would route through DOUBLE, which stops
    # being exact past 2^53 while the E-step numerator reaches 2e16
    shift = 10 ** (4 * (len(fields) - 2)) if len(fields) > 2 else 1

    for _ in range(iters):
        j = a.crossJoin(F.broadcast(params))
        m_prod = F.lit(1).cast("long")
        u_prod = F.lit(1).cast("long")
        for f in fields:
            af = F.col(f"_a_{f}") == 1
            m_prod = m_prod * F.when(af, F.col(f"m_{f}_bp")) \
                               .otherwise(10000 - F.col(f"m_{f}_bp"))
            u_prod = u_prod * F.when(af, F.col(f"u_{f}_bp")) \
                               .otherwise(10000 - F.col(f"u_{f}_bp"))
        j = j.withColumn("_mraw", m_prod).withColumn("_uraw", u_prod)
        if shift > 1:
            j = (j.withColumn("_m", F.greatest(
                     F.lit(1).cast("long"),
                     F.expr(f"(2 * _mraw + {shift}) DIV {2 * shift}")))
                  .withColumn("_u", F.greatest(
                     F.lit(1).cast("long"),
                     F.expr(f"(2 * _uraw + {shift}) DIV {2 * shift}"))))
        else:
            j = (j.withColumn("_m", F.col("_mraw"))
                  .withColumn("_u", F.col("_uraw")))
        j = (j.withColumn("_num", F.col("p_bp") * F.col("_m"))
              .withColumn("_den", F.col("_num")
                          + (10000 - F.col("p_bp")) * F.col("_u"))
              .withColumn("_g",
                          F.expr("(20000 * _num + _den) DIV (2 * _den)")))
        aggs = [F.count(F.lit(1)).alias("_n"),
                F.sum("_g").alias("_sg")]
        for f in fields:
            aggs.append(F.sum(F.col("_g") * F.col(f"_a_{f}"))
                        .alias(f"_sga_{f}"))
            aggs.append(F.sum((10000 - F.col("_g")) * F.col(f"_a_{f}"))
                        .alias(f"_dga_{f}"))
        s = (j.agg(*aggs)
             .withColumn("_sg_safe", F.greatest(F.lit(1).cast("long"),
                                                F.col("_sg")))
             .withColumn("_ds_safe",
                         F.greatest(F.lit(1).cast("long"),
                                    10000 * F.col("_n") - F.col("_sg"))))
        cols = [_clamp_bp(F.expr("(2 * _sg + _n) DIV (2 * _n)"))
                .alias("p_bp")]
        for f in fields:
            cols.append(_clamp_bp(
                F.expr(f"(20000 * _sga_{f} + _sg_safe) DIV (2 * _sg_safe)"))
                .alias(f"m_{f}_bp"))
            cols.append(_clamp_bp(
                F.expr(f"(20000 * _dga_{f} + _ds_safe) DIV (2 * _ds_safe)"))
                .alias(f"u_{f}_bp"))
        params = s.select(*cols).localCheckpoint(eager=True)
    return params


def blocking_quality(
    left: DataFrame,
    right: DataFrame,
    id_cols: tuple[str, str],
    block_col: str,
    gold: DataFrame,
) -> DataFrame:
    """Blocking-scheme audit (Christen 2012's standard triple): does
    the block key keep the candidate space small WITHOUT dropping true
    matches? The measurement every fs_link_pairs deployment runs
    before trusting its block_col at 10^8-record scale (reference
    analogue: none — the reference leaves cross-source identity to
    the consumer; builder's-brief eval surface beside calibration_bins).

    - ``cand_pairs`` = sum over blocks of |L_b|*|R_b| — computed from
      per-block COUNTS (two narrow aggs + one join on the block key),
      never by materializing the pairs: auditing a blocking that would
      generate 10^12 candidates costs O(blocks), not O(candidates).
    - ``reduction_ratio`` = 1 - cand_pairs / (|L|*|R|).
    - ``pairs_completeness`` = covered gold / |gold|, where a gold
      (id_l, id_r) pair is covered iff both records exist and share a
      block key (two id-keyed joins of the gold frame; NULL block
      never covers).
    - ``pair_quality`` = covered gold / cand_pairs (blocking
      precision); 0.0 when no candidates.

    Ratios round half-even to 6 dp. All totals meet in 1-row broadcast
    frames — no window, no collect. -> ONE row: (n_left, n_right,
    n_blocks, cand_pairs, total_pairs, n_gold, gold_covered,
    reduction_ratio, pairs_completeness, pair_quality).
    """
    idl, idr = id_cols
    lb = (left.filter(F.col(block_col).isNotNull())
          .groupBy(block_col).agg(F.count("*").alias("_nl")))
    rb = (right.filter(F.col(block_col).isNotNull())
          .groupBy(block_col).agg(F.count("*").alias("_nr")))
    cand = (lb.join(rb, block_col)
            .agg(F.coalesce(F.sum(F.col("_nl") * F.col("_nr")), F.lit(0))
                 .cast("long").alias("cand_pairs"),
                 F.count("*").alias("n_blocks")))
    nl = left.agg(F.count("*").alias("n_left"))
    nr = right.agg(F.count("*").alias("n_right"))
    lkey = left.select(F.col(idl).alias("id_l"),
                       F.col(block_col).alias("_bl"))
    rkey = right.select(F.col(idr).alias("id_r"),
                        F.col(block_col).alias("_br"))
    covered = (F.col("_bl").isNotNull() & F.col("_br").isNotNull()
               & (F.col("_bl") == F.col("_br"))).cast("long")
    gcov = (gold.select("id_l", "id_r")
            .join(lkey, "id_l", "left").join(rkey, "id_r", "left")
            .agg(F.count("*").alias("n_gold"),
                 F.coalesce(F.sum(covered), F.lit(0)).cast("long")
                 .alias("gold_covered")))
    row = (nl.join(F.broadcast(nr)).join(F.broadcast(cand))
           .join(F.broadcast(gcov)))
    total = F.col("n_left") * F.col("n_right")
    pq = F.when(F.col("cand_pairs") > 0,
                F.col("gold_covered") / F.col("cand_pairs")).otherwise(0.0)
    pc = F.when(F.col("n_gold") > 0,
                F.col("gold_covered") / F.col("n_gold")).otherwise(0.0)
    rr = F.when(total > 0,
                1.0 - F.col("cand_pairs") / total).otherwise(0.0)
    return row.select(
        "n_left", "n_right", "n_blocks", "cand_pairs",
        total.cast("long").alias("total_pairs"), "n_gold", "gold_covered",
        F.bround(rr, 6).alias("reduction_ratio"),
        F.bround(pc, 6).alias("pairs_completeness"),
        F.bround(pq, 6).alias("pair_quality"))


def reciprocal_best_match(pairs: DataFrame,
                          id_cols: tuple[str, str] = ("id_l", "id_r"),
                          score_col: str = "score_bp") -> DataFrame:
    """One-to-one alignment from scored candidate pairs: keep (l, r)
    iff r is l's highest-scoring partner AND l is r's — the
    reciprocal-best-match rule (BLAST's ortholog convention, the
    standard 1:1 decision on top of fs_link_pairs' scores, where the
    three-region rule classifies pairs INDEPENDENTLY and can marry
    one record twice). Reference analogue: none; builder's-brief ER
    surface completing the linkage family.

    Ties break deterministically to the lexicographically smallest
    partner id (window-free struct-min argmax on (-score, id), the
    repo's standard shape), so the matching is a pure function of the
    pair set. Output is provably 1:1: each side appears at most once
    because it appears only via its own argmax row.

    Scale shape: two (id)-keyed argmax aggs + one equi-join of the
    two 1-row-per-id frames on BOTH ids. -> (id_l, id_r, score) for
    the mutual-best pairs.
    """
    idl, idr = id_cols
    s = F.col(score_col)
    best_l = (pairs.groupBy(idl)
              .agg(F.min(F.struct((-s).alias("ns"),
                                  F.col(idr).alias("r"))).alias("_b"))
              .select(idl, F.col("_b.r").alias(idr),
                      (-F.col("_b.ns")).alias("_sl")))
    best_r = (pairs.groupBy(idr)
              .agg(F.min(F.struct((-s).alias("ns"),
                                  F.col(idl).alias("l"))).alias("_b"))
              .select(idr, F.col("_b.l").alias(idl)))
    return (best_l.join(best_r, [idl, idr])
            .select(idl, idr, F.col("_sl").alias(score_col)))
