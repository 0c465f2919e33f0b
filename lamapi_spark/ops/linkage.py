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
    l = left.select(F.col(idl).alias("id_l"),
                    F.col(block_col).alias("_blk"),
                    *[F.col(f).alias(f"_l_{f}") for f in weights_bp])
    r = right.select(F.col(idr).alias("id_r"),
                     F.col(block_col).alias("_blk"),
                     *[F.col(f).alias(f"_r_{f}") for f in weights_bp])
    pairs = l.join(r, "_blk")
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
