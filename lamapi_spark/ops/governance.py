"""Data-governance audits a training-data pipeline runs before
release: k-anonymity / l-diversity census over quasi-identifier
tuples. Reference analogue: none (lamAPI is a lookup service) —
builder's-brief governance surface beside textstats.corpus_report
and pii_pseudonyms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_census(df: DataFrame, qi_cols: list[str],
                       sensitive_col: str, k_threshold: int = 5,
                       l_threshold: int = 2) -> DataFrame:
    """k-anonymity / l-diversity census: group rows by the
    quasi-identifier tuple, read each group's size k (re-identification
    resistance: a row is k-anonymous when its QI tuple is shared by
    >= k rows) and its sensitive-value diversity l (distinct sensitive
    values inside the group — l = 1 means the QI tuple REVEALS the
    sensitive value even at large k). The release gate a PII-bearing
    corpus runs after pseudonymization (textstats.pii_pseudonyms):
    groups below ``k_threshold`` or ``l_threshold`` are the rows a
    redaction pass must generalize or drop.

    Output is the bounded census, not the groups: one row per distinct
    group size k — (k, n_groups, n_rows, groups_below_k,
    groups_low_l) — so the result stays a few dozen rows at any corpus
    scale and the full risk profile (how much of the corpus sits in
    small groups) reads off directly.

    Exactness: every column is an exact integer count; no floats
    anywhere.

    Scale shape: ONE shuffle on the QI tuple (the inherent key, with
    map-side combine), then a vocabulary-bounded agg on k; at 10^12
    rows the group frame is large but never collected — the census agg
    reduces it to O(distinct k) rows.
    """
    groups = (df.groupBy(*[F.col(c) for c in qi_cols])
              .agg(F.count("*").alias("k"),
                   F.countDistinct(sensitive_col).alias("l")))
    return (groups.groupBy("k")
            .agg(F.count("*").alias("n_groups"),
                 F.sum("k").alias("n_rows"),
                 F.sum((F.col("k") < k_threshold).cast("long"))
                 .alias("groups_below_k"),
                 F.sum((F.col("l") < l_threshold).cast("long"))
                 .alias("groups_low_l")))
