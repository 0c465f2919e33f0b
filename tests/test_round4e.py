"""Round-4 continuation (session E): eval-family closers — ROC AUC,
corpus BLEU, Fleiss' kappa, token-level WER."""

from __future__ import annotations

from pyspark.sql import functions as F


# --------------------------------------------------------- ROC AUC

def test_auc_hand_ties(spark):
    from lamapi_spark.ops.metrics import auc_roc
    # pos scores {3, 2}, neg scores {1, 2}: pairwise wins 3 (3>1, 3>2,
    # 2>1) plus one tie (2 vs 2) at 1/2 -> U = 3.5, AUC = 3.5/4.
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)], ["score", "label"])
    row = auc_roc(df).collect()[0]
    assert (row.n_pos, row.n_neg, row.u2) == (2, 2, 7)
    assert row.auc == 0.875


def test_auc_perfect_and_inverted(spark):
    from lamapi_spark.ops.metrics import auc_roc
    df = spark.createDataFrame(
        [(float(i), 1 if i >= 5 else 0) for i in range(10)],
        ["score", "label"])
    assert auc_roc(df).collect()[0].auc == 1.0
    inv = df.select((-F.col("score")).alias("score"), "label")
    assert auc_roc(inv).collect()[0].auc == 0.0


def test_auc_single_class_degenerate(spark):
    from lamapi_spark.ops.metrics import auc_roc
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], ["score", "label"])
    row = auc_roc(df).collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (2, 0, 0.0)


def test_auc_matches_brute_force(spark):
    from lamapi_spark.ops.metrics import auc_roc
    rows = [((i * 7) % 13 / 3.0, (i * 5 + 3) % 3 % 2) for i in range(60)]
    df = spark.createDataFrame(rows, ["score", "label"])
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    u2 = sum(2 if p > n else (1 if p == n else 0)
             for p in pos for n in neg)
    got = auc_roc(df, n_buckets=4).collect()[0]
    assert (got.n_pos, got.n_neg, got.u2) == (len(pos), len(neg), u2)
    assert abs(got.auc - u2 / (2.0 * len(pos) * len(neg))) < 1e-9
