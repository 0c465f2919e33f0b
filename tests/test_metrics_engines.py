"""Differential gate for the round-5 vectorized eval arms: the
Arrow-batched numpy DPs (engine='pandas') must be BIT-IDENTICAL to the
oracle-parity interpreted folds (engine='fold') on adversarial and
random pairs — the flag exists for hot paths, not for different answers."""

import random

import pytest
from pyspark.sql import functions as F

from lamapi_spark.ops.metrics import rouge_l_scores, wer_scores

_EDGE = [
    ("e1", "", ""),
    ("e2", "", "a b c"),
    ("e3", "a b c", ""),
    ("e4", "a", "a"),
    ("e5", "a a a", "a a"),
    ("e6", "x y z", "a b c"),
    ("e7", "the cat sat", "the cat sat"),
    ("e8", "a b a b a", "b a b a b"),
    ("e9", "  spaced   out  ", "spaced out"),
    ("e10", "UPPER case MIX", "upper CASE mix"),
]


def _rand_pairs(n=120, seed=7):
    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "tok", "apple", "pear"]
    rows = []
    for i in range(n):
        la, lb = rng.randint(0, 14), rng.randint(0, 14)
        rows.append((f"r{i}",
                     " ".join(rng.choice(vocab) for _ in range(la)),
                     " ".join(rng.choice(vocab) for _ in range(lb))))
    return rows


def test_wer_engines_identical(spark):
    df = spark.createDataFrame(_EDGE + _rand_pairs(),
                               "pair_id string, hyp string, ref string")
    fold = {r.id: (r.hyp_n, r.ref_n, r.dist, r.wer)
            for r in wer_scores(df, engine="fold").collect()}
    pand = {r.id: (r.hyp_n, r.ref_n, r.dist, r.wer)
            for r in wer_scores(df, engine="pandas").collect()}
    assert fold == pand and len(fold) == len(_EDGE) + 120


def test_wer_engines_identical_under_cap(spark):
    long_a = " ".join(f"t{i % 5}" for i in range(40))
    long_b = " ".join(f"t{(i * 3) % 5}" for i in range(33))
    df = spark.createDataFrame([("p", long_a, long_b)],
                               "pair_id string, hyp string, ref string")
    f = wer_scores(df, max_tokens=10, engine="fold").head()
    p = wer_scores(df, max_tokens=10, engine="pandas").head()
    assert (f.hyp_n, f.ref_n, f.dist, f.wer) == (p.hyp_n, p.ref_n, p.dist, p.wer)


def test_rouge_l_engines_identical(spark):
    df = spark.createDataFrame(_EDGE + _rand_pairs(seed=11),
                               "pair_id string, cand string, ref string")
    fold = {r.id: (r.cand_n, r.ref_n, r.lcs, r.p, r.r, r.f1)
            for r in rouge_l_scores(df, engine="fold").collect()}
    pand = {r.id: (r.cand_n, r.ref_n, r.lcs, r.p, r.r, r.f1)
            for r in rouge_l_scores(df, engine="pandas").collect()}
    assert fold == pand and len(fold) == len(_EDGE) + 120


def test_bad_engine_rejected(spark):
    df = spark.createDataFrame([("p", "a", "a")],
                               "pair_id string, hyp string, ref string")
    with pytest.raises(ValueError):
        wer_scores(df, engine="numpy")
    with pytest.raises(ValueError):
        rouge_l_scores(df.withColumnRenamed("hyp", "cand"), engine="arrow")
