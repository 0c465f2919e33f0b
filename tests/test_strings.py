"""Unit tests for scalar string/similarity functions vs pure-Python oracles
re-implementing the reference semantics (api/model/utils.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lamapi_spark.functions import (
    clean_str,
    bow_tokens,
    dot_notation_variants,
    ed_score,
    jaccard_ngram_score,
    jaccard_score,
    kg_of_entity,
    ngram_set,
)
from lamapi_spark.functions.strings import STOPWORDS


def _py_clean(s: str) -> str:
    return " ".join(s.lower().split())


def _py_ngrams(text: str, n):
    out = set()
    for token in text.split(" "):
        if n is None:
            out.add(token)
        else:
            out.update(token[i : i + n] for i in range(len(token) - n + 1))
    return out


def _py_sim(a: str, b: str, n) -> float:
    ga, gb = _py_ngrams(a, n), _py_ngrams(b, n)
    return round(len(ga & gb) / max(len(ga), len(gb), 1), 2)


def _py_ed(a: str, b: str) -> float:
    import difflib  # not used; plain DP below for exactness

    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return round(1 - dp[lb] / max(la, lb, 1), 2)


PAIRS = [
    ("batman begins", "batman"),
    ("jurassic world", "jurassic world"),
    ("the dark knight", "dark knight rises"),
    ("abc", "xyz"),
    ("a", "ab"),
    ("colin trevorrow", "colin  Trevorrow "),
]


def test_clean_str(spark):
    rows = spark.createDataFrame(
        [("  FOO   Bar\tbaz\n",), ("Already clean",), ("",)], ["s"]
    ).select(clean_str("s").alias("c")).collect()
    assert [r.c for r in rows] == [
        _py_clean("  FOO   Bar\tbaz\n"),
        _py_clean("Already clean"),
        "",
    ]


def test_ed_and_jaccard_scores(spark):
    df = spark.createDataFrame(PAIRS, ["a", "b"]).select(
        clean_str("a").alias("a"), clean_str("b").alias("b")
    )
    got = df.select(
        "a",
        "b",
        ed_score("a", "b").alias("ed"),
        jaccard_score("a", "b").alias("jac"),
        jaccard_ngram_score("a", "b").alias("jac3"),
    ).collect()
    for r in got:
        assert float(r.ed) == _py_ed(r.a, r.b), (r.a, r.b)
        assert float(r.jac) == _py_sim(r.a, r.b, None), (r.a, r.b)
        assert float(r.jac3) == _py_sim(r.a, r.b, 3), (r.a, r.b)


def test_ngram_short_token_contributes_nothing(spark):
    row = spark.range(1).select(ngram_set(F.lit("ab cdef"), 3).alias("g")).first()
    assert sorted(row.g) == ["cde", "def"]


def test_dot_notation_variants(spark):
    row = spark.range(1).select(
        dot_notation_variants(F.lit("John Fitzgerald Kennedy")).alias("v")
    ).first()
    assert row.v == [
        "John Fitzgerald Kennedy",
        "J. Fitzgerald Kennedy",
        "J. F. Kennedy",
    ]
    row1 = spark.range(1).select(dot_notation_variants(F.lit("Cher")).alias("v")).first()
    assert row1.v == ["Cher"]


def test_kg_of_entity(spark):
    rows = spark.createDataFrame(
        [("Q30",), ("P31",), ("Berlin",), ("Q",)], ["e"]
    ).select(kg_of_entity("e").alias("kg")).collect()
    assert [r.kg for r in rows] == ["wikidata", "wikidata", "dbpedia", "dbpedia"]


def test_bow_tokens(spark):
    row = spark.range(1).select(
        bow_tokens(F.lit("The  Quick broWn fox, and the dog 42")).alias("t")
    ).first()
    expect = {
        t
        for t in "the quick brown fox, and the dog 42".split()
        if t.isalnum() and t not in set(STOPWORDS)
    }
    assert set(row.t) == expect
