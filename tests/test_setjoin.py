"""Exact set-similarity self-join (ops/setjoin.py): the prefix-filter
operator must equal a literal brute-force all-pairs scan — zero false
negatives (the lossless-candidate claim) AND zero false positives (the
integer verify) — on planted and randomized corpora."""

from __future__ import annotations

import random

import pytest

from lamapi_spark.ops.setjoin import setjoin_jaccard_pairs


def brute_pairs(rows, taun, taud):
    """Independent brute force: all O(n^2) pairs, pure Python sets."""
    sets = {i: set(t.lower().split(" ")) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if taud * inter >= taun * union:
                out[(a, b)] = (inter, union)
    return out


def run_op(spark, rows, taun, taud):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = setjoin_jaccard_pairs(df, "doc_id", "text", taun=taun, taud=taud).collect()
    return {(r.id_a, r.id_b): (r.inter_n, r.union_n) for r in got}


def test_planted_corpus_matches_brute_force(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),        # J = 4/6 >= 3/5
        (2, "alpha beta gamma theta iota"),        # J vs 0 = 3/7 < 3/5
        (3, "totally unrelated words here now"),
        (4, "alpha beta gamma delta epsilon"),     # exact dup of 0, J = 1
        (5, "single"),
        (6, "single"),                             # J = 1 on 1-token sets
    ]
    got = run_op(spark, rows, 3, 5)
    want = brute_pairs(rows, 3, 5)
    assert got == want
    assert (0, 1) in got and (0, 4) in got and (5, 6) in got
    assert (0, 2) not in got


@pytest.mark.parametrize("taun,taud", [(1, 2), (3, 5), (4, 5)])
def test_randomized_differential(spark, taun, taud):
    # template-mutation corpus: shared vocab so pairs actually occur
    rng = random.Random(42 * taun + taud)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(1, 12))
        rows.append((i, " ".join(base)))
    # planted high-sim pairs so every tau level exercises hits
    rows.append((100, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"))
    rows.append((101, "w0 w1 w2 w3 w4 w5 w6 w7 w8"))   # J = 9/10
    rows.append((102, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"))  # exact dup
    got = run_op(spark, rows, taun, taud)
    want = brute_pairs(rows, taun, taud)
    assert got == want
    assert len(want) > 0  # the sweep must actually exercise pairs


def test_duplicate_tokens_collapse_to_sets(spark):
    # repeated tokens in the text must not inflate sizes: semantics are
    # SET Jaccard, matching the oracle's list_distinct
    rows = [(0, "a a a b"), (1, "a b b b")]
    got = run_op(spark, rows, 1, 2)
    assert got == {(0, 1): (2, 2)}
