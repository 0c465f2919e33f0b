"""Distributed BPE vs an independent in-memory implementation."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lamapi_spark.ops.tokenize import bpe_apply, bpe_train


def py_bpe_train(word_counts: dict[str, int], n_merges: int):
    """Independent reference trainer: same semantics, no Spark —
    count desc / pair-lexicographic tie-break, simultaneous
    left-to-right merge, stop below count 2."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in word_counts.items():
            syms = vocab[w]
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best_pair, best_n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append(best_pair)
        left, right = best_pair
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(808)
    stems = ["scan", "join", "sort", "shuffle", "table", "partition"]
    words = [rng.choice(stems) + rng.choice(["", "s", "ing", "ed"])
             for _ in range(400)]
    docs = [(i, " ".join(rng.sample(words, rng.randint(3, 9))))
            for i in range(80)]
    wc: Counter = Counter(w for _, t in docs for w in t.split())
    return docs, dict(wc)


def test_bpe_train_matches_reference(spark, corpus):
    docs, wc = corpus
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = bpe_train(df, n_merges=25)
    want, _ = py_bpe_train(wc, 25)
    assert got == want and len(got) == 25


def test_bpe_train_hybrid_arms_agree(spark, corpus):
    """Round-5 hybrid: the driver-local arm (vocabulary fits the budget)
    and the distributed per-merge loop (budget=None forces it) must
    learn the IDENTICAL ranked merge list — and match the independent
    Python reference."""
    docs, wc = corpus
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    local_arm = bpe_train(df, n_merges=25)                       # default budget: local
    dist_arm = bpe_train(df, n_merges=25, driver_budget_bytes=None)
    want, _ = py_bpe_train(wc, 25)
    assert local_arm == dist_arm == want


def test_bpe_train_partition_independent(spark, corpus):
    docs, wc = corpus
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    assert bpe_train(df.repartition(13), n_merges=12) == \
        bpe_train(df.repartition(2), n_merges=12)


def test_bpe_apply_matches_training_segmentation(spark, corpus):
    """Applying the ranked merges reproduces the trainer's own final
    segmentation for every corpus word (the standard BPE consistency
    property), and tokens always reassemble the word."""
    docs, wc = corpus
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    merges, vocab = py_bpe_train(wc, 25)
    out = bpe_apply(df, merges).collect()
    texts = dict(docs)
    for r in out:
        words = texts[r.doc_id].split()
        want = [t for w in words for t in vocab[w]]
        assert r.tokens == want, (r.doc_id, r.tokens, want)
        assert "".join(r.tokens) == "".join(words)
        assert r.n_tokens == len(want)
    # tokenizer-aware counts differ from whitespace counts (the point)
    assert any(r.n_tokens != len(texts[r.doc_id].split()) for r in out)
