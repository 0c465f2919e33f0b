"""Corpus-preparation operators: NFC normalization, contamination,
deterministic mixture sampling, unigram-LM scoring, IVF ANN."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lamapi_spark.ops.corpus import (
    contamination, normalize_text, sample_hash, stratified_sample,
    unigram_lm_score,
)


def test_normalize_text_nfc_ctrl_ws(spark):
    df = spark.createDataFrame(
        [(0, "café bar"),          # decomposed -> composed
         (1, "a\x07b\x00c"),              # control chars stripped
         (2, "  x \t\t y\n\n z  "),       # ws runs collapse, trim
         (3, "plain")],
        "doc_id bigint, text string")
    rows = {r.doc_id: r.n for r in df.select(
        "doc_id", normalize_text(F.col("text")).alias("n")).collect()}
    assert rows[0] == "café bar" and len(rows[0]) == 8
    assert rows[1] == "abc"
    assert rows[2] == "x y z"
    assert rows[3] == "plain"


def test_contamination_planted(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dogs"),   # contains eval 4-gram
         (2, "completely unrelated text with no overlap here"),
         (3, "a b")],                                   # < n tokens: no grams
        "doc_id bigint, text string")
    eval_df = spark.createDataFrame(
        [(100, "watch the quick brown fox run")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in contamination(train, eval_df, n=4).collect()}
    assert out[1].contaminated and out[1].n_overlap == 1  # 'the quick brown fox'
    assert not out[2].contaminated and out[2].n_overlap == 0
    assert 3 not in out  # too short to have any 4-gram


def test_stratified_sample_deterministic_and_rated(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)],
        "doc_id bigint, lang string")
    rates = {"en": 0.5, "zh": 0.1}
    a = stratified_sample(df, "lang", rates).collect()
    b = stratified_sample(df, "lang", rates).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    by_lang = {}
    for r in a:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    # 1000 per stratum; md5 coordinates are uniform, allow +-6%
    assert abs(by_lang["en"] - 500) < 60
    assert abs(by_lang["zh"] - 100) < 60
    # different salt selects a different (deterministic) row set
    c = stratified_sample(df, "lang", rates, salt="s1").collect()
    assert sorted(r.doc_id for r in c) != sorted(r.doc_id for r in a)


def test_sample_hash_matches_duckdb(spark):
    import duckdb
    got = spark.range(50).select(
        sample_hash(F.col("id")).alias("bp")).collect()
    want = duckdb.connect().execute(
        "SELECT (('0x' || substr(md5(r::VARCHAR || '|s0'), 1, 8))::BIGINT"
        " % 10000) FROM range(50) t(r) ORDER BY r").fetchall()
    assert [r.bp for r in got] == [w[0] for w in want]


def test_unigram_lm_score_hand_check(spark):
    # corpus: 'a a b' + 'b c' -> counts a:2 b:2 c:1, total=5, vocab=3
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id bigint, text string")
    out = {r.doc_id: r for r in unigram_lm_score(docs).collect()}
    denom = 5 + 3
    nl = {w: round(-math.log((c + 1) / denom), 6)
          for w, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert out[0].n_tokens == 3
    assert out[0].avg_neg_logp == pytest.approx(
        round((2 * nl["a"] + nl["b"]) / 3, 4), abs=1e-9)
    assert out[1].n_tokens == 2
    assert out[1].avg_neg_logp == pytest.approx(
        round((nl["b"] + nl["c"]) / 2, 4), abs=1e-9)


def test_ivf_ann_recall_on_clustered_vectors(spark):
    # two tight clusters far apart: IVF must return same-cluster
    # neighbors for every query (nearest cells contain the cluster)
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        center = np.zeros(8)
        center[0 if i < 20 else 4] = 10.0
        v = center + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    from lamapi_spark.ops.similarity import brute_force_topk, ivf_ann_topk

    qs = emb.filter(F.col("vec_id").isin([0, 25]))
    ivf = ivf_ann_topk(qs, emb, k=3, n_cells=4, n_probe=2)
    bf = brute_force_topk(qs, emb, k=3)
    got = {(r.q_id, r.n_id) for r in ivf.collect()}
    want = {(r.q_id, r.n_id) for r in bf.collect()}
    assert got == want  # clusters dominate: IVF top-3 == exact top-3
    # determinism: a second run returns the identical ranked list
    again = {(r.q_id, r.n_id, r.rnk) for r in ivf.collect()}
    first = {(r.q_id, r.n_id, r.rnk) for r in ivf_ann_topk(
        qs, emb, k=3, n_cells=4, n_probe=2).collect()}
    assert again == first


def test_bigram_lm_score_matches_python_reconstruction(spark):
    """bigram_lm_score equals an independent Python reconstruction of
    add-one bigram smoothing (context counts exclude doc-final
    positions; V = full unigram vocab), and a one-token doc is omitted
    (no bigram positions)."""
    import math
    from collections import Counter

    from lamapi_spark.ops.corpus import bigram_lm_score

    rows = [(0, "a b a b c"), (1, "a b"), (2, "c a b"), (3, "x")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.n_bigrams, r.avg_neg_logp)
           for r in bigram_lm_score(docs).collect()}

    toks = {i: t.split() for i, t in rows}
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    bc = Counter(b for bs in bigrams.values() for b in bs)
    ctx = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = len({w for ts in toks.values() for w in ts})
    want = {}
    for i, bs in bigrams.items():
        if not bs:
            continue
        nlps = [round(-math.log((bc[b] + 1) / (ctx[b[0]] + vocab)), 6)
                for b in bs]
        want[i] = (len(bs), round(sum(nlps) / len(bs), 4))
    assert set(got) == set(want) == {0, 1, 2}
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9, (i, got[i], want[i])
    # context-awareness: "b c" (rare continuation of a common context)
    # must cost more than "a b" (the dominant continuation)
    nlp = lambda b: round(-math.log((bc[b] + 1) / (ctx[b[0]] + vocab)), 6)
    assert nlp(("b", "c")) > nlp(("a", "b"))


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """A raw document written in the target domain's vocabulary gets a
    higher importance weight than one written off-domain, and the
    weights are a pure function of the corpora (repartition-stable)."""
    from lamapi_spark.ops.corpus import dsir_importance

    target = spark.createDataFrame(
        [(100 + i, "solar panels store energy in home batteries") for i in range(4)],
        "doc_id bigint, text string")
    raw = spark.createDataFrame(
        [(0, "solar panels and home batteries store energy"),   # target-like
         (1, "medieval castles guarded river crossings at night"),  # off-domain
         (2, "solar energy and river crossings")],               # mixed
        "doc_id bigint, text string")
    got = {r.doc_id: r.log_ratio
           for r in dsir_importance(raw, target, n_buckets=256).collect()}
    assert got[0] > got[2] > got[1], got
    got2 = {r.doc_id: r.log_ratio
            for r in dsir_importance(raw.repartition(5), target.repartition(3),
                                     n_buckets=256).collect()}
    assert got == got2


def test_split_by_group_no_leakage(spark):
    """Every row of a group lands in ONE split; proportions are
    roughly as requested; verdicts are partition-independent."""
    from collections import Counter

    from lamapi_spark.ops.corpus import split_by_group

    rows = [(i, i % 200) for i in range(2000)]  # 200 groups x 10 rows
    df = spark.createDataFrame(rows, "row_id bigint, grp bigint")
    out = split_by_group(df, "grp", val_bp=1500, test_bp=1000).collect()
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in by_grp.values())  # no straddling
    frac = Counter(next(iter(s)) for s in by_grp.values())
    assert 0.08 < frac["val"] / 200 < 0.22       # ~15% of groups
    assert 0.04 < frac["test"] / 200 < 0.18      # ~10%
    out2 = {(r.row_id): r.split for r in
            split_by_group(df.repartition(7), "grp",
                           val_bp=1500, test_bp=1000).collect()}
    assert out2 == {r.row_id: r.split for r in out}


def test_pack_sequences_invariants(spark):
    """Conservation: every chunk except the last covers exactly
    seq_len tokens; every doc's slices cover exactly its tokens in
    order; a doc longer than seq_len spans multiple chunks; zero-token
    docs emit nothing; the result is partition- AND bucket-width-
    independent (the two-level scan computes the sequential
    semantics no matter how it is parallelized)."""
    from lamapi_spark.ops.corpus import pack_sequences

    rows = [
        (1, "a b c d e"),            # 5 tokens
        (2, ""),                     # 0 -> no rows
        (3, " ".join(["t"] * 23)),   # spans >2 chunks at S=8
        (7, "x y z"),                # 3
        (10, "one two, three!"),     # 5 regex tokens (, and ! count)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = pack_sequences(docs, seq_len=8).collect()

    assert not any(r.doc_id == 2 for r in out)
    # per-doc conservation, contiguous doc_off
    per_doc: dict = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.doc_off)):
        per_doc.setdefault(r.doc_id, []).append(r)
    assert sum(r.len for r in per_doc[1]) == 5
    assert sum(r.len for r in per_doc[3]) == 23
    assert sum(r.len for r in per_doc[10]) == 5
    for slices in per_doc.values():
        pos = 0
        for s in slices:
            assert s.doc_off == pos
            pos += s.len
    # chunk coverage: 36 tokens at S=8 -> chunks 0..3 full, chunk 4 has 4
    per_chunk: dict = {}
    for r in out:
        per_chunk[r.chunk_id] = per_chunk.get(r.chunk_id, 0) + r.len
    assert per_chunk == {0: 8, 1: 8, 2: 8, 3: 8, 4: 4}
    assert len({r.chunk_id for r in per_doc[3]}) >= 3   # long doc spans
    # within-chunk offsets tile the chunk
    for cid in per_chunk:
        ch = sorted((r for r in out if r.chunk_id == cid),
                    key=lambda r: r.chunk_off)
        pos = 0
        for s in ch:
            assert s.chunk_off == pos
            pos += s.len

    key = lambda r: (r.chunk_id, r.doc_id, r.doc_off, r.chunk_off, r.len)
    base = sorted(map(key, out))
    again = pack_sequences(docs.repartition(7), seq_len=8,
                           bucket_width=2).collect()
    assert sorted(map(key, again)) == base


def test_train_linear_learns_and_is_partition_independent(spark):
    """On a planted separable corpus (positive docs speak one
    vocabulary, negative docs another) the two-iteration weights
    separate the classes; more iterations widen the margin; and the
    trained weights are EXACTLY partition-independent (the micro-unit
    protocol — gradients are integer sums)."""
    from lamapi_spark.ops.classifier import score_linear, train_linear

    pos_words = ["alpha", "beta", "gamma", "delta"]
    neg_words = ["omega", "sigma", "kappa", "theta"]
    rows = []
    for i in range(120):
        ws = pos_words if i % 2 == 0 else neg_words
        rows.append((i, " ".join(ws[j % 4] for j in range(i % 5 + 3)),
                     1 if i % 2 == 0 else 0))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, y bigint")

    w2 = train_linear(docs, "y", n_buckets=32, iters=2)
    scored = {r.doc_id: r.p for r in
              score_linear(docs, w2, n_buckets=32).collect()}
    acc = sum((scored[i] > 0.5) == (i % 2 == 0) for i in range(120)) / 120
    assert acc >= 0.95

    # margin grows with iterations (still descending)
    w6 = train_linear(docs, "y", n_buckets=32, iters=6)
    s6 = {r.doc_id: r.p for r in
          score_linear(docs, w6, n_buckets=32).collect()}
    margin2 = sum(s if i % 2 == 0 else 1 - s
                  for i, s in scored.items()) / 120
    margin6 = sum(s if i % 2 == 0 else 1 - s
                  for i, s in s6.items()) / 120
    assert margin6 > margin2

    # exact partition independence of the trained weights
    a = sorted(tuple(r) for r in w2.collect())
    b = sorted(tuple(r) for r in
               train_linear(docs.repartition(13), "y",
                            n_buckets=32, iters=2).collect())
    assert a == b


def test_pack_sequences_randomized_differential(spark):
    """Seeded random corpora (sparse ids, zero-token docs, docs much
    longer than seq_len) through pack_sequences vs an INDEPENDENT
    sequential Python packer — every offset, slice, and chunk
    assignment must match at random bucket widths."""
    import random

    from lamapi_spark.ops.corpus import pack_sequences

    rng = random.Random(20260818)
    for trial in range(4):
        seq_len = rng.choice([4, 8, 16])
        bucket_width = rng.choice([1, 2, 7, 64])
        ids = rng.sample(range(0, 5000), 60)
        docs = [(i, " ".join("t%d" % j for j in range(rng.randint(0, 40))))
                for i in ids]

        expected, off = [], 0
        for did, text in sorted(docs):
            n = len(text.split()) if text else 0
            if n <= 0:
                continue
            for c in range(off // seq_len, (off + n - 1) // seq_len + 1):
                s, e = max(off, c * seq_len), min(off + n, (c + 1) * seq_len)
                expected.append((c, did, s - off, s - c * seq_len, e - s))
            off += n

        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = sorted((r.chunk_id, r.doc_id, r.doc_off, r.chunk_off, r.len)
                     for r in pack_sequences(df, seq_len,
                                             bucket_width=bucket_width)
                     .collect())
        assert got == sorted(expected), f"trial {trial}"


def test_train_linear_randomized_differential(spark):
    """Seeded random corpora through train_linear vs an INDEPENDENT
    pure-Python implementation of the protocol (re + hashlib + floats
    in the documented order) — the trained micro-unit weights must be
    IDENTICAL, iteration for iteration. This is the cross-
    implementation check on the whole numeric chain (hashing, tf,
    residual rounding, gradient sums, driver step)."""
    import hashlib
    import random
    import re as _re

    from lamapi_spark.ops.classifier import train_linear

    def ref_train(docs, labels, m, iters, lr):
        tf: dict = {}
        for did, text in docs:
            toks = _re.split(r"\s+", text.strip().lower()) if text else [""]
            grams = list(toks)
            grams += [toks[i] + " " + toks[i + 1]
                      for i in range(len(toks) - 1)]
            for g in grams:
                b = int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % m
                tf[(did, b)] = tf.get((did, b), 0) + 1
            tf[(did, m)] = 1
        n = len(docs)
        w = {b: 0 for b in range(m + 1)}
        for _ in range(iters):
            r_u = {}
            for did, _text in docs:
                z_u = sum(x * w[b] for (d2, b), x in tf.items() if d2 == did)
                zd = float(z_u) / 1e6
                p = 0.5 + zd / (2.0 * (1.0 + abs(zd)))
                r_u[did] = round((p - float(labels[did])) * 1e6)
            g = {b: 0 for b in range(m + 1)}
            for (did, b), x in tf.items():
                g[b] += x * r_u[did]
            for b in g:
                w[b] -= round((lr * float(g[b])) / n)
        return w

    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    for trial in range(3):
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(1, 12))))
                for i in range(40)]
        labels = {i: rng.randint(0, 1) for i in range(40)}
        m, iters = rng.choice([8, 16]), rng.choice([1, 2, 3])

        df = spark.createDataFrame(
            [(i, t, labels[i]) for i, t in docs],
            "doc_id bigint, text string, y bigint")
        got = {r.bucket: r.w_micro
               for r in train_linear(df, "y", n_buckets=m,
                                     iters=iters).collect()}
        assert got == ref_train(docs, labels, m, iters, 0.5), f"trial {trial}"


def test_train_linear_join_arm_bit_equal(spark):
    """The broadcast-join weight arm (the >WEIGHTS_MAP_CAP plan a
    million-bucket model runs) produces bit-identical weights to the
    literal-map arm — both compute the same exact integer sums."""
    from lamapi_spark.ops.classifier import train_linear

    rows = [(i, "w%d x%d y" % (i % 9, i % 4), i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, y bigint")
    a = sorted(tuple(r) for r in
               train_linear(df, "y", n_buckets=16, iters=3,
                            weights_via_join=False).collect())
    b = sorted(tuple(r) for r in
               train_linear(df, "y", n_buckets=16, iters=3,
                            weights_via_join=True).collect())
    assert a == b


def test_ivf_artifact_survives_session_restart(tmp_path):
    """The embedding-side offline-index lifecycle: one process builds
    the persisted inverted file (bucketed on the cell key, _meta
    sidecar); a FRESH process loads it without touching the corpus and
    probes bit-identically to the in-memory path — FAISS's build-once/
    search-many, the sibling of the lookup-index restart test."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "index_session.py")
    ms, out = str(tmp_path / "ms"), str(tmp_path / "out")

    def run(mode):
        proc = subprocess.run(
            [sys.executable, script, mode, "--metastore", ms, "--out", out],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path))
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(
            [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])

    built = run("build-ivf")
    assert built["built"] and built["expected_rows"] > 0
    probed = run("probe-ivf")
    assert probed["match"], probed
    assert probed["bucketed_scan"], probed
    assert probed["n_cells"] == 8 and probed["n_buckets"] == 4
    assert probed["n_vecs"] > 0


def test_temperature_rates_flatten_the_mixture(spark):
    """Sqrt flattening: the small group's keep-rate exceeds the big
    group's; expected kept mass ~= target_frac * N; a group so small
    its rate would exceed 1.0 is capped at 10000 bp; rates are
    partition-independent."""
    from lamapi_spark.ops.corpus import temperature_rates

    rows = ([(i, "big") for i in range(900)]
            + [(i + 1000, "small") for i in range(99)]
            + [(2000, "tiny")])
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    r = {x.lang: x.rate_bp for x in
         temperature_rates(df, "lang", target_frac=0.25).collect()}
    assert r["small"] > r["big"]
    assert r["tiny"] == 10000                      # capped, not >1
    kept_mass = (900 * r["big"] + 99 * r["small"]) / 10000 + 1
    assert 0.15 * 1000 < kept_mass < 0.40 * 1000   # ~target, cap-skewed
    r2 = {x.lang: x.rate_bp for x in
          temperature_rates(df.repartition(7), "lang",
                            target_frac=0.25).collect()}
    assert r2 == r


def test_train_linear_resume_from_checkpoint(spark, tmp_path):
    """Kill-and-resume: train 2 of 5 iterations with a checkpoint dir,
    rerun asking for 5 — the rerun resumes from iteration 2 (only 3
    new sidecars appear) and the final weights are BIT-IDENTICAL to an
    uninterrupted 5-iteration run; a changed fingerprint (different
    lr) refuses the stale checkpoints and retrains from zero."""
    import os

    from lamapi_spark.ops.classifier import train_linear

    rows = [(i, "w%d q%d z" % (i % 7, i % 3), i % 2) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, y bigint")
    ck = str(tmp_path / "clf_ck")

    fresh = sorted(tuple(r) for r in
                   train_linear(df, "y", n_buckets=16, iters=5).collect())
    train_linear(df, "y", n_buckets=16, iters=2, checkpoint_dir=ck).collect()
    assert sorted(os.listdir(ck)) == ["iter_0001", "iter_0002"]
    resumed = sorted(tuple(r) for r in
                     train_linear(df, "y", n_buckets=16, iters=5,
                                  checkpoint_dir=ck).collect())
    assert resumed == fresh
    assert sorted(os.listdir(ck))[-1] == "iter_0005"

    other_lr = sorted(tuple(r) for r in
                      train_linear(df, "y", n_buckets=16, iters=5,
                                   lr=0.25, checkpoint_dir=ck).collect())
    assert other_lr == sorted(
        tuple(r) for r in
        train_linear(df, "y", n_buckets=16, iters=5, lr=0.25).collect())


def test_ccnet_buckets_tertiles_and_ordering(spark):
    from lamapi_spark.ops.corpus import ccnet_buckets

    # 9 docs in one language: exact thirds; rarer tokens => higher nlp
    rows = [(i, "en", "common " * 5 + f"rare{i} " * i) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = ccnet_buckets(docs).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.ppl_bucket, []).append(r)
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3}
    # every head score <= every middle score <= every tail score
    assert max(r.avg_neg_logp for r in by_bucket["head"]) <= \
        min(r.avg_neg_logp for r in by_bucket["middle"])
    assert max(r.avg_neg_logp for r in by_bucket["middle"]) <= \
        min(r.avg_neg_logp for r in by_bucket["tail"])


def test_ccnet_buckets_per_language_isolation(spark):
    from lamapi_spark.ops.corpus import ccnet_buckets

    rows = ([(i, "en", f"tok{i} " * 4) for i in range(6)]
            + [(100 + i, "de", f"wort{i} " * 4) for i in range(3)])
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = ccnet_buckets(docs).collect()
    en = [r for r in out if r.lang == "en"]
    de = [r for r in out if r.lang == "de"]
    assert len(en) == 6 and len(de) == 3
    # each language gets its own tertiles regardless of the other
    assert sorted(r.ppl_bucket for r in de) == ["head", "middle", "tail"]


def test_to_lines_and_c4_line_clean(spark):
    from lamapi_spark.ops.corpus import c4_line_clean, to_lines

    docs = spark.createDataFrame(
        [(1, "a b c d e f a b c d e f g h"),   # line0 == dup of itself? no: line0 'a b c d e f', line1 'a b c d e f', line2 'g h'
         (2, "a b c d e f x y z w v u"),        # line0 duplicates doc1's line0
         (3, "short one")],
        "doc_id bigint, text string")
    lines = to_lines(docs, words_per_line=6)
    got = {(r.doc_id, r.line_idx): r.line for r in lines.collect()}
    assert got[(1, 0)] == "a b c d e f"
    assert got[(1, 1)] == "a b c d e f"
    assert got[(1, 2)] == "g h"
    assert got[(3, 0)] == "short one"

    out = {r.doc_id: r for r in
           c4_line_clean(lines, min_words=3).collect()}
    # doc1: line0 kept (first occurrence corpus-wide), line1 dropped as
    # dup, line2 dropped by the min-words filter
    assert out[1].text_clean == "a b c d e f"
    assert out[1].n_kept == 1
    assert out[1].n_dropped_dup == 1
    assert out[1].n_dropped_filter == 1
    # doc2: its line0 is a corpus dup of doc1's; line1 unique
    assert out[2].text_clean == "x y z w v u"
    assert out[2].n_dropped_dup == 1
    # doc3: everything filtered -> empty but still a row
    assert out[3].text_clean == "" and out[3].n_kept == 0


def test_c4_line_clean_blocklist(spark):
    from lamapi_spark.ops.corpus import c4_line_clean

    lines = spark.createDataFrame(
        [(1, 0, "clean line here ok"), (1, 1, "has spam word inside")],
        "doc_id bigint, line_idx int, line string")
    out = c4_line_clean(lines, min_words=2, blocklist=("spam",)).collect()[0]
    assert out.text_clean == "clean line here ok"
    assert out.n_dropped_filter == 1


def test_domain_cap_deterministic_and_capped(spark):
    from lamapi_spark.ops.corpus import domain_cap

    rows = [(i, "d" + str(i % 3)) for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = domain_cap(docs, cap=10).collect()
    per = {}
    for r in kept:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 10 for v in per.values())
    kept2 = domain_cap(docs.repartition(13), cap=10).collect()
    assert sorted((r.source, r.doc_id) for r in kept)  == \
        sorted((r.source, r.doc_id) for r in kept2)


def test_sq8_quantize_and_topk_semantics(spark):
    from lamapi_spark.ops.similarity import sq8_quantize, sq8_topk

    # two tight clusters far apart: quantized top-1 must stay in-cluster
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.01 * i, 10.0, -5.0, 0.5 * i]))
    for i in range(6, 12):
        rows.append((i, [-10.0 - 0.01 * i, -10.0, 5.0, -0.5 * i]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    codes = sq8_quantize(emb)
    got = {r.vec_id: r.codes for r in codes.collect()}
    assert all(len(v) == 4 and all(0 <= c <= 255 for c in v)
               for v in got.values())
    # extremes of each dimension hit the grid ends
    dim0 = [got[i][0] for i in range(12)]
    assert max(dim0) == 255 and min(dim0) == 0
    q = codes.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("q_id"), "codes")
    top = sq8_topk(q, codes, k=3).collect()
    for r in top:
        same_cluster = (r.q_id < 6) == (r.n_id < 6)
        assert same_cluster, (r.q_id, r.n_id)
    # deterministic under repartitioning
    codes2 = sq8_quantize(emb.repartition(5))
    got2 = {r.vec_id: r.codes for r in codes2.collect()}
    assert got == got2


def test_sq8_zero_span_dimension_degrades(spark):
    from lamapi_spark.ops.similarity import sq8_quantize

    emb = spark.createDataFrame(
        [(1, [1.0, 7.5]), (2, [2.0, 7.5])],
        "vec_id bigint, embedding array<float>")
    got = {r.vec_id: r.codes for r in sq8_quantize(emb).collect()}
    assert got[1] == [0, 0] and got[2] == [255, 0]


def test_pq_encode_and_adc_topk_semantics(spark):
    from lamapi_spark.ops.similarity import pq_codebook, pq_encode, pq_topk

    # two tight 8-dim clusters far apart: ADC top-k must stay in-cluster
    rows = []
    for i in range(8):
        rows.append((i, [5.0 + 0.01 * i] * 4 + [-3.0] * 4))
    for i in range(8, 16):
        rows.append((i, [-5.0 - 0.01 * i] * 4 + [3.0] * 4))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cb = pq_codebook(emb, n_sub=2, ksub=4)
    assert cb.count() == 2 * 4
    # each codebook slice carries d/n_sub = 4 dims
    assert all(len(r.cb_vec) == 4 for r in cb.collect())
    codes = pq_encode(emb, cb, n_sub=2)
    got = {r.vec_id: r.codes for r in codes.collect()}
    assert all(len(v) == 2 and all(0 <= c <= 3 for c in v)
               for v in got.values())
    q = emb.filter(F.col("vec_id").isin(0, 9))
    top = pq_topk(q, codes, cb, k=3, n_sub=2, ksub=4).collect()
    assert len(top) == 6
    for r in top:
        assert (r.q_id < 8) == (r.n_id < 8), (r.q_id, r.n_id)
        assert r.dist >= 0.0


def test_pq_codes_partition_independent(spark):
    from lamapi_spark.ops.similarity import pq_codebook, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_codebook(emb, n_sub=8, ksub=8)
    a = sorted(map(tuple, pq_encode(emb, cb, n_sub=8).collect()))
    b = sorted(map(tuple,
                   pq_encode(emb.repartition(7), cb, n_sub=8).collect()))
    assert a == b and len(a) == 500


# ------------------------------------------------- retrieval chunking

def test_chunk_documents(spark):
    from lamapi_spark.ops.corpus import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))          # 10 tokens
    docs = spark.createDataFrame(
        [(1, words), (2, "short one"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = chunk_documents(docs, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,3,6,9 — trailing window is short
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.tok_start, r.n_tokens) for r in c1] == [
        (0, 4), (3, 4), (6, 4), (9, 1)]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[1].chunk_text == "w3 w4 w5 w6"              # 1-token overlap
    assert c1[3].chunk_text == "w9"
    # every token is covered and consecutive chunks overlap by size-stride
    assert by_doc[2][0].chunk_text == "short one"
    # empty / null text yield no rows
    assert 3 not in by_doc and 4 not in by_doc


# ------------------------------------------------- weighted sampling

def test_weighted_sample_semantics(spark):
    from lamapi_spark.ops.corpus import weighted_sample

    rows = [(i, 1.0 if i < 100 else 50.0) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, wgt double")
    got = weighted_sample(docs, "wgt", k=30).collect()
    assert len(got) == 30
    heavy = sum(1 for r in got if r.doc_id >= 100)
    # 20 heavy rows at 50x weight should essentially all survive a k=30
    # cut against 100 light rows (P[miss] is astronomically small)
    assert heavy >= 18
    # partition-independence: the sample is a pure function of the data
    a = sorted(r.doc_id for r in got)
    b = sorted(r.doc_id for r in
               weighted_sample(docs.repartition(13), "wgt", k=30).collect())
    assert a == b
    # exact size even when k > n survivors after the weight guard
    few = docs.filter("doc_id < 5")
    assert weighted_sample(few, "wgt", k=30).count() == 5
    # zero/null weights never sampled
    z = spark.createDataFrame([(1, 0.0), (2, None), (3, 2.0)],
                              "doc_id long, wgt double")
    assert [r.doc_id for r in weighted_sample(z, "wgt", k=3).collect()] == [3]
