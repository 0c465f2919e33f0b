"""Randomized differentials for the round-4d operators: each op runs
on seeded random inputs against an INDEPENDENT brute-force Python
implementation (the repo's differential-battery discipline — the
oracle SQL shares the dataflow shape, a Python brute force does not).
"""

from __future__ import annotations

import random


def _rand_kg(seed, n_ent=8, n_pred=3, n_facts=40):
    rng = random.Random(seed)
    return sorted({(f"e{rng.randrange(n_ent)}",
                    f"p{rng.randrange(n_pred)}",
                    f"e{rng.randrange(n_ent)}")
                   for _ in range(n_facts)})


def _brute_rules(facts, min_support, min_conf_bp):
    """Independent union-free reimplementation of AMIE mining."""
    fs = set(facts)
    preds = sorted({p for _, p, _ in fs})
    pairs = {p: {(s, o) for s, q, o in fs if q == p} for p in preds}
    out = {}
    for p in preds:
        for r in preds:
            if p == r:
                continue
            sup = len(pairs[p] & pairs[r])
            body = len(pairs[p])
            if sup >= min_support and sup * 10000 >= min_conf_bp * body:
                out[("p(x,y) => r(x,y)", p, None, r)] = (
                    sup, body, sup * 10000 // body)
    by_subj = {}
    for s, q, o in fs:
        by_subj.setdefault(s, []).append((q, o))
    for p in preds:
        for q in preds:
            body_pairs = set()
            for s, pp, y in fs:
                if pp != p:
                    continue
                for qq, z in by_subj.get(y, []):
                    if qq == q:
                        body_pairs.add((s, z))
            for r in preds:
                sup = len(body_pairs & pairs[r])
                body = len(body_pairs)
                if body and sup >= min_support \
                        and sup * 10000 >= min_conf_bp * body:
                    out[("p(x,y) & q(y,z) => r(x,z)", p, q, r)] = (
                        sup, body, sup * 10000 // body)
    return out


def test_rule_mining_differential(spark):
    from lamapi_spark.ops.graph import mine_horn_rules

    for seed in range(6):
        facts = _rand_kg(seed)
        df = spark.createDataFrame(facts, "subj string, pred string, obj string")
        got = {(r.rule, r.p, r.q, r.r): (r.support, r.body_n, r.conf_bp)
               for r in mine_horn_rules(df, min_support=2,
                                        min_conf_bp=4000).collect()}
        want = _brute_rules(facts, 2, 4000)
        assert got == want, seed


def _brute_truss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        nodes = {n for e in es for n in e}
        adj = {n: set() for n in nodes}
        for (a, b) in es:
            adj[a].add(b)
            adj[b].add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for (a, b) in es}
        kept = {e for e in es if sup[e] >= k - 2}
        if kept == es:
            return {e: sup[e] for e in es}
        es = kept


def test_k_truss_differential(spark):
    from lamapi_spark.ops.graph import k_truss

    for seed in range(6):
        rng = random.Random(100 + seed)
        edges = sorted({tuple(sorted((f"n{rng.randrange(10)}",
                                      f"n{rng.randrange(10)}")))
                        for _ in range(25)})
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "src string, dst string")
        for k in (3, 4):
            got = {(r.a, r.b): r.support
                   for r in k_truss(df, k=k).collect()}
            want = _brute_truss(edges, k)
            assert got == want, (seed, k)


def test_spearman_differential(spark):
    from lamapi_spark.ops.metrics import spearman_rho

    for seed in range(6):
        rng = random.Random(200 + seed)
        n = rng.randrange(3, 40)
        rows = [(i, float(rng.randrange(8)), float(rng.randrange(8)))
                for i in range(n)]
        df = spark.createDataFrame(rows, "k long, x double, y double")
        got = spearman_rho(df, "k", "x", "y", n_buckets=4).head()
        rx = {k: i + 1 for i, (k, _, _) in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0])))}
        ry = {k: i + 1 for i, (k, _, _) in enumerate(
            sorted(rows, key=lambda r: (r[2], r[0])))}
        s = sum((rx[k] - ry[k]) ** 2 for k, _, _ in rows)
        rho = round(1.0 - 6.0 * s / (n * (n * n - 1.0)), 6)
        assert (got.n, got.sum_d2) == (n, float(s)), seed
        assert got.rho == rho, seed


def test_blocking_quality_differential(spark):
    from lamapi_spark.ops.linkage import blocking_quality

    for seed in range(6):
        rng = random.Random(300 + seed)
        left = [(f"l{i}", rng.choice(["a", "b", "c", None]))
                for i in range(rng.randrange(4, 15))]
        right = [(f"r{i}", rng.choice(["a", "b", "d", None]))
                 for i in range(rng.randrange(4, 15))]
        gold = [(f"l{rng.randrange(20)}", f"r{rng.randrange(20)}")
                for _ in range(6)]
        got = blocking_quality(
            spark.createDataFrame(left, "rid string, blk string"),
            spark.createDataFrame(right, "rid string, blk string"),
            ("rid", "rid"), "blk",
            spark.createDataFrame(gold, "id_l string, id_r string")).head()
        lb, rb = dict(left), dict(right)
        cand = sum(
            sum(1 for _, b in left if b == blk)
            * sum(1 for _, b in right if b == blk)
            for blk in {b for _, b in left if b is not None}
            if any(b == blk for _, b in right))
        cov = sum(1 for gl, gr in gold
                  if lb.get(gl) is not None and lb.get(gl) == rb.get(gr))
        assert got.cand_pairs == cand, seed
        assert got.gold_covered == cov, seed
        assert got.total_pairs == len(left) * len(right), seed
