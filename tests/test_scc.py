"""Strongly connected components (ops/graph.strongly_connected_components):
planted directed structures + randomized differential vs an independent
Python Kosaraju."""

from __future__ import annotations

import random

from lamapi_spark.ops.graph import strongly_connected_components


def kosaraju(edges):
    """Independent oracle: iterative Kosaraju, scc id = min member."""
    nodes = sorted({v for e in edges for v in e})
    adj, radj = {v: [] for v in nodes}, {v: [] for v in nodes}
    for s, d in edges:
        adj[s].append(d)
        radj[d].append(s)
    seen, order = set(), []
    for v in nodes:
        if v in seen:
            continue
        stack = [(v, iter(adj[v]))]
        seen.add(v)
        while stack:
            u, it = stack[-1]
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(adj[w])))
                    break
            else:
                order.append(u)
                stack.pop()
    comp = {}
    for v in reversed(order):
        if v in comp:
            continue
        members, stack = [], [v]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp[u] = v
            members.append(u)
            stack.extend(w for w in radj[u] if w not in comp)
        m = min(members)
        for u in members:
            comp[u] = m
    return comp


def run_op(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.scc for r in strongly_connected_components(df).collect()}


def test_planted_structures(spark):
    edges = [
        # 3-cycle a->b->c->a
        ("a", "b"), ("b", "c"), ("c", "a"),
        # 2-cycle d<->e hanging off the cycle (a->d)
        ("a", "d"), ("d", "e"), ("e", "d"),
        # pure DAG tail: e->f->g
        ("e", "f"), ("f", "g"),
        # two nodes that share fwd/bwd reachers but are NOT mutual:
        # h->x, i->x, y->h, y->i  (the (minFwd,minBwd)-pair fallacy)
        ("h", "x"), ("i", "x"), ("y", "h"), ("y", "i"),
    ]
    got = run_op(spark, edges)
    assert got == kosaraju(edges)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["d"] == got["e"] == "d"
    assert got["f"] == "f" and got["g"] == "g"
    assert got["h"] != got["i"]  # not mutually reachable


def test_randomized_differential(spark):
    rng = random.Random(7)
    n = 40
    nodes = [f"n{i:02d}" for i in range(n)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)})
    edges = [e for e in edges if e[0] != e[1]]
    got = run_op(spark, edges)
    assert got == kosaraju(edges)
    sizes = {}
    for scc in got.values():
        sizes[scc] = sizes.get(scc, 0) + 1
    assert max(sizes.values()) > 1  # the sweep must exercise a real cycle


def test_self_loop_and_singleton(spark):
    edges = [("a", "a"), ("a", "b")]
    got = run_op(spark, edges)
    assert got == {"a": "a", "b": "b"}
