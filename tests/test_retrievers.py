"""Retriever/summary/bow operators vs hand-computed expectations on the
smoke KG fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lamapi_spark.operators.bow import bow_similarity, entity_bows
from lamapi_spark.operators.retrievers import (
    get_labels, get_literals, get_objects, get_sameas, get_types,
    predicates_for_pairs,
)
from lamapi_spark.operators.summary import (
    literals_summary, objects_summary, summary_topk, with_distribution_scores,
)
from lamapi_spark.pipeline.fixtures import build_kg, kg_dataframes


@pytest.fixture(scope="module")
def kg_ctx(spark):
    kg = build_kg(seed=42)
    return kg, kg_dataframes(spark, kg)


def test_get_objects_nest(spark, kg_ctx):
    kg, dfs = kg_ctx
    subj = kg.edges[0][0]
    ids = spark.createDataFrame([(subj,)], ["entity"])
    row = get_objects(ids, dfs["kg_edges"]).first()
    expect: dict[str, list[str]] = {}
    for s, p, o in kg.edges:
        if s == subj:
            expect.setdefault(o, []).append(p)
    assert row.entity == subj
    assert {k: sorted(v) for k, v in row.objects.items()} == \
        {k: sorted(v) for k, v in expect.items()}


def test_get_types_literals_labels_sameas(spark, kg_ctx):
    kg, dfs = kg_ctx
    ent = kg.types[0][0]
    ids = spark.createDataFrame([(ent,)], ["entity"])
    t = get_types(ids, dfs["kg_types"]).first()
    assert t.types == sorted({ti for e, ti in kg.types if e == ent})

    lit_ent = kg.literals[0][0]
    ids2 = spark.createDataFrame([(lit_ent,)], ["entity"])
    l = get_literals(ids2, dfs["kg_literals"]).first()
    want = {}
    for e, dt, p, v in kg.literals:
        if e == lit_ent:
            want.setdefault(dt, {}).setdefault(p, []).append(v)
    assert {dt: dict(m) for dt, m in l.literals.items()} == want

    lab = get_labels(ids2, dfs["kg_items"], lang="en").first()
    assert lab.labels == {"en": kg.label_of[lit_ent]}
    assert lab.url.endswith(lit_ent)

    if kg.sameas:
        a, b = kg.sameas[0]
        s = get_sameas(spark.createDataFrame([(a,)], ["entity"]), dfs["kg_sameas"]).first()
        assert b in s.sameas


def test_predicates_for_pairs(spark, kg_ctx):
    kg, dfs = kg_ctx
    s, p, o = kg.edges[0]
    pairs = spark.createDataFrame([(s, o), ("Q999999", "Q999998")], ["subj", "obj"])
    got = predicates_for_pairs(pairs, dfs["kg_edges"]).collect()
    assert len(got) == 1 and got[0].subj == s and p in got[0].preds


def test_summary_and_scores(spark, kg_ctx):
    kg, dfs = kg_ctx
    objs = objects_summary(dfs["kg_edges"]).collect()
    from collections import Counter
    want = Counter(p for _s, p, _o in kg.edges)
    assert {r.pred: r["count"] for r in objs} == dict(want)

    lits = literals_summary(dfs["kg_literals"]).collect()
    wantl = Counter((dt, p) for _e, dt, p, _v in kg.literals)
    assert {(r.datatype, r.pred): r["count"] for r in lits} == dict(wantl)

    scored = with_distribution_scores(objects_summary(dfs["kg_edges"]))
    row = scored.orderBy(F.desc("count")).first()
    assert row.countNormMax == 1.0 and 0 < row.countNormSumAll <= 1.0

    top = summary_topk(objects_summary(dfs["kg_edges"]), k=2).collect()
    counts = sorted(want.values(), reverse=True)
    assert [r["count"] for r in top] == counts[:2]


def test_bow_similarity(spark, kg_ctx):
    kg, dfs = kg_ctx
    ent = next(q for q in kg.label_of if kg.label_of[q] and q.startswith("Q1"))
    label = kg.label_of[ent]
    texts = spark.createDataFrame([(1, f"tell me about {label} please")],
                                  ["request_id", "text"])
    bows = entity_bows(dfs["kg_items"]).filter(F.col("entity") == ent)
    row = bow_similarity(texts, bows).first()
    assert row.similarity_score > 0
    assert set(row.matched_words) & set(label.split(" "))
