"""Label-dictionary build parity (reference scripts/elastic_indexing.py
explosion/dedup semantics)."""

from __future__ import annotations

from lamapi_spark.operators.label_dict import (
    build_label_dict,
    fuzzy_token_index,
    token_inverted_index,
)
from lamapi_spark.pipeline.fixtures import ITEMS_SCHEMA


def _items(spark, rows):
    return spark.createDataFrame(rows, ITEMS_SCHEMA)


def test_label_alias_dedup_and_languages(spark):
    rows = [
        {
            "id_entity": 1, "entity": "Q1", "description": "a film",
            "labels": {"en": "Batman Begins", "it": "batman begins"},
            "aliases": {"en": ["Batman Begins", "Batman 5"], "fr": ["batman 5"]},
            "types": ["Q11424"], "popularity": 50, "kind": "entity", "NERtype": "OTHERS",
        },
        {
            "id_entity": 2, "entity": "Q2", "description": "a person",
            "labels": {"en": "John Fitzgerald Kennedy"},
            "aliases": {"en": ["JFK"]},
            "types": ["Q5"], "popularity": 100, "kind": "entity", "NERtype": "PERS",
        },
    ]
    out = build_label_dict(_items(spark, rows)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r.entity, r.name_norm), []).append(r)

    # label+same-cased-alias collapse to ONE row, label wins, alias langs dropped
    bb = by_key[("Q1", "batman begins")]
    assert len(bb) == 1 and bb[0].name == "Batman Begins"
    assert bb[0].is_alias is False and bb[0].language == ["en", "it"]

    # alias-only key: both languages collected, is_alias True
    b5 = by_key[("Q1", "batman 5")]
    assert len(b5) == 1 and b5[0].is_alias is True
    assert set(b5[0].language) == {"en", "fr"} and b5[0].name == "Batman 5"

    # PERS rows: label row + JFK alias + 3 dot variants (incl. duplicate full name)
    q2 = [r for r in out if r.entity == "Q2"]
    names = sorted(r.name for r in q2)
    assert names == sorted([
        "John Fitzgerald Kennedy", "JFK",
        "John Fitzgerald Kennedy", "J. Fitzgerald Kennedy", "J. F. Kennedy",
    ])
    dup = [r for r in q2 if r.name == "John Fitzgerald Kennedy"]
    assert sorted(r.is_alias for r in dup) == [False, True]

    # features: popularity normalized against global max (100), banker's round
    assert bb[0].popularity == 0.5
    assert bb[0].length == len("Batman Begins") and bb[0].ntoken == 2

    jfk = [r for r in q2 if r.name == "J. F. Kennedy"][0]
    assert jfk.ntoken == 3 and jfk.length == 13 and jfk.popularity == 1.0


def test_token_and_fuzzy_index(spark):
    rows = [{
        "id_entity": 1, "entity": "Q1", "description": None,
        "labels": {"en": "Jurassic World"}, "aliases": {}, "types": [],
        "popularity": 10, "kind": "entity", "NERtype": None,
    }]
    ld = build_label_dict(_items(spark, rows))
    toks = {r.token for r in token_inverted_index(ld).collect()}
    assert toks == {"jurassic", "world"}

    fz = fuzzy_token_index(ld)
    variants = {r.variant for r in fz.filter("token = 'world'").collect()}
    # len('world')=5 -> band 1: token itself + single deletions
    assert variants == {"world", "orld", "wrld", "wold", "word", "worl"}
