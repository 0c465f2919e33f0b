"""Wikidata dump ingestion parity (scripts/parse_wikidata_dump.py
semantics) on a synthetic mini-dump."""

from __future__ import annotations

import json

import pytest

from lamapi_spark.sources.wikidata import ingest_dump, parse_entity

Q1 = {
    "id": "Q1",
    "labels": {"en": {"value": "Douglas Adams"}, "fr": {"value": "douglas adams"}},
    "aliases": {"en": [{"value": "D. Adams"}, {"value": "D. Adams"}]},
    "descriptions": {"en": {"value": "a writer"}},
    "sitelinks": {"enwiki": {}, "frwiki": {}, "dewiki": {}},
    "claims": {
        "P31": [{"mainsnak": {"datatype": "wikibase-item",
                              "datavalue": {"value": {"id": "Q5"}}}}],
        "P106": [{"mainsnak": {"datatype": "wikibase-item",
                               "datavalue": {"value": {"id": "Q36180"}}}}],
        "P69": [{"mainsnak": {"datatype": "wikibase-item",
                              "datavalue": {"value": {"id": "Q691283"}}}}],
        "P569": [{"mainsnak": {"datatype": "time",
                               "datavalue": {"value": {"time": "+1952-03-11T00:00:00Z"}}}}],
        "P2048": [{"mainsnak": {"datatype": "quantity",
                                "datavalue": {"value": {"amount": "+1.96"}}}}],
        "P625": [{"mainsnak": {"datatype": "globe-coordinate",
                               "datavalue": {"value": {"latitude": 52.0, "longitude": 0.1}}}}],
        "P9999": [{"mainsnak": {"datatype": "wikibase-lexeme",
                                "datavalue": {"value": "skipme"}}}],
        "P8888": [{"mainsnak": {"datatype": "string"}}],  # no datavalue -> skip
    },
}
Q2 = {  # a type (has P279), no sitelinks -> popularity 1
    "id": "Q5",
    "labels": {"en": {"value": "human"}},
    "claims": {"P279": [{"mainsnak": {"datatype": "wikibase-item",
                                      "datavalue": {"value": {"id": "Q66"}}}}]},
}
P1 = {"id": "P31", "labels": {"en": {"value": "instance of"}}, "claims": {}}


def test_parse_entity_semantics():
    rows = parse_entity(Q1)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r[0], []).append(r)
    item = by_type["item"][0]
    assert item[2] == "Q1" and item[3] == "a writer"
    assert item[4] == {"en": "Douglas Adams", "fr": "douglas adams"}
    assert item[5] == {"en": ["D. Adams"]}          # alias deduped
    assert item[6] == ["Q5", "Q36180"]              # P31 + P106 collapsed
    assert item[7] == 3                             # sitelink count
    assert item[8] == "entity"

    edges = {(r[9], r[10], r[11]) for r in by_type["edge"]}
    assert ("Q1", "P31", "Q5") in edges and ("Q1", "P69", "Q691283") in edges
    assert not any(p == "P9999" or p == "P8888" for _s, p, _o in edges)

    lits = {(r[10], r[12], r[13]) for r in by_type["literal"]}
    assert ("P569", "DATETIME", "+1952-03-11T00:00:00Z") in lits
    assert ("P2048", "NUMBER", "+1.96") in lits
    assert ("P625", "STRING", "52.0,0.1") in lits

    assert parse_entity(Q2)[-1][8] == "type"
    assert parse_entity(P1)[-1][8] == "predicate"


@pytest.fixture(scope="module")
def dump_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("dump") / "dump.json"
    lines = ["[", json.dumps(Q1) + ",", json.dumps(Q2) + ",",
             "{this is not json},", json.dumps(P1), "]"]
    p.write_text("\n".join(lines))
    return str(p)


def test_ingest_dump_tables(spark, dump_file, tmp_path):
    tables = ingest_dump(spark, dump_file, str(tmp_path / "kg"))
    items = {r.entity: r for r in tables["kg_items"].collect()}
    assert set(items) == {"Q1", "Q5", "P31"}        # malformed line skipped
    assert items["Q1"].kind == "entity" and items["Q5"].kind == "type"
    assert items["P31"].kind == "predicate"
    assert items["Q1"].popularity == 3 and items["Q5"].popularity == 1
    assert items["Q1"].labels["en"] == "Douglas Adams"
    assert items["Q1"].id_entity == 1 and items["P31"].id_entity == 1_000_000_031

    edges = {(r.subj, r.pred, r.obj) for r in tables["kg_edges"].collect()}
    assert ("Q1", "P106", "Q36180") in edges and ("Q5", "P279", "Q66") in edges

    types = {(r.entity, r.type_id) for r in tables["kg_types"].collect()}
    assert types == {("Q1", "Q5"), ("Q1", "Q36180")}

    lits = {(r.entity, r.datatype, r.pred, r.value)
            for r in tables["kg_literals"].collect()}
    assert ("Q1", "STRING", "P625", "52.0,0.1") in lits


def test_ingested_kg_feeds_label_dict(spark, dump_file, tmp_path):
    from lamapi_spark.operators.label_dict import build_label_dict
    tables = ingest_dump(spark, dump_file, str(tmp_path / "kg2"))
    ld = build_label_dict(tables["kg_items"])
    names = {(r.entity, r.name_norm) for r in ld.collect()}
    assert ("Q1", "douglas adams") in names and ("Q1", "d. adams") in names
