"""Wikidata JSON dump ingestion — the Spark re-expression of
``scripts/parse_wikidata_dump.py`` (S1/S3 + F11 in SURVEY §2).

The reference streams the bz2 dump line-by-line in one Python process
and buffers Mongo inserts. Here: ``spark.read.text`` scans the dump
(bz2/gzip handled natively, splittable across tasks for non-bz2), and an
Arrow-batched ``mapInPandas`` stage applies the exact per-entity parse
(kind/category inference, P31+P106 collapsing, datatype mapping,
polymorphic datavalue extraction) emitting FLAT rows tagged by record
type. One parse pass feeds all four tables via a partitioned write.

Why a pandas stage instead of ``from_json``: Wikidata's
``claims.*.mainsnak.datavalue.value`` is polymorphic (string | several
struct shapes), which a fixed from_json schema cannot express without
VARIANT gymnastics; the batched-Python parse keeps bit-exact parity with
the reference's traversal (parse_wikidata_dump.py:104-235) while still
parallelizing across partitions.

Deviation (documented): the reference assigns ``id_entity`` as a global
sequential counter — meaningless under distribution — so we derive it
deterministically from the entity id (numeric part; P-ids offset by
10^9).

Semantics parity notes (citations into the reference file):
- popularity = sitelink count, min 1 (:151-152)
- category: 'type' if any P279 claim, 'predicate' if id starts with 'P',
  else 'entity' (:165-173)
- aliases deduped per language (:158-163)
- claims without datavalue and lexeme datatypes skipped (:104-115)
- P31 and P106 values both collapse into types key 'P31' (:217-218)
- globe-coordinate -> "lat,lon", quantity -> amount, time -> time,
  monolingualtext -> text, else raw value (:118-135)
- malformed JSON lines and array brackets skipped (:241-252)
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATATYPES_MAPPINGS = {
    "external-id": "STRING",
    "quantity": "NUMBER",
    "globe-coordinate": "STRING",
    "string": "STRING",
    "monolingualtext": "STRING",
    "commonsMedia": "STRING",
    "time": "DATETIME",
    "url": "STRING",
    "geo-shape": "GEOSHAPE",
    "math": "MATH",
    "musical-notation": "MUSICAL_NOTATION",
    "tabular-data": "TABULAR_DATA",
}
_SKIP_DATATYPES = {"wikibase-lexeme", "wikibase-form", "wikibase-sense"}

TAGGED_SCHEMA = (
    "record_type string, id_entity long, entity string, description string, "
    "labels map<string,string>, aliases map<string,array<string>>, "
    "types array<string>, popularity int, kind string, "
    "subj string, pred string, obj string, datatype string, value string"
)


def _id_entity(entity: str) -> int:
    try:
        n = int(entity[1:])
    except ValueError:
        return -1
    return n + 1_000_000_000 if entity[0] == "P" else n


def _value_of(snak: dict, datatype: str):
    dv = snak["datavalue"]["value"]
    if datatype == "globe-coordinate":
        return f"{dv['latitude']},{dv['longitude']}"
    key = {"quantity": "amount", "monolingualtext": "text", "time": "time"}.get(datatype)
    return dv[key] if key else dv


def parse_entity(item: dict) -> list[tuple]:
    """One dump entity -> tagged flat rows (item / edge / literal / type)."""
    entity = item["id"]
    iid = _id_entity(entity)
    labels = {lang: v["value"] for lang, v in item.get("labels", {}).items()}
    aliases = {
        lang: sorted({a["value"] for a in vals})
        for lang, vals in item.get("aliases", {}).items()
    }
    description = item.get("descriptions", {}).get("en", {}).get("value")
    sitelinks = item.get("sitelinks", {})
    popularity = len(sitelinks) if sitelinks else 1
    claims = item.get("claims", {})
    category = "entity"
    if "P279" in claims:
        category = "type"
    if entity.startswith("P"):
        category = "predicate"

    rows: list[tuple] = []
    types: list[str] = []
    base = [iid, entity]
    for pred, objs in claims.items():
        for obj in objs:
            snak = obj.get("mainsnak", obj)
            datatype = snak.get("datatype")
            if "datavalue" not in snak or datatype in _SKIP_DATATYPES:
                continue
            if datatype in ("wikibase-item", "wikibase-property"):
                value = snak["datavalue"]["value"]["id"]
                if pred in ("P31", "P106"):
                    types.append(value)
                    rows.append(("type", *base, None, None, None, None, None, None,
                                 entity, pred, value, None, None))
                rows.append(("edge", *base, None, None, None, None, None, None,
                             entity, pred, value, None, None))
            elif datatype in DATATYPES_MAPPINGS:
                value = _value_of(snak, datatype)
                rows.append(("literal", *base, None, None, None, None, None, None,
                             entity, pred, None, DATATYPES_MAPPINGS[datatype],
                             str(value)))
    rows.append((
        "item", iid, entity, description, labels, aliases, types, popularity,
        category, None, None, None, None, None,
    ))
    return rows


def parse_dump_tagged(spark: SparkSession, path: str) -> DataFrame:
    """Dump file -> tagged flat DataFrame (one parse pass)."""
    import pandas as pd

    lines = spark.read.text(path)

    def parse_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["record_type", "id_entity", "entity", "description", "labels",
                "aliases", "types", "popularity", "kind",
                "subj", "pred", "obj", "datatype", "value"]
        for pdf in it:
            out: list[tuple] = []
            for line in pdf["value"]:
                line = line.strip()
                if line.endswith(","):
                    line = line[:-1]
                if len(line) < 2:
                    continue
                try:
                    item = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "id" not in item:
                    continue
                out.extend(parse_entity(item))
            yield pd.DataFrame(out, columns=cols)

    return lines.mapInPandas(parse_batches, schema=TAGGED_SCHEMA)


def split_tagged(tagged: DataFrame) -> dict[str, DataFrame]:
    """Tagged frame -> the four KG tables (FIXTURES.md §2 schemas)."""
    items = tagged.filter(F.col("record_type") == "item").select(
        F.col("id_entity").cast("int").alias("id_entity"), "entity",
        "description", "labels", "aliases", "types", "popularity", "kind",
        F.lit(None).cast("string").alias("NERtype"),
    )
    edges = tagged.filter(F.col("record_type") == "edge").select("subj", "pred", "obj")
    literals = tagged.filter(F.col("record_type") == "literal").select(
        F.col("subj").alias("entity"), "datatype", "pred", "value")
    types = tagged.filter(F.col("record_type") == "type").select(
        F.col("subj").alias("entity"), F.col("obj").alias("type_id"))
    return {"kg_items": items, "kg_edges": edges,
            "kg_literals": literals, "kg_types": types}


def ingest_dump(spark: SparkSession, dump_path: str, out_dir: str) -> dict[str, DataFrame]:
    """Parse once, write partitioned by record type (the S3 batched-sink
    analogue), return the four tables reading from the written store."""
    tagged = parse_dump_tagged(spark, dump_path)
    tagged.write.mode("overwrite").partitionBy("record_type").parquet(out_dir)
    return split_tagged(spark.read.parquet(out_dir))


def read_csv_entities(spark: SparkSession, path: str, **options) -> DataFrame:
    """S2 — chunked CSV ingest (scripts/parsing_cb.py:102,122) is just a
    parallel CSV scan in Spark."""
    return spark.read.csv(path, header=True, **options)
