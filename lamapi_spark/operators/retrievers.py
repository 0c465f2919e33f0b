"""Batch analogues of the reference's entity retriever endpoints.

Each reference endpoint takes a list of entity ids and returns nested
documents via a Mongo ``$in`` find (S6/J4,
api/model/data_retrievers/{objects,literals,types,labels,sameas}_retriever.py).
The batch shape: a requested-ids DataFrame semi/inner-joins the flat
table, then re-nests with groupBy + map/collect builders. At scale the
flat form IS the product (joins compose better); the nested builders
exist for response parity.

``predicates_for_pairs`` is J5 (predicates_retriever.py:52-73): probe
the adjacency for each (subj, obj) pair and collect the predicate list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ids_df(ids: DataFrame) -> DataFrame:
    """Normalize a requested-ids frame to a distinct `entity` column."""
    return ids.select(F.col(ids.columns[0]).alias("entity")).distinct()


def get_objects(ids: DataFrame, edges: DataFrame) -> DataFrame:
    """objects_retriever.py:11-26 — per entity: obj -> [preds] adjacency
    map. -> (entity, objects: map<string, array<string>>)."""
    return (
        _ids_df(ids).join(edges.withColumnRenamed("subj", "entity"), "entity")
        .groupBy("entity", "obj").agg(F.sort_array(F.collect_set("pred")).alias("preds"))
        .groupBy("entity")
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("obj", "preds")))).alias("objects"))
    )


def get_types(ids: DataFrame, types: DataFrame) -> DataFrame:
    """types_retriever.py:11-26 — per entity: P31 type-id list."""
    return (
        _ids_df(ids).join(types, "entity")
        .groupBy("entity")
        .agg(F.sort_array(F.collect_set("type_id")).alias("types"))
    )


def get_literals(ids: DataFrame, literals: DataFrame) -> DataFrame:
    """literals_retriever.py:11-26 — per entity: datatype -> pred ->
    [values] nest."""
    return (
        _ids_df(ids).join(literals, "entity")
        .groupBy("entity", "datatype", "pred")
        .agg(F.sort_array(F.collect_list("value")).alias("values"))
        .groupBy("entity", "datatype")
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("pred", "values")))).alias("preds"))
        .groupBy("entity")
        # no sort here: structs containing maps are not orderable, and
        # map content is key-addressed anyway
        .agg(F.map_from_entries(
            F.collect_list(F.struct("datatype", "preds"))).alias("literals"))
    )


def get_labels(ids: DataFrame, items: DataFrame, lang: str | None = None) -> DataFrame:
    """labels_retriever.py:11-41 — per entity: labels (optionally a
    single-language slice, F13) + the entity URL (F12)."""
    out = _ids_df(ids).join(
        items.select("entity", "labels"), "entity")
    if lang is not None:
        out = out.select(
            "entity",
            F.map_filter("labels", lambda k, _v: k == lang).alias("labels"))
    return out.select(
        "entity", "labels",
        F.concat(F.lit("https://www.wikidata.org/wiki/"), F.col("entity")).alias("url"),
    )


def get_sameas(ids: DataFrame, sameas: DataFrame) -> DataFrame:
    """sameas_retriever.py:11-26 — per entity: linked ids (both
    directions of the sameas pairs)."""
    sym = sameas.select(F.col("a").alias("entity"), F.col("b").alias("other")).unionByName(
        sameas.select(F.col("b").alias("entity"), F.col("a").alias("other")))
    return (
        _ids_df(ids).join(sym, "entity")
        .groupBy("entity").agg(F.sort_array(F.collect_set("other")).alias("sameas"))
    )


def predicates_for_pairs(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    """predicates_retriever.py:52-73 (J5) — for (subj, obj) pairs,
    the predicate list connecting them (absent pairs emit no row)."""
    return (
        pairs.select("subj", "obj").distinct()
        .join(edges, ["subj", "obj"])
        .groupBy("subj", "obj")
        .agg(F.sort_array(F.collect_set("pred")).alias("preds"))
    )
