"""Crunchbase-style CSV ingestion — the Spark re-expression of
``scripts/parsing_cb.py`` (the reference's second KG source, and the
only reference path that populates ``kind``/``NERtype``).

Reference semantics (parsing_cb.py:39-77):
- one entity per CSV row, id = ``permalink``, label = ``name`` (en);
- ``alias1..alias3`` are intentionally DROPPED ("too noisy ... false
  positives", parsing_cb.py:50-51) — aliases ingest as an empty list;
- every other column becomes a literal, datatyped by ``classify_value``
  (isoparse -> DATETIME, float -> NUMBER, else STRING — NOT the
  literal-recognizer regex cascade; see functions/literals.py
  ``classify_value_cb``);
- fixed typing: ``types = {"P31": ["Organization"]}``, ``kind =
  "entity"``, ``NERtype = "ORG"`` (parsing_cb.py:59-69) — so a
  cb-ingested store carries NERtype on every item;
- description/popularity come from an optional side table keyed by
  permalink (parsing_cb.py:44-47), defaulting to ""/0.

Spark shape: the CSV scans in parallel (S2); the literal melt is a
``stack`` projection (no shuffle); ``id_entity`` derives deterministically
from md5(permalink) instead of the reference's global sequential counter
(meaningless under distribution — same deviation as the dump parser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lamapi_spark.functions.literals import classify_value_cb

_RESERVED = ("permalink", "name", "alias1", "alias2", "alias3")


def _id_entity(entity_col):
    # deterministic surrogate id: top 31 bits of md5 (positive int)
    return F.conv(F.substring(F.md5(entity_col), 1, 8), 16, 10).cast("long") \
        .bitwiseAND(F.lit((1 << 31) - 1)).cast("int")


def parse_cb_entities(csv_df: DataFrame,
                      extra: DataFrame | None = None) -> dict[str, DataFrame]:
    """CSV frame -> {kg_items, kg_literals, kg_types} (FIXTURES.md §2
    schemas). ``extra`` optionally supplies (permalink, description,
    popularity) like the reference's additional_data dict."""
    base = csv_df.filter(F.col("permalink").isNotNull())
    if extra is not None:
        base = base.join(
            F.broadcast(extra.select("permalink", "description", "popularity")),
            "permalink", "left")
    else:
        base = base.withColumn("description", F.lit(None).cast("string")) \
                   .withColumn("popularity", F.lit(None).cast("int"))

    items = base.select(
        _id_entity(F.col("permalink")).alias("id_entity"),
        F.col("permalink").alias("entity"),
        # "nan" descriptions blank out (parsing_cb.py:45-46)
        F.when(F.lower(F.coalesce("description", F.lit(""))) == "nan", F.lit(""))
        .otherwise(F.coalesce("description", F.lit(""))).alias("description"),
        F.create_map(F.lit("en"), F.col("name").cast("string")).alias("labels"),
        # aliases dropped by design (parsing_cb.py:50-51)
        F.create_map(
            F.lit("en"), F.array().cast("array<string>")).alias("aliases"),
        F.array(F.lit("Organization")).alias("types"),
        F.coalesce("popularity", F.lit(0)).cast("int").alias("popularity"),
        F.lit("entity").alias("kind"),
        F.lit("ORG").alias("NERtype"),
    )

    lit_cols = [c for c in csv_df.columns if c not in _RESERVED]
    if lit_cols:
        stack_expr = "stack({n}, {args}) as (pred, value)".format(
            n=len(lit_cols),
            args=", ".join(f"'{c}', cast(`{c}` as string)" for c in lit_cols))
        literals = (
            base.select(F.col("permalink").alias("entity"), F.expr(stack_expr))
            .filter(F.col("value").isNotNull())
            .select("entity", classify_value_cb(F.col("value")).alias("datatype"),
                    "pred", "value")
        )
    else:
        literals = base.sparkSession.createDataFrame(
            [], "entity string, datatype string, pred string, value string")

    types = base.select(
        F.col("permalink").alias("entity"),
        F.lit("Organization").alias("type_id"),
    )
    return {"kg_items": items, "kg_literals": literals, "kg_types": types}


def ingest_cb_csv(spark, path: str, extra: DataFrame | None = None,
                  **csv_options) -> dict[str, DataFrame]:
    """S2 end-to-end: parallel CSV scan -> the three cb tables."""
    df = spark.read.csv(path, header=True, **csv_options)
    return parse_cb_entities(df, extra)


# NERtype groups by Wikidata P31 root classes. The reference's dump
# parser leaves NERtype unset (only the cb source assigns it); deriving
# it from instance-of types is the documented deviation that lets
# dump-ingested stores exercise NERtype-dependent paths (the PERS
# dot-abbreviation aliases, NE column typing) without an external NER
# model. Q5=human; Q43229=organization, Q4830453=business, Q783794=company;
# Q618123=geographical object, Q56061=admin territory, Q515=city.
NER_TYPE_GROUPS: dict[str, tuple[str, ...]] = {
    "PERS": ("Q5",),
    "ORG": ("Q43229", "Q4830453", "Q783794"),
    "LOC": ("Q618123", "Q56061", "Q515"),
}


def derive_ner_type(items: DataFrame,
                    groups: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """Fill a null ``NERtype`` from the item's types array: first group
    (PERS > ORG > LOC) whose type set intersects wins; typed-but-unmatched
    entities get OTHER; untyped stay null. Pure column expressions."""
    groups = groups or NER_TYPE_GROUPS
    expr = None
    for ner, qids in groups.items():
        cond = F.arrays_overlap(
            F.coalesce("types", F.array().cast("array<string>")),
            F.array(*[F.lit(q) for q in qids]))
        expr = F.when(cond, F.lit(ner)) if expr is None else expr.when(cond, F.lit(ner))
    expr = expr.when(
        F.size(F.coalesce("types", F.array().cast("array<string>"))) > 0,
        F.lit("OTHER")).otherwise(F.lit(None).cast("string"))
    return items.withColumn("NERtype", F.coalesce("NERtype", expr))
