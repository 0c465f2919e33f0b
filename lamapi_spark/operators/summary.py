"""Predicate-summary aggregations — batch form of scripts/summary.py.

A1 (objects): the Mongo $objectToArray->$unwind->$group pipeline over the
adjacency becomes explode -> groupBy(pred).count() (partial+final hash
agg, one shuffle on pred — the reference materializes `objectsSummary`).
A2 (literals): composite (datatype, pred) key.
A3 (stats): mean/stddev/max/min/sum of the counts + per-row normalized
scores countNormSumAll / countNormMax / countNormMinMax / countNormZScore
(all bround 2, scripts/summary.py:33-62).
A9: the summary endpoint reads top-k by count (summary_retriever.py:14-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def objects_summary(edges: DataFrame) -> DataFrame:
    return edges.groupBy("pred").agg(F.count("*").alias("count"))


def literals_summary(literals: DataFrame) -> DataFrame:
    return literals.groupBy("datatype", "pred").agg(F.count("*").alias("count"))


def with_distribution_scores(summary: DataFrame) -> DataFrame:
    """Attach the reference's four normalized scores to a count table."""
    stats = summary.agg(
        F.avg("count").alias("_mean"),
        F.stddev_samp("count").alias("_std"),
        F.max("count").alias("_max"),
        F.min("count").alias("_min"),
        F.sum("count").alias("_sum"),
    )
    return (
        summary.crossJoin(F.broadcast(stats))
        .withColumn("countNormSumAll", F.bround(F.col("count") / F.col("_sum"), 2))
        .withColumn("countNormMax", F.bround(F.col("count") / F.col("_max"), 2))
        .withColumn("countNormMinMax", F.bround(
            (F.col("count") - F.col("_min"))
            / F.greatest(F.col("_max") - F.col("_min"), F.lit(1)), 2))
        .withColumn("countNormZScore", F.bround(
            (F.col("count") - F.col("_mean")) / F.col("_std"), 2))
        .drop("_mean", "_std", "_max", "_min", "_sum")
    )


def with_labels(summary: DataFrame, items: DataFrame, key: str = "pred",
                label_expr=None) -> DataFrame:
    """Attach human-readable labels to a predicate summary — the
    reference resolves each summarized PID to its English label before
    inserting, defaulting to 'Unknown Label' (scripts/summary.py:19-22,
    64-79). The default label expression reads ``labels['en']`` from a
    kg_items frame.

    Plan shape: ``items`` is NOT force-broadcast — it is only
    column-pruned here, so at a 10^8-entity items table an unconditional
    broadcast OOMs the driver. The summary side (distinct predicates) is
    the tiny one: semi-join the label frame down to the summary's keys
    first, then let AQE pick broadcast for the now-small label side."""
    lab_col = label_expr if label_expr is not None else F.col("labels").getItem("en")
    lab = (items.select(F.col("entity").alias(key), lab_col.alias("_lab"))
           .join(summary.select(key).distinct(), key, "left_semi"))
    return (
        summary.join(lab, key, "left")
        .withColumn("label", F.coalesce("_lab", F.lit("Unknown Label")))
        .drop("_lab")
    )


def summary_topk(summary: DataFrame, k: int = 10, ascending: bool = False) -> DataFrame:
    order = F.asc("count") if ascending else F.desc("count")
    return summary.orderBy(order, *summary.columns[:1]).limit(k)
