"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship lookup-shaped query on /root/testdata/sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops), (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL twins; names and column aliases
                match the Spark outputs exactly.

Implementation lives in lamapi_spark.queries (the registry) — this file
stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lamapi_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full entity-lookup shape (token match -> rank ->
    features -> top-k) with documents as the mention stream and part as
    the label dictionary."""
    return _q.queries()["lookup_candidates"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
