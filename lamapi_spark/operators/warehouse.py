"""Managed-table location hygiene for offline index artifacts.

``saveAsTable`` on a managed table refuses to create a table whose
warehouse location directory already exists when the catalog has no
entry for it (LOCATION_ALREADY_EXISTS): exactly the state left behind
when a PREVIOUS process wrote the artifact through a different
metastore (e.g. the in-memory catalog) against a PERSISTENT warehouse
directory. The reference handles the analogous rebuild by deleting and
recreating the ES index before indexing (scripts/elastic_indexing.py
``es_client.indices.delete``/``create``); this module gives our
artifact writers the same drop-then-create discipline.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def clean_stale_location(spark: SparkSession, table: str) -> None:
    """Delete the orphaned warehouse directory for ``table`` when the
    catalog has NO entry covering it (a leftover from a previous
    process/metastore). When the catalog does know the table, normal
    overwrite/append semantics apply and nothing is touched — so this
    never turns ``errorifexists`` into a silent overwrite."""
    if spark.catalog.tableExists(table):
        return
    db = spark.catalog.currentDatabase()
    loc = spark.catalog.getDatabase(db).locationUri
    jvm = spark._jvm
    # metastore table names are lowercased; the managed location for the
    # default database is <warehouse>/<table>, for others <db>.db/<table>
    # — getDatabase().locationUri already resolves the db-level dir
    path = jvm.org.apache.hadoop.fs.Path(loc, table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)
