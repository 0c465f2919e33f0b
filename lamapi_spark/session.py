"""SparkSession factory with scale-oriented defaults.

Defaults chosen for a large multi-executor cluster; tests override
master/shuffle partitions for local[N]. All settings are plain Spark —
AQE handles runtime re-planning (coalesce, skew-join split), Arrow
backs every pandas UDF, and shuffle partitions are sized so a 100 TB
input at ~128 MB per task does not produce multi-GB partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scale-oriented defaults. On a real cluster `spark.sql.shuffle.partitions`
# should be ~2-3x total executor cores (AQE coalesces down); locally we
# keep it at the core count to avoid tiny-task overhead.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
    # a 256MB-compressed broadcast side can serialize past the 1g
    # maxResultSize default during the driver collect; size the limit to
    # the broadcast policy instead of failing mid-plan
    "spark.driver.maxResultSize": "4g",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "lamapi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    metastore_dir: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster pass ``None`` with a cluster master
    configured via spark-submit.

    ``metastore_dir`` (or env ``SPARK_GRAFT_METASTORE_DIR``) turns on a
    PERSISTENT catalog: Hive support over an embedded Derby metastore in
    that directory, warehouse alongside it. Bucketed index artifacts
    written via ``LookupIndex.write`` then survive session restarts —
    the offline-index lifecycle of the reference's ES index
    (scripts/elastic_indexing.py builds once, every lookup probes). On a
    real cluster the same code path points at a shared Hive metastore /
    Iceberg catalog; embedded Derby is single-session-at-a-time, which
    matches offline-build-then-probe usage."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else int(n)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    if metastore_dir is None:
        metastore_dir = os.environ.get("SPARK_GRAFT_METASTORE_DIR")
    hive = metastore_dir is not None
    if hive:
        conf.setdefault("spark.sql.warehouse.dir", f"{metastore_dir}/warehouse")
        conf.setdefault(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore_dir}/metastore_db;create=true")
        conf.setdefault("spark.sql.catalogImplementation", "hive")
    elif "SPARK_WAREHOUSE_DIR" in os.environ:
        # bucketed index artifacts (saveAsTable) land here; in-memory
        # catalog = per-session artifacts (bucketing metadata is lost on
        # exit — use metastore_dir for cross-session artifacts)
        conf.setdefault("spark.sql.warehouse.dir", os.environ["SPARK_WAREHOUSE_DIR"])
    else:
        import tempfile
        conf.setdefault("spark.sql.warehouse.dir",
                        tempfile.mkdtemp(prefix="spark-warehouse-"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    if hive:
        builder = builder.enableHiveSupport()
    return builder.getOrCreate()


def stop_all() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
