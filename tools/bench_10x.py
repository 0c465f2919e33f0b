"""Round-4 verdict stretch item: one 10x-input run (37.5M turns) of the
KG pipeline at the 4x4 level only, to surface memory cliffs the 3.75M
input cannot.

The driver-side fixture generator cannot build 2.5M conversations
(tens of GB of Python objects), so the input is the PROTOCOL input
(250k convs, seeds 42/43 — the exact frame every scaling pair ran)
replicated 10x IN SPARK with conv_id remapped per copy
(``<conv_id>#<k>``): same dictionary, same per-conversation structure,
10x the volume. This is a stress input for spill/memory behavior, not
a throughput point comparable to the protocol pairs (conversations
repeat 10x, so checkpoint compression and cache hit rates differ from
an organic corpus).

Usage: SPARK_DRIVER_MEMORY=16g python tools/bench_10x.py [replication]
Prints one JSON line with wall, per-stage seconds, and shuffle spill
harvested from the event log.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 10
CONVS = int(os.environ.get("SCALING_CONVS", "250000"))
KG_SCALE = int(os.environ.get("SCALING_KG_SCALE", "10"))
MEM_MB = int(os.environ.get("SCALING_EXEC_MEM_MB", "6144"))
# shuffle partitions scale with input per the bench_scaling heap note:
# 80 at 1x input -> 10x rows per partition would OOM the same way the
# round-3 2.5x control did; 10x partitions keeps per-task volume flat
SHUFFLE = int(os.environ.get("SCALING_SHUFFLE_PARTITIONS", str(80 * REPL)))


def main() -> None:
    from pyspark.sql import functions as F

    from lamapi_spark.pipeline.fixtures import (
        build_kg, build_transcripts, kg_dataframes, transcript_dataframes,
    )
    from lamapi_spark.pipeline.run import build_index_artifacts, run_pipeline
    from lamapi_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="spark-events-10x-")
    spark = get_spark(
        app_name="bench_10x",
        master=f"local-cluster[4,4,{MEM_MB}]",
        shuffle_partitions=SHUFFLE,
        extra_conf={"spark.executor.memory": f"{MEM_MB}m",
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": evdir})
    kg = build_kg(seed=42, n_people=400 * KG_SCALE, n_orgs=120 * KG_SCALE,
                  n_locs=60 * KG_SCALE, n_films=250 * KG_SCALE)
    dfs = kg_dataframes(spark, kg)
    tr = build_transcripts(kg, seed=43, n_convs=CONVS, turns_per_conv=(10, 20))
    dfs.update(transcript_dataframes(spark, *tr))
    tmp = tempfile.mkdtemp(prefix="bench10x-")
    base = dfs["transcripts"]
    repl = (base.crossJoin(
                F.broadcast(spark.range(REPL).select(F.col("id").alias("_k"))))
            .withColumn("conv_id", F.concat_ws("#", "conv_id", "_k"))
            .drop("_k"))
    repl.repartition(16 * REPL).write.parquet(tmp + "/transcripts")
    transcripts = spark.read.parquet(tmp + "/transcripts")
    n_turns = transcripts.count()

    idx = build_index_artifacts(spark, dfs["kg_items"], fuzzy=True,
                                limit_per_token=100, n_buckets=32,
                                reuse=False)
    t0 = time.time()
    out = run_pipeline(spark, transcripts, dfs["kg_items"], dfs["kg_edges"],
                       dfs["kg_sameas"], checkpoint_dir=tmp + "/ckpt",
                       fuzzy=True, index=idx)
    n_triples = out["triples"].count()
    wall = round(time.time() - t0, 2)
    stages = {m["stage"]: m["duration_s"] for m in out["metrics"]}
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # spill harvest from the event log
    spill_mb = disk_spill_mb = 0.0
    from tools.profile_pipeline import _event_lines
    log_path = os.path.join(evdir, app_id)
    if not os.path.exists(log_path):
        log_path = os.path.join(evdir, f"eventlog_v2_{app_id}")
    for line in _event_lines(log_path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerTaskEnd":
            tm = ev.get("Task Metrics") or {}
            spill_mb += tm.get("Memory Bytes Spilled", 0) / 1e6
            disk_spill_mb += tm.get("Disk Bytes Spilled", 0) / 1e6

    print(json.dumps({
        "metric": "kg_pipeline_10x", "replication": REPL,
        "turns": n_turns, "triples": n_triples, "sec": wall,
        "turns_per_sec": round(n_turns / wall, 1),
        "shuffle_partitions": SHUFFLE,
        "mem_spill_mb": round(spill_mb, 1),
        "disk_spill_mb": round(disk_spill_mb, 1),
        "stages": stages,
    }))


if __name__ == "__main__":
    main()
