"""Per-Spark-stage profile of the KG pipeline's checkpoint jobs.

Runs the identical workload as tools/bench_scaling.py's worker (same
fixtures, seeds, index artifacts) with the Spark event log enabled,
then parses the log to attribute every Spark stage — duration, task
time, shuffle read/write bytes, spill — to the pipeline stage whose
checkpoint write spawned it (StageRunner tags each write job with
``pipeline_stage:<name>``).

This is the profiling tool the round-4 verdict asked for: the
candidates stage is the dominant 4N cost; before cutting shuffle bytes
we need to know WHICH of its exchanges pays.

Usage:
  SCALING_CONVS=100000 SCALING_KG_SCALE=10 python tools/profile_pipeline.py 4 4
  python tools/profile_pipeline.py --parse /tmp/spark-events-XXXX   # re-parse
(args: n_executors cores_each; defaults 4 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _event_lines(log_path: str):
    """Yield event-log JSON lines. Spark 4 writes a rolling-log DIRECTORY
    eventlog_v2_<appId> holding (zstd-compressed) events_N_* part files;
    older versions write a single plain file."""
    import io
    import subprocess

    if os.path.isdir(log_path):
        inner = [f for f in os.listdir(log_path) if f.startswith("eventlog_v2_")]
        if inner and not any(f.startswith("events_") for f in os.listdir(log_path)):
            log_path = os.path.join(log_path, inner[0])
        part_files = sorted(
            os.path.join(log_path, f) for f in os.listdir(log_path)
            if f.startswith("events_"))
    else:
        part_files = [log_path]
    import shutil
    zstd = shutil.which("zstd") or "/root/miniconda/bin/zstd"
    for p in part_files:
        if p.endswith(".zstd"):
            proc = subprocess.Popen([zstd, "-d", "-c", p],
                                    stdout=subprocess.PIPE)
            yield from io.TextIOWrapper(proc.stdout)
            proc.wait()
        else:
            with open(p) as fh:
                yield from fh


def _report(log_path: str, stage_secs: dict) -> None:
    jobs, stages = {}, {}
    for line in _event_lines(log_path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "desc": props.get("spark.job.description", ""),
                "stage_ids": ev.get("Stage IDs", []),
            }
        elif e == "SparkListenerStageCompleted":
            info = ev["Stage Info"]
            st = stages.setdefault(info["Stage ID"], {})
            st["name"] = info["Stage Name"]
        elif e == "SparkListenerTaskEnd":
            st = stages.setdefault(ev["Stage ID"], {})
            tm = ev.get("Task Metrics") or {}
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            st["run_s"] = st.get("run_s", 0.0) + tm.get(
                "Executor Run Time", 0) / 1000.0
            st["shR"] = st.get("shR", 0.0) + (
                srm.get("Remote Bytes Read", 0)
                + srm.get("Local Bytes Read", 0)) / 1e6
            st["shW"] = st.get("shW", 0.0) + (
                swm.get("Shuffle Bytes Written", 0)) / 1e6
            st["rowsR"] = st.get("rowsR", 0) + srm.get("Total Records Read", 0)
            st["rowsW"] = st.get("rowsW", 0) + swm.get(
                "Shuffle Records Written", 0)
            st["spill"] = st.get("spill", 0.0) + tm.get(
                "Memory Bytes Spilled", 0) / 1e6
            st["out"] = st.get("out", 0.0) + ((tm.get("Output Metrics") or {})
                                              .get("Bytes Written", 0)) / 1e6

    by_pipe: dict[str, list[int]] = {}
    for j in sorted(jobs):
        d = jobs[j]["desc"] or ""
        key = d.split(":", 1)[1] if d.startswith("pipeline_stage:") else "(untagged)"
        by_pipe.setdefault(key, []).extend(jobs[j]["stage_ids"])
    for pipe, sids in by_pipe.items():
        rows = [(sid, stages[sid]) for sid in sorted(set(sids))
                if sid in stages and stages[sid].get("run_s", 0) > 0]
        if not rows:
            continue
        total = sum(s["run_s"] for _, s in rows)
        shw = sum(s.get("shW", 0) for _, s in rows)
        print(f"\n== {pipe}: {len(rows)} stages, task-time {total:.1f}s, "
              f"shuffle-write {shw:.0f}MB "
              f"(pipeline wall {stage_secs.get(pipe, '?')}s)")
        for sid, s in sorted(rows, key=lambda kv: -kv[1]["run_s"])[:14]:
            print(f"  st{sid:>4} task={s.get('run_s', 0):>7.1f}s "
                  f"shR={s.get('shR', 0):>8.1f} shW={s.get('shW', 0):>8.1f} "
                  f"rowsR={s.get('rowsR', 0):>10} rowsW={s.get('rowsW', 0):>10} "
                  f"spill={s.get('spill', 0):>7.1f} out={s.get('out', 0):>7.1f}")


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--parse":
        _report(sys.argv[2], {})
        return
    n_exec = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    convs = int(os.environ.get("SCALING_CONVS", "100000"))
    kg_scale = int(os.environ.get("SCALING_KG_SCALE", "10"))
    shuffle_parts = int(os.environ.get("SCALING_SHUFFLE_PARTITIONS", "80"))
    mem_mb = int(os.environ.get("SCALING_EXEC_MEM_MB", "6144"))

    import time

    from lamapi_spark.pipeline.fixtures import (
        build_kg, build_transcripts, kg_dataframes, transcript_dataframes,
    )
    from lamapi_spark.pipeline.run import build_index_artifacts, run_pipeline
    from lamapi_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    extra = {
        "spark.executor.memory": f"{mem_mb}m",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
    }
    spark = get_spark(
        app_name="profile_pipeline",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=shuffle_parts, extra_conf=extra)

    kg = build_kg(seed=42, n_people=400 * kg_scale, n_orgs=120 * kg_scale,
                  n_locs=60 * kg_scale, n_films=250 * kg_scale)
    dfs = kg_dataframes(spark, kg)
    tr = build_transcripts(kg, seed=43, n_convs=convs, turns_per_conv=(10, 20))
    dfs.update(transcript_dataframes(spark, *tr))
    tmp = tempfile.mkdtemp()
    dfs["transcripts"].repartition(n_exec * cores).write.parquet(tmp + "/transcripts")
    transcripts = spark.read.parquet(tmp + "/transcripts")
    n_turns = transcripts.count()

    idx = build_index_artifacts(spark, dfs["kg_items"], fuzzy=True,
                                limit_per_token=100, n_buckets=32, reuse=False)
    t0 = time.time()
    out = run_pipeline(spark, transcripts, dfs["kg_items"], dfs["kg_edges"],
                       dfs["kg_sameas"], checkpoint_dir=tmp + "/ckpt",
                       fuzzy=True, index=idx)
    n_triples = out["triples"].count()
    wall = round(time.time() - t0, 2)
    app_id = spark.sparkContext.applicationId
    stage_secs = {m["stage"]: m["duration_s"] for m in out["metrics"]}
    spark.stop()

    print(json.dumps({"turns": n_turns, "triples": n_triples, "wall_s": wall,
                      "cluster": f"{n_exec}x{cores}",
                      "pipeline_stage_secs": stage_secs}))
    log_path = os.path.join(evdir, app_id)
    if not os.path.exists(log_path):
        log_path = os.path.join(evdir, f"eventlog_v2_{app_id}")
    _report(log_path, stage_secs)


if __name__ == "__main__":
    main()
