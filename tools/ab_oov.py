"""A/B/C the OOV gaps-and-islands formulations at the N scaling level.

Pair E (BENCH.md) showed oov_mentions at 1x4 reproducibly ~40% slower
than pair A's pre-fold reading (53.7-60.8s vs 38.1s) — evidence the
round-4 'single-shuffle' fold traded a cheap exchange for expensive
interpreted array-churn (aggregate lambda rebuilding arrays with
concat(slice(...)) per element).

Variants, all over the identical `oov` token frame (same vocab path as
the artifact pipeline):
  A: the round-4 fold (REPLACED by C at HEAD) — collect_list +
     F.aggregate (one exchange, O(n^2) array copies per turn in an
     interpreted lambda)
  B: pre-round-4 — row_number window + group-by (two exchanges, cheap
     per-row exprs)
  C: single exchange + cheap indexed lambdas — collect_list once, run
     keys from (pos - index), runs via transform/filter (no array
     rebuilding, no second exchange) — ADOPTED in pipeline/mentions.py
  D: B + in-array (pos, token) sort — determinism at B's shape

Each variant runs REPEATS times interleaved (AB_VARIANTS selects,
AB_EXECUTORS sets the local-cluster size); the deterministic variants
(A/C/D) are asserted hash-identical via an order-independent
bit_xor(xxhash64(...)). B is EXPECTED to disagree — this tool is what
caught its arrival-order-dependent collect_list surfaces emitting
different hashes across identical 4x4 runs, which is why B is
disqualified despite being ~5-8% faster (BENCH.md). Usage:
  SPARK_DRIVER_MEMORY=16g python tools/ab_oov.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lamapi_spark.functions import clean_str
from lamapi_spark.functions.literals import classify_literal
from lamapi_spark.pipeline.fixtures import (
    build_kg, build_transcripts, kg_dataframes, transcript_dataframes,
)
from lamapi_spark.pipeline.mentions import STOPWORDS, _fan_out
from lamapi_spark.pipeline.run import build_index_artifacts
from lamapi_spark.session import get_spark

CONVS = int(os.environ.get("AB_CONVS", "250000"))
REPEATS = int(os.environ.get("AB_REPEATS", "2"))
EXEC_MEM = int(os.environ.get("SCALING_EXEC_MEM_MB", "6144"))


def build_oov(spark, transcripts, index):
    """Replicates detect_oov_mentions up to the oov token frame
    (artifact-index path, shuffle_hash joins — the scaling plan)."""
    vocab = (index.token.select("token").distinct()
             .withColumn("_in_vocab", F.lit(True)).hint("shuffle_hash"))
    toks = _fan_out(transcripts, "conv_id").select(
        "conv_id", "turn_idx",
        F.posexplode(F.split(clean_str("text"), " ")).alias("pos", "token"),
    )
    oov_tokens = (
        toks.select("token").distinct()
        .join(vocab, "token", "left")
        .filter(F.col("_in_vocab").isNull())
        .filter(~F.col("token").isin(*STOPWORDS))
        .filter(classify_literal("token") == "STRING")
        .filter(F.length("token") > 2)
        .select("token")
    )
    return toks.join(oov_tokens.hint("shuffle_hash"), "token")


def variant_a(oov, max_run=4, min_run=2):
    """The round-4 F.aggregate fold (replaced by variant C at HEAD)."""
    per_turn = oov.groupBy("conv_id", "turn_idx").agg(
        F.sort_array(F.collect_list(F.struct("pos", "token"))).alias("_tk"))
    empty_runs = F.expr(
        "CAST(array() AS array<struct<start:int,ntoken_span:int,toks:array<string>>>)")

    def fold(acc, e):
        runs_arr = acc["runs"]
        extend = e["pos"] == acc["last"] + 1
        lr = F.element_at(runs_arr, -1)
        upd = F.struct(
            lr["start"].alias("start"),
            (lr["ntoken_span"] + F.lit(1)).alias("ntoken_span"),
            F.concat(lr["toks"], F.array(e["token"])).alias("toks"))
        appended = F.concat(F.slice(runs_arr, 1, F.size(runs_arr) - 1), F.array(upd))
        fresh = F.concat(runs_arr, F.array(F.struct(
            (e["pos"] + 1).cast("int").alias("start"),
            F.lit(1).alias("ntoken_span"),
            F.array(e["token"]).alias("toks"))))
        return F.struct(
            F.when(extend, appended).otherwise(fresh).alias("runs"),
            e["pos"].alias("last"))

    init = F.struct(empty_runs.alias("runs"), F.lit(-100).alias("last"))
    runs = per_turn.select(
        "conv_id", "turn_idx",
        F.explode(F.aggregate("_tk", init, fold)["runs"]).alias("r"))
    return (
        runs.filter((F.col("r.ntoken_span") <= max_run)
                    & (F.col("r.ntoken_span") >= min_run))
        .select("conv_id", "turn_idx", "r.start", "r.ntoken_span",
                F.concat_ws(" ", "r.toks").alias("surface"))
    )


def variant_b(oov, max_run=4, min_run=2):
    """Pre-round-4: row_number window + group-by (two exchanges)."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("pos")
    return (
        oov.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy("conv_id", "turn_idx", "_grp")
        .agg(
            (F.min("pos") + 1).alias("start"),
            F.count("*").alias("ntoken_span"),
            F.concat_ws(" ", F.collect_list("token")).alias("surface"),
        )
        .filter((F.col("ntoken_span") <= max_run) & (F.col("ntoken_span") >= min_run))
        .drop("_grp")
    )


def variant_d(oov, max_run=4, min_run=2):
    """B + determinism: window + group-by (two exchanges, cheap exprs),
    surface built from SORTED (pos, token) structs — arrival order can
    no longer scramble the token order (B's measured 4N nondeterminism),
    and output types match A/C exactly."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("pos")
    return (
        oov.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy("conv_id", "turn_idx", "_grp")
        .agg(
            (F.min("pos") + 1).cast("int").alias("start"),
            F.count("*").cast("int").alias("ntoken_span"),
            F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda e: e["token"]), " ").alias("surface"),
        )
        .filter((F.col("ntoken_span") <= max_run) & (F.col("ntoken_span") >= min_run))
        .drop("_grp")
    )


def variant_c(oov, max_run=4, min_run=2):
    """Single exchange + cheap indexed lambdas: run key = pos - index
    over the sorted array; runs materialized by transform/filter (scalar
    comparisons only — no per-element array rebuilding)."""
    per_turn = oov.groupBy("conv_id", "turn_idx").agg(
        F.sort_array(F.collect_list(F.struct("pos", "token"))).alias("_tk"))
    runs = per_turn.select(
        "conv_id", "turn_idx",
        F.explode(F.expr("""
          transform(
            array_distinct(transform(_tk, (e, i) -> e.pos - i)),
            g -> named_struct(
              'start', filter(_tk, (e, i) -> e.pos - i = g)[0].pos + 1,
              'ntoken_span', size(filter(_tk, (e, i) -> e.pos - i = g)),
              'surface', array_join(transform(
                  filter(_tk, (e, i) -> e.pos - i = g), e -> e.token), ' ')))
        """)).alias("r"))
    return (
        runs.filter((F.col("r.ntoken_span") <= max_run)
                    & (F.col("r.ntoken_span") >= min_run))
        .select("conv_id", "turn_idx",
                F.col("r.start").cast("int").alias("start"),
                F.col("r.ntoken_span").alias("ntoken_span"),
                F.col("r.surface").alias("surface"))
    )


def main():
    n_exec = int(os.environ.get("AB_EXECUTORS", "1"))
    spark = get_spark(app_name="ab_oov",
                      master=f"local-cluster[{n_exec},4,{EXEC_MEM}]",
                      shuffle_partitions=80,
                      extra_conf={"spark.executor.memory": f"{EXEC_MEM}m"})
    kg = build_kg(seed=42, n_people=4000, n_orgs=1200, n_locs=600, n_films=2500)
    dfs = kg_dataframes(spark, kg)
    tr = build_transcripts(kg, seed=43, n_convs=CONVS, turns_per_conv=(10, 20))
    dfs.update(transcript_dataframes(spark, *tr))
    tmp = tempfile.mkdtemp()
    dfs["transcripts"].repartition(4).write.parquet(tmp + "/t")
    transcripts = spark.read.parquet(tmp + "/t")
    idx = build_index_artifacts(spark, dfs["kg_items"], fuzzy=True,
                                limit_per_token=100, n_buckets=32, reuse=False)
    spark.range(10000).groupBy(F.col("id") % 7).count().collect()

    def run(variant):
        df = variant(build_oov(spark, transcripts, idx))
        t0 = time.time()
        row = df.agg(
            F.count("*").alias("n"),
            # bit_xor: order-independent and overflow-free (ANSI mode)
            F.expr("bit_xor(xxhash64(conv_id, turn_idx, start, "
                   "ntoken_span, surface))").alias("h"),
        ).collect()[0]
        return time.time() - t0, row["n"], row["h"]

    results = {k: [] for k in os.environ.get("AB_VARIANTS", "ABC")}
    sig = {}
    for rep in range(REPEATS):
        all_variants = {"A": variant_a, "B": variant_b, "C": variant_c,
                        "D": variant_d}
        wanted = os.environ.get("AB_VARIANTS", "ABC")
        for name, fn in ((k, all_variants[k]) for k in wanted):
            sec, n, h = run(fn)
            results[name].append(round(sec, 1))
            sig.setdefault(name, (n, h))
            print(f"rep{rep} {name}: {sec:.1f}s n={n} hash={h}", flush=True)
    # B is EXPECTED to disagree (nondeterministic surface order +
    # bigint ntoken) — assert only the deterministic variants agree
    det = {k: v for k, v in sig.items() if k != "B"}
    assert len(set(det.values())) <= 1, f"variants disagree: {det}"
    print({k: {"best": min(v), "all": v} for k, v in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
