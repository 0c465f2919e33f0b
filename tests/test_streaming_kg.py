"""The streaming KG twin (streaming/kg.py) emits the same linked
mentions and the same triples as the batch pipeline (exact arm)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lamapi_spark.operators.label_dict import build_label_dict
from lamapi_spark.pipeline.fixtures import (
    build_kg, build_transcripts, kg_dataframes, transcript_dataframes,
)
from lamapi_spark.pipeline.run import run_pipeline
from lamapi_spark.streaming.kg import (
    build_link_index, stream_extract_triples, stream_link_mentions,
)
from lamapi_spark.streaming.sessions import run_available_now

SENTINEL_CONV = "conv-flush"


@pytest.fixture(scope="module")
def kg_stream(spark, tmp_path_factory):
    kg = build_kg(seed=31, n_people=25, n_orgs=10, n_locs=6, n_films=15)
    dfs = kg_dataframes(spark, kg)
    tr = build_transcripts(kg, seed=32, n_convs=30, turns_per_conv=(3, 6))
    transcripts = transcript_dataframes(spark, *tr)["transcripts"]

    d = tmp_path_factory.mktemp("kg_stream") / "turns"
    # several input files so availableNow + maxFilesPerTrigger yields
    # multiple micro-batches (the watermark advances between batches).
    # repartition(6) scatters turns across files REGARDLESS of event
    # time, so later micro-batches carry timestamps far older than
    # earlier ones — the fixture's conversations span ~30 days, and the
    # test watermark below must exceed that span or genuinely-late rows
    # are (correctly) dropped and the batch-equivalence check fails.
    transcripts.repartition(6).write.parquet(str(d))
    # sentinel turn far in the future, written LAST (separate file):
    # closes every real turn's group under the 10-minute watermark so
    # append mode emits them. Its text matches nothing.
    flush = spark.createDataFrame(
        [(SENTINEL_CONV, 0, "user", "zzz qqq xxx", None,
          dt.datetime(2027, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    flush.coalesce(1).write.mode("append").parquet(str(d))

    label_dict = build_label_dict(dfs["kg_items"]).cache()
    link_index = build_link_index(label_dict).cache()
    batch = run_pipeline(
        spark, transcripts, dfs["kg_items"], dfs["kg_edges"],
        kg_sameas=None, fuzzy=False, use_index_artifacts=False)
    return {
        "dir": str(d), "dfs": dfs, "link_index": link_index,
        "batch": batch, "transcripts": transcripts,
    }


def _drain(df, name):
    got = run_available_now(df, name, mode="append")
    return got.filter(F.col("conv_id") != SENTINEL_CONV)


def test_stream_mentions_match_batch(spark, kg_stream):
    got = _drain(
        stream_link_mentions(
            spark, kg_stream["dir"], kg_stream["link_index"],
            watermark="90 days", max_files_per_trigger=2),
        "t_kg_mentions",
    ).select("conv_id", "turn_idx", "start", "ntoken_span", "surface",
             "entity", "nil").collect()
    stream_rows = {tuple(r) for r in got}

    # batch twin: linked rows restricted to dictionary-matched spans
    # (the streaming exact arm has no OOV/NIL-id feed)
    b = kg_stream["batch"]
    keys = ["conv_id", "turn_idx", "start", "ntoken_span", "surface"]
    batch_rows = {
        tuple(r) for r in
        b["linked"].join(b["mentions"].select(*keys).distinct(), keys)
        .select("conv_id", "turn_idx", "start", "ntoken_span", "surface",
                "entity", "nil").collect()
    }
    assert len(stream_rows) > 50
    assert stream_rows == batch_rows


def test_stream_triples_match_batch(spark, kg_stream):
    got = _drain(
        stream_extract_triples(
            spark, kg_stream["dir"], kg_stream["link_index"],
            kg_stream["dfs"]["kg_edges"], watermark="90 days",
            max_files_per_trigger=2),
        "t_kg_triples",
    ).select("subj", "pred", "obj", "conv_id", "turn_idx").collect()
    stream_triples = {tuple(r) for r in got}
    # per-turn pair distinctness: the array pass already dedupes
    assert len(stream_triples) == len(got)

    batch_triples = {tuple(r) for r in kg_stream["batch"]["triples"]
                     .select("subj", "pred", "obj", "conv_id", "turn_idx")
                     .collect()}
    assert len(stream_triples) > 20
    assert stream_triples == batch_triples


def test_link_index_is_the_batch_decision(spark, kg_stream):
    """Every dictionary name links to itself-as-surface exactly as the
    batch argmax would: re-deriving the decision through the full batch
    lookup for a sample of names gives identical (entity, score)."""
    from lamapi_spark.operators.lookup import (
        _prepare_mentions, best_links, token_match,
    )
    label_dict = build_label_dict(kg_stream["dfs"]["kg_items"])
    sample = (label_dict.select("name_norm").distinct()
              .orderBy("name_norm").limit(40))
    prepared = _prepare_mentions(
        sample.select(F.col("name_norm").alias("mention")), "mention")
    slim = token_match(prepared, label_dict, fuzzy=False, slim=True)
    best = {(r.mention_norm, r.id, round(r.link_score, 9))
            for r in best_links(slim, prepared, label_dict).collect()}
    idx = {(r.name_norm, r.entity, round(r.link_score, 9))
           for r in kg_stream["link_index"]
           .join(sample, "name_norm").collect()}
    assert best == idx and len(idx) == 40


def test_stream_triples_to_graph_exactly_once(spark, kg_stream, tmp_path):
    """foreachBatch materialization: two invocations over a growing
    input directory; the second resumes from the checkpoint (only new
    files), and the union equals the batch exact-arm triples over ALL
    input — no duplicates. Wave-2 event times sit ahead of wave 1's
    sentinel because the watermark persists in the checkpoint."""
    from lamapi_spark.streaming.kg import stream_triples_to_graph

    d = str(tmp_path / "turns")
    out = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")
    dfs = kg_stream["dfs"]
    tr = kg_stream["transcripts"]
    convs = sorted(r.conv_id for r in tr.select("conv_id").distinct().collect())
    w1, w2 = set(convs[:20]), set(convs[20:])

    # wave 1 + flush sentinel (2027); wave 2 shifted to 2028 + sentinel
    # 2029 — each wave's sentinel closes that wave's turns
    tr.filter(F.col("conv_id").isin(w1)).repartition(3).write.parquet(d)
    flush1 = spark.createDataFrame(
        [(SENTINEL_CONV, 0, "user", "zzz", None, dt.datetime(2027, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    flush1.coalesce(1).write.mode("append").parquet(d)

    def _read(df):
        return {tuple(r) for r in
                df.filter(F.col("conv_id") != SENTINEL_CONV)
                .select("subj", "pred", "obj", "conv_id", "turn_idx")
                .collect()}

    args = (spark, d, kg_stream["link_index"], dfs["kg_edges"], out, ckpt)
    got1 = _read(stream_triples_to_graph(*args, watermark="90 days",
                                         max_files_per_trigger=2))

    shifted = tr.filter(F.col("conv_id").isin(w2)).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 730 DAYS"))
    shifted.repartition(2).write.mode("append").parquet(d)
    flush2 = spark.createDataFrame(
        [(SENTINEL_CONV + "-2", 0, "user", "zzz", None,
          dt.datetime(2029, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    flush2.coalesce(1).write.mode("append").parquet(d)

    got2 = _read(stream_triples_to_graph(*args, watermark="90 days",
                                         max_files_per_trigger=2)
                 .filter(F.col("conv_id") != SENTINEL_CONV + "-2"))

    batch = kg_stream["batch"]
    want = {tuple(r) for r in batch["triples"]
            .select("subj", "pred", "obj", "conv_id", "turn_idx").collect()}
    want1 = {t for t in want if t[3] in w1}
    assert got1 == want1 and len(got1) > 5
    assert got2 == want, (len(got2), len(want))
