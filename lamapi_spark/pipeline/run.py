"""End-to-end KG-construction pipeline runner.

transcripts ──detect──> mention spans (exact + fuzzy + OOV)
            ──lookup──> candidates per distinct surface (19-field parity)
            ──link────> (span, entity) with NIL handling
            ──pairs/probe──> provenance triples
            ──canonicalize──> final triples + canonical map

Every stage checkpoints through StageRunner (resume-from-failure). The
dictionary is built once from kg_items; at production scale the
dictionary, token index, and fuzzy indexes are offline artifacts, which
the checkpointing mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import time

from lamapi_spark.operators.indexes import LookupIndex
from lamapi_spark.operators.label_dict import build_label_dict
from lamapi_spark.pipeline.canonicalize import canonical_map, canonicalize_triples
from lamapi_spark.pipeline.checkpoint import StageRunner
from lamapi_spark.pipeline.linking import candidates_for_surfaces, link_mentions
from lamapi_spark.pipeline.mentions import detect_mentions, detect_oov_mentions
from lamapi_spark.pipeline.triples import extract_triples


def build_index_artifacts(
    spark: SparkSession,
    kg_items: DataFrame,
    fuzzy: bool = True,
    limit_per_token: int | None = 100,
    fuzzy_edits: int = 1,
    n_buckets: int | None = None,
    prefix: str = "lamapi_idx",
    reuse: bool = True,
    validate_source: bool = True,
) -> LookupIndex:
    """The OFFLINE index build (the elastic_indexing.py analogue): label
    dictionary -> four bucketed, sorted, pre-pruned saved tables. Run it
    once per dictionary snapshot; every pipeline run then probes the
    artifacts with no dictionary-side shuffle/broadcast. ``reuse=True``
    loads existing tables instead of rebuilding; the returned index's
    ``reused`` flag records which happened."""
    # Reuse only an artifact that is COMPATIBLE on two axes, both
    # validated against the persisted _meta sidecar:
    # - build PARAMETERS (silently probing an artifact pruned with a
    #   different K would drop the exact-name/1-edit recall guards);
    # - the dictionary SNAPSHOT: a cheap order-independent fingerprint
    #   of kg_items (count + bit_xor(xxhash64(entity, popularity)) — one
    #   scalar aggregation, trivially parallel). Without this, a caller
    #   handing a DIFFERENT kg_items frame under the default prefix
    #   would silently link against the stale dictionary. Snapshot-
    #   managed deployments (fresh prefix per dictionary version) can
    #   skip the validation scan with ``validate_source=False``; label
    #   edits that keep (entity, popularity) identical elude the fast
    #   fingerprint — version the prefix for those.
    source_fp = None
    if validate_source:
        r = kg_items.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(entity, popularity))").alias("h")).head()
        source_fp = f"{r['n']}:{r['h']}"
    if reuse and LookupIndex.exists(spark, prefix, fuzzy=fuzzy,
                                    limit_per_token=limit_per_token,
                                    fuzzy_edits=fuzzy_edits,
                                    source_fp=source_fp):
        idx = LookupIndex.load(spark, prefix)
        idx.reused = True
        return idx
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    label_dict = build_label_dict(kg_items)
    return LookupIndex.write(
        label_dict, prefix=prefix, n_buckets=n_buckets, fuzzy=fuzzy,
        limit_per_token=limit_per_token, fuzzy_edits=fuzzy_edits,
        source_fp=source_fp)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    kg_items: DataFrame,
    kg_edges: DataFrame,
    kg_sameas: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    fuzzy: bool = True,
    nil_threshold: float = 1.0,
    max_ntoken: int = 4,
    broadcast_dict: bool = True,
    broadcast_edges: bool = True,
    limit_per_token: int | None = 100,
    index: LookupIndex | None = None,
    use_index_artifacts: bool = True,
    index_prefix: str = "lamapi_idx",
    candidate_limit: int = 100,
) -> dict[str, DataFrame]:
    """``use_index_artifacts`` defaults to True: the bucketed-artifact
    plan is the plan users get (oracle-gated, bench-measured — the one a
    non-broadcastable dictionary must run); pass False for the explicit
    small-job broadcast opt-out. The artifact PREFIX names a dictionary
    snapshot — like the reference's named ES index — and reuse validates
    BOTH the build parameters and a fingerprint of the kg_items snapshot
    against the ``_meta`` sidecar (build_index_artifacts), so a changed
    dictionary under the same prefix rebuilds instead of silently
    linking against the stale index."""
    runner = StageRunner(spark, checkpoint_dir or "", enabled=checkpoint_dir is not None)
    fp = (f"fuzzy={fuzzy};nil={nil_threshold};k={max_ntoken};"
          f"lpt={limit_per_token};cl={candidate_limit}")

    if index is None and use_index_artifacts:
        t0 = time.time()
        index = build_index_artifacts(
            spark, kg_items, fuzzy=fuzzy, limit_per_token=limit_per_token,
            prefix=index_prefix)
        runner.metrics.append({
            "stage": "index_artifacts", "rows_out": None, "partitions": None,
            "duration_s": round(time.time() - t0, 3), "fingerprint": fp,
            "inputs": ["kg_items"], "resumed": index.reused})

    # Independent stages overlap from a small thread pool (guide §2.6):
    # Spark happily runs several jobs at once inside one application —
    # the serial stage chain was leaving the executor pool idle through
    # every stage's task tail. canonical_map depends only on kg_sameas;
    # mentions/oov_mentions share no dependency with each other; and on
    # the BUCKETED-index path they never touch label_dict at all (the
    # span/vocab joins probe the saved artifact tables), so label_dict
    # itself joins the overlapped block there. Job descriptions are
    # thread-local so per-stage attribution in the event log is
    # unchanged, and each stage still checkpoints to its own directory
    # (resume semantics untouched).
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=4)
    try:
        return _run_pipeline_stages(
            spark, runner, pool, fp, transcripts, kg_items, kg_edges,
            kg_sameas, index, fuzzy, nil_threshold, max_ntoken,
            broadcast_dict, broadcast_edges, limit_per_token,
            candidate_limit)
    finally:
        pool.shutdown(wait=True)


def _run_pipeline_stages(spark, runner, pool, fp, transcripts, kg_items,
                         kg_edges, kg_sameas, index, fuzzy,
                         nil_threshold, max_ntoken, broadcast_dict,
                         broadcast_edges, limit_per_token, candidate_limit):
    from lamapi_spark.pipeline.cache_registry import scoped_cache

    f_cmap = None
    if kg_sameas is not None:
        f_cmap = pool.submit(
            runner.run, "canonical_map",
            lambda: canonical_map(kg_sameas), fp, ("kg_sameas",))

    # cache: the dictionary feeds the token/variant indexes (non-artifact
    # path), the candidate payload join and the ids-backfill arm — one
    # materialization, many consumers (on a cluster the indexes are the
    # offline artifacts above; the payload stays a plain table)
    def _label_dict_stage():
        return runner.run(
            "label_dict", lambda: build_label_dict(kg_items), fp,
            ("kg_items",))

    bucketed = index is not None and index.bucketed
    if bucketed:
        # mentions/oov probe the artifact tables — label_dict overlaps
        # with them instead of heading the serial chain. detect_mentions
        # ignores its label_dict argument whenever an index is present;
        # detect_oov_mentions does so for a BUCKETED index.
        f_ld = pool.submit(_label_dict_stage)
        f_mentions = pool.submit(
            runner.run, "mentions",
            lambda: detect_mentions(transcripts, None, max_ntoken, fuzzy,
                                    broadcast_dict, index=index),
            fp, ("transcripts", "label_dict"))
        f_oov = pool.submit(
            runner.run, "oov_mentions",
            lambda: detect_oov_mentions(transcripts, None,
                                        broadcast_dict=broadcast_dict,
                                        index=index),
            fp, ("transcripts", "label_dict"))
        label_dict = scoped_cache(f_ld.result())
    else:
        label_dict = scoped_cache(_label_dict_stage())
        f_mentions = pool.submit(
            runner.run, "mentions",
            lambda: detect_mentions(transcripts, label_dict, max_ntoken,
                                    fuzzy, broadcast_dict, index=index),
            fp, ("transcripts", "label_dict"))
        f_oov = pool.submit(
            runner.run, "oov_mentions",
            lambda: detect_oov_mentions(transcripts, label_dict,
                                        broadcast_dict=broadcast_dict,
                                        index=index),
            fp, ("transcripts", "label_dict"))
    mentions = f_mentions.result()
    oov = f_oov.result()

    all_spans = mentions.select(
        "conv_id", "turn_idx", "start", "ntoken_span", "surface",
    ).unionByName(oov.select(
        "conv_id", "turn_idx", "start", "ntoken_span", "surface"))

    # the distinct-surface frame is read several times inside lookup
    # (exact arm, fuzzy arm, two feature joins) — cache it
    surfaces = scoped_cache(all_spans.select("surface").distinct())

    # ONE narrow match pass (cached) feeds both consumers:
    # - the response-parity candidates artifact (19 fields, truncated at
    #   candidate_limit — lookup() itself defaults to the reference's
    #   limit=1000; the pipeline artifact defaults to 100 because LINKING
    #   NO LONGER DEPENDS ON IT: best_links takes the argmax over the
    #   FULL un-truncated match, so shrinking the artifact costs nothing
    #   in link quality and cuts the heaviest stage's build+write ~3x);
    # - best_links, the exact per-surface linking decision.
    from lamapi_spark.operators.lookup import _prepare_mentions, best_links, token_match
    prepared = _prepare_mentions(
        surfaces.select(F.col("surface").alias("mention")), "mention")
    slim = token_match(prepared, label_dict, broadcast_dict, fuzzy=fuzzy,
                       cache_narrow=True, limit_per_token=limit_per_token,
                       fuzzy_edits=1, index=index, slim=True)

    # materialize the shared slim-match cache ONCE before the two
    # consumers fan out, so the concurrent candidates/linked stages read
    # the cached frame instead of racing to compute it (only when
    # checkpointing: the checkpoint-less path stays fully lazy)
    if runner.enabled:
        slim.count()
    f_candidates = pool.submit(
        runner.run, "candidates",
        lambda: candidates_for_surfaces(
            surfaces,
            label_dict, kg_items, fuzzy=fuzzy, broadcast_dict=broadcast_dict,
            limit=candidate_limit,
            limit_per_token=limit_per_token, index=index,
            prepared=prepared, match=slim),
        fp, ("mentions", "oov_mentions", "label_dict", "kg_items"))

    # with a bucketed index the dictionary is presumed non-broadcastable:
    # best_links then derives its name-set frame from the bucketed names
    # artifact (shuffle-free dictionary side) and never ships it — or the
    # per-mention max frame — through the driver; same policy as the
    # mention joins above
    linked = runner.run(
        "linked",
        lambda: link_mentions(
            all_spans, nil_threshold=nil_threshold,
            best=best_links(slim, prepared, label_dict, broadcast_dict,
                            index=index)),
        fp, ("mentions", "candidates"))
    candidates = f_candidates.result()

    triples_raw = runner.run(
        "triples_raw",
        lambda: extract_triples(linked, kg_edges, broadcast_edges),
        fp, ("linked", "kg_edges"))

    if kg_sameas is not None:
        cmap = f_cmap.result()
        triples = runner.run(
            "triples",
            lambda: canonicalize_triples(triples_raw, cmap), fp,
            ("triples_raw", "canonical_map"))
    else:
        cmap = spark.createDataFrame([], "raw_entity string, canonical_entity string")
        triples = triples_raw

    return {
        "label_dict": label_dict,
        "mentions": mentions,
        "oov_mentions": oov,
        "candidates": candidates,
        "linked": linked,
        "triples": triples.select("subj", "pred", "obj", "conv_id", "turn_idx"),
        "canonical_map": cmap,
        "metrics": runner.metrics,
    }


def triple_prf(triples: DataFrame, truth: DataFrame) -> dict[str, float]:
    """Set-level precision/recall/F1 of (conv_id, turn_idx, subj, pred, obj)."""
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    got = triples.select(*keys).distinct()
    want = truth.select(*keys).distinct()
    tp = got.join(want, keys, "inner").count()
    n_got, n_want = got.count(), want.count()
    p = tp / n_got if n_got else 0.0
    r = tp / n_want if n_want else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "tp": tp, "n_pred": n_got, "n_truth": n_want}
