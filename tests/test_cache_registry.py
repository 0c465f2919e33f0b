"""CacheScope: pipeline-scoped cache lifecycle (round-5 verdict item —
service-style repeated calls must not accumulate cached frames)."""

import pytest
from pyspark.sql import functions as F

from lamapi_spark.pipeline.cache_registry import CacheScope, scoped_cache


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_scope_unpersists_on_exit(spark):
    spark.catalog.clearCache()
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    with CacheScope():
        c = scoped_cache(df.groupBy("k").agg(F.count("*").alias("n")))
        assert c.count() == 7          # materialize the cache
        assert not _cache_manager_empty(spark)
    assert _cache_manager_empty(spark)


def test_no_scope_keeps_batch_semantics(spark):
    spark.catalog.clearCache()
    df = scoped_cache(spark.range(100).select((F.col("id") % 3).alias("k")))
    df.count()
    # no active scope: cache persists (classic cache-and-leave lifecycle)
    assert not _cache_manager_empty(spark)
    df.unpersist()
    assert _cache_manager_empty(spark)


def test_nested_scopes_each_release_their_own(spark):
    spark.catalog.clearCache()
    base = spark.range(500)
    with CacheScope():
        outer = scoped_cache(base.select((F.col("id") % 5).alias("a")))
        outer.count()
        with CacheScope():
            inner = scoped_cache(base.select((F.col("id") % 11).alias("b")))
            inner.count()
        # inner scope released its frame; outer frame still cached
        assert any(
            r.storageLevel.useMemory
            for r in [outer]
        )
        assert not _cache_manager_empty(spark)
    assert _cache_manager_empty(spark)


def test_entity_salience_scope_releases_tf(spark):
    spark.catalog.clearCache()
    from lamapi_spark.pipeline.salience import entity_salience
    occ = spark.createDataFrame(
        [("c1", "e1"), ("c1", "e1"), ("c1", "e2"), ("c2", "e2"), ("c2", "e3")],
        "conv_id string, entity string")
    with CacheScope():
        out = entity_salience(occ, top_k=2)
        rows = out.collect()
        assert rows, "salience produced no rows"
        assert not _cache_manager_empty(spark), "tf aggregate should be cached in-scope"
    assert _cache_manager_empty(spark), "tf aggregate must unpersist on scope exit"


def test_pipeline_scope_releases_all_caches(spark):
    """The service wrapper contract: run the full KG pipeline inside a
    scope, consume the result, exit -> zero cached frames remain."""
    spark.catalog.clearCache()
    from lamapi_spark.pipeline.fixtures import (
        build_kg, build_transcripts, kg_dataframes, transcript_dataframes)
    from lamapi_spark.pipeline.run import run_pipeline
    kg = build_kg(seed=42, n_people=40, n_orgs=12, n_locs=6, n_films=25)
    dfs = kg_dataframes(spark, kg)
    tr = build_transcripts(kg, seed=43, n_convs=30, turns_per_conv=(4, 8))
    dfs.update(transcript_dataframes(spark, *tr))
    with CacheScope():
        out = run_pipeline(spark, dfs["transcripts"], dfs["kg_items"],
                           dfs["kg_edges"], dfs["kg_sameas"], fuzzy=True,
                           use_index_artifacts=False)
        n = out["triples"].count()
        assert n >= 0
        assert not _cache_manager_empty(spark)
    assert _cache_manager_empty(spark)
