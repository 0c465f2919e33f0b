"""Round-6 regression: artifact writes must be idempotent against a
STALE warehouse location — a directory left by a previous process whose
metastore entry is gone (the driver runs each round with a fresh
in-memory catalog over a persistent ``cwd/spark-warehouse``, so round
N+1 sees round N's dirs with no catalog entries; ``saveAsTable`` then
fails with LOCATION_ALREADY_EXISTS — CORRECTNESS_r05
``lookup_candidates_delta``). The writer now drops orphaned locations
first, mirroring the reference's delete-then-create index rebuild
(scripts/elastic_indexing.py)."""

from __future__ import annotations

import os
from urllib.parse import urlparse

import pytest

from lamapi_spark.operators.indexes import LookupIndex
from lamapi_spark.operators.label_dict import build_label_dict
from lamapi_spark.operators.warehouse import clean_stale_location
from lamapi_spark.pipeline.fixtures import build_kg, kg_dataframes


@pytest.fixture(scope="module")
def label_dict(spark):
    kg = build_kg(seed=61, n_people=20, n_orgs=8, n_locs=5, n_films=10)
    dfs = kg_dataframes(spark, kg)
    return build_label_dict(dfs["kg_items"]).cache()


def _warehouse_path(spark) -> str:
    loc = spark.catalog.getDatabase(spark.catalog.currentDatabase()).locationUri
    p = urlparse(loc)
    return p.path if p.scheme in ("file", "") else loc


def _plant_orphan_dirs(spark, prefix: str) -> list[str]:
    """Create the exact state the driver's persistent cwd warehouse
    leaves behind: location dirs present, catalog ignorant of them."""
    wh = _warehouse_path(spark)
    made = []
    for t in ("token", "names", "payload", "fuzzy", "fuzzy_names",
              "meta", "delta"):
        d = os.path.join(wh, f"{prefix}_{t}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-stale.parquet"), "wb") as f:
            f.write(b"stale bytes from a previous round")
        made.append(d)
        assert not spark.catalog.tableExists(f"{prefix}_{t}")
    return made


def test_write_recovers_from_stale_warehouse_dirs(spark, label_dict):
    prefix = "t_r6_stale_idx"
    _plant_orphan_dirs(spark, prefix)
    # pre-fix: LOCATION_ALREADY_EXISTS on the first saveAsTable
    idx = LookupIndex.write(label_dict, prefix=prefix, n_buckets=2,
                            fuzzy=True, limit_per_token=10, fuzzy_edits=1)
    n_first = idx.token.count()
    assert idx.bucketed and n_first > 0
    # the stale junk is gone, replaced by real table data
    assert LookupIndex.exists(spark, prefix)
    # write is repeatable against its OWN previous output too (the frame
    # must be re-loaded: overwrite invalidates the old file listing)
    idx2 = LookupIndex.write(label_dict, prefix=prefix, n_buckets=2,
                             fuzzy=True, limit_per_token=10, fuzzy_edits=1)
    assert idx2.token.count() == n_first


def test_write_delta_recovers_from_stale_dir(spark, label_dict):
    prefix = "t_r6_stale_delta"
    _plant_orphan_dirs(spark, prefix)
    LookupIndex.write_delta(label_dict.limit(3), prefix=prefix)
    assert LookupIndex.load_delta(spark, prefix).count() == 3
    # append semantics preserved once the table exists
    LookupIndex.write_delta(label_dict.limit(2), prefix=prefix)
    assert LookupIndex.load_delta(spark, prefix).count() == 5
    LookupIndex.drop_delta(spark, prefix)


def test_clean_stale_location_leaves_live_tables_alone(spark, label_dict):
    """When the catalog DOES know the table, the cleaner must not touch
    it — errorifexists/append semantics stay intact."""
    prefix = "t_r6_live_idx"
    LookupIndex.write(label_dict, prefix=prefix, n_buckets=2, fuzzy=False,
                      limit_per_token=None, fuzzy_edits=1)
    before = spark.table(f"{prefix}_token").count()
    clean_stale_location(spark, f"{prefix}_token")
    assert spark.table(f"{prefix}_token").count() == before


def test_ivf_write_recovers_from_stale_warehouse_dirs(spark):
    from lamapi_spark.ops.similarity import IvfIndex

    wh = _warehouse_path(spark)
    prefix = "t_r6_stale_ivf"
    for t in ("inv", "centroids", "meta"):
        d = os.path.join(wh, f"{prefix}_{t}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "junk"), "wb") as f:
            f.write(b"stale")
    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)])
            for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    idx = IvfIndex.write(corpus, prefix=prefix, n_cells=2, n_buckets=2)
    assert idx.n_vecs == 40


# ---------------------------------------------------------------- fuzz
# VERDICT r05 item 5: property-fuzz the artifact lifecycle the way the
# codecs were fuzzed — random operation sequences x random corruption of
# the environment between steps (orphaned location dirs with no catalog
# entry, i.e. the fresh-metastore/persistent-warehouse driver state;
# partial orphan sets; repeated writes). Spark sessions are expensive,
# so the fuzz drives randomized SEQUENCES inside one session rather
# than hypothesis-shrinkable atoms: each failure prints its seed/trace.

import random

_OPS = ("write", "load", "exists", "write_delta", "load_delta",
        "drop_delta", "orphan_some", "orphan_all")


def _simulate_fresh_metastore(spark, prefix):
    """Turn every live table of ``prefix`` into the driver's stale
    state: location dirs present, catalog ignorant. Copy the managed
    dirs aside, drop the tables (which deletes the originals), then
    restore the dirs."""
    import shutil
    wh = _warehouse_path(spark)
    saved = []
    for t in ("token", "names", "payload", "fuzzy", "fuzzy_names",
              "meta", "delta"):
        name = f"{prefix}_{t}"
        d = os.path.join(wh, name)
        if spark.catalog.tableExists(name) and os.path.isdir(d):
            shutil.copytree(d, d + ".keep")
            spark.sql(f"DROP TABLE {name}")
            os.rename(d + ".keep", d)
            saved.append(name)
    return saved


def test_fuzz_artifact_lifecycle(spark, label_dict):
    rng = random.Random(606)
    prefix = "t_r6_fuzz_idx"
    delta_rows = 0
    wrote = False
    from lamapi_spark.operators.indexes import LookupIndex as LI
    for step in range(40):
        op = rng.choice(_OPS)
        try:
            if op == "write":
                idx = LI.write(label_dict, prefix=prefix, n_buckets=2,
                               fuzzy=rng.random() < 0.5,
                               limit_per_token=rng.choice([None, 5]))
                assert idx.token.count() > 0
                wrote = True
            elif op == "load":
                if LI.exists(spark, prefix):
                    idx = LI.load(spark, prefix)
                    assert idx.names.count() > 0
            elif op == "exists":
                LI.exists(spark, prefix)
            elif op == "write_delta":
                LI.write_delta(label_dict.limit(2), prefix=prefix)
                delta_rows += 2
            elif op == "load_delta":
                d = LI.load_delta(spark, prefix)
                if delta_rows and d is not None:
                    assert d.count() == delta_rows
            elif op == "drop_delta":
                LI.drop_delta(spark, prefix)
                delta_rows = 0
            elif op == "orphan_some":
                # one orphan dir for a table that may or may not exist
                wh = _warehouse_path(spark)
                t = rng.choice(("token", "names", "meta", "delta"))
                name = f"{prefix}_{t}"
                if not spark.catalog.tableExists(name):
                    os.makedirs(os.path.join(wh, name), exist_ok=True)
                    with open(os.path.join(wh, name, "junk"), "wb") as f:
                        f.write(b"stale")
            elif op == "orphan_all" and wrote:
                dropped = _simulate_fresh_metastore(spark, prefix)
                if any(d.endswith("_delta") for d in dropped):
                    delta_rows = 0  # catalog forgot the delta table
        except Exception as e:  # pragma: no cover - fuzz failure detail
            raise AssertionError(
                f"lifecycle fuzz failed at step {step} op={op}: {e}"
            ) from e
