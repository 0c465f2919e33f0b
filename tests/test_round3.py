"""Round-3 additions: index-artifact build-param persistence, the
artifact-path mention join without driver round-trips, image near-dup
pairing, and the streaming dedup twin."""

from __future__ import annotations

import pytest

from lamapi_spark.operators.indexes import LookupIndex
from lamapi_spark.operators.label_dict import build_label_dict
from lamapi_spark.pipeline.fixtures import build_kg, kg_dataframes


@pytest.fixture(scope="module")
def small_kg(spark):
    kg = build_kg(seed=31, n_people=25, n_orgs=10, n_locs=6, n_films=15)
    dfs = kg_dataframes(spark, kg)
    dfs["label_dict"] = build_label_dict(dfs["kg_items"]).cache()
    return dfs


# ----------------------------------------------- index build-param sidecar


def test_index_meta_roundtrip_and_validation(spark, small_kg):
    """Build params persist in the <prefix>_meta sidecar: load() recovers
    them without arguments, validates explicit arguments against them,
    and exists() treats a parameter mismatch as 'no usable artifact'."""
    LookupIndex.write(small_kg["label_dict"], prefix="t_r3_meta",
                      n_buckets=2, fuzzy=True, limit_per_token=7,
                      fuzzy_edits=1)

    idx = LookupIndex.load(spark, "t_r3_meta")  # no args: meta drives
    assert idx.bucketed
    assert idx.limit_per_token == 7
    assert idx.fuzzy_edits == 1
    assert idx.n_buckets == 2
    assert idx.fuzzy is not None and idx.fuzzy_names is not None

    # matching explicit params load fine
    LookupIndex.load(spark, "t_r3_meta", fuzzy=True, limit_per_token=7,
                     fuzzy_edits=1)
    # mismatched params raise instead of silently dropping recall guards
    with pytest.raises(ValueError, match="different parameters"):
        LookupIndex.load(spark, "t_r3_meta", limit_per_token=50)
    with pytest.raises(ValueError, match="different parameters"):
        LookupIndex.load(spark, "t_r3_meta", fuzzy=False)
    with pytest.raises(ValueError, match="different parameters"):
        LookupIndex.load(spark, "t_r3_meta", fuzzy_edits=2)

    # exists() is parameter-aware, so reuse logic rebuilds on mismatch
    assert LookupIndex.exists(spark, "t_r3_meta")
    assert LookupIndex.exists(spark, "t_r3_meta", limit_per_token=7)
    assert not LookupIndex.exists(spark, "t_r3_meta", limit_per_token=100)
    assert not LookupIndex.exists(spark, "t_r3_meta", fuzzy=False)
    assert not LookupIndex.exists(spark, "t_r3_absent")


def test_index_unpruned_meta_none_limit(spark, small_kg):
    """limit_per_token=None (unpruned) round-trips through the sidecar —
    the consumer must NOT re-apply the exact-name guards for it."""
    LookupIndex.write(small_kg["label_dict"], prefix="t_r3_meta_np",
                      n_buckets=2, fuzzy=False, limit_per_token=None)
    idx = LookupIndex.load(spark, "t_r3_meta_np")
    assert idx.limit_per_token is None
    assert idx.fuzzy is None
    assert LookupIndex.exists(spark, "t_r3_meta_np", limit_per_token=None)
    assert not LookupIndex.exists(spark, "t_r3_meta_np", limit_per_token=5)
