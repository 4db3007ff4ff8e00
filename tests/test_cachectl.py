"""The library-consumer cache seam: after any catalog query runs inside
``bounded_plan_cache``, the session carries NO net persisted blocks — while
the user's own pre-existing caches survive untouched (the property
``spark.catalog.clearCache()`` cannot give an embedding application)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nba_data_pipeline_spark.cachectl import (
    bounded_plan_cache,
    persistent_rdd_ids,
    run_query,
)

SF_DIR = "/root/testdata/sf0.001"

# One entry per plan-internal storage style: shingle-set persist (dedup),
# contracted-edge persist + per-round localCheckpoint (graph), chained
# totalorder localCheckpoints (stats), kmeans iteration persists (ann).
PERSISTING_ENTRIES = [
    "d5_minhash_lsh_pairs",
    "g2_triangle_count",
    "a43_rfm_segmentation",
    "sim_kmeans_train",
]


def test_run_query_leaves_no_net_blocks(spark):
    spark.catalog.clearCache()
    base = persistent_rdd_ids(spark)
    for name in PERSISTING_ENTRIES:
        rows = run_query(spark, SF_DIR, name)
        assert rows  # the entry actually produced output
        leaked = persistent_rdd_ids(spark) - base
        assert not leaked, f"{name} leaked persistent RDDs: {leaked}"


def test_user_cache_survives_release(spark):
    spark.catalog.clearCache()
    user_df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).persist()
    assert user_df.count() == 1000  # materialize
    user_ids = persistent_rdd_ids(spark)
    assert user_ids, "user cache should be registered"

    rows = run_query(spark, SF_DIR, "d5_minhash_lsh_pairs")
    assert rows is not None
    after = persistent_rdd_ids(spark)
    assert after == user_ids, "release must not touch pre-existing blocks"
    # and the user's cache is still usable
    assert user_df.count() == 1000
    user_df.unpersist(True)


def test_scope_releases_explicit_persist_and_checkpoint(spark):
    spark.catalog.clearCache()
    base = persistent_rdd_ids(spark)
    with bounded_plan_cache(spark):
        p = spark.range(100).persist()
        c = spark.range(50).localCheckpoint()
        assert p.count() == 100 and c.count() == 50
        assert persistent_rdd_ids(spark) - base  # blocks live inside scope
    assert persistent_rdd_ids(spark) == base

    # the persist()-style frame transparently re-caches if reused later
    assert p.count() == 100


def test_consume_inside_scope_is_documented_contract(spark):
    # Collecting AFTER release still works for persist()-backed plans
    # (lineage rebuilds); the docstring warns only localCheckpoint frames
    # must be consumed inside. Pin the recompute-safe half.
    spark.catalog.clearCache()
    with bounded_plan_cache(spark):
        df = spark.range(10).persist()
    assert df.count() == 10


def _leak_audit_entries():
    """Every catalog entry, for the opt-in full audit below."""
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


def test_full_catalog_leak_audit_optin(spark):
    """Full-catalog no-net-blocks audit at sf0.001 — ~10 min, so gated
    behind SPARK_GRAFT_FULL_LEAK_AUDIT=1 (run it before a round close)."""
    if os.environ.get("SPARK_GRAFT_FULL_LEAK_AUDIT") != "1":
        import pytest

        pytest.skip("set SPARK_GRAFT_FULL_LEAK_AUDIT=1 for the full audit")
    spark.catalog.clearCache()
    base = persistent_rdd_ids(spark)
    leaks = {}
    for name in _leak_audit_entries():
        try:
            run_query(spark, SF_DIR, name)
        except Exception:  # noqa: BLE001 — leak audit, not correctness
            spark.catalog.clearCache()
            continue
        extra = persistent_rdd_ids(spark) - base
        if extra:
            leaks[name] = extra
            spark.catalog.clearCache()
    assert not leaks, f"entries leaking blocks past the scope: {leaks}"
