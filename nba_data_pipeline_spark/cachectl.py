"""Bounded cache lifetime for plan-internal persists (library-consumer seam).

Many catalog plans persist or localCheckpoint multi-consumer intermediates
(shingle sets, contracted edge lists, iteration rounds) — correct and
scale-right while the query runs, but a user embedding plan functions in a
long-lived session would otherwise inherit every such block until session
end. The bench/check harnesses sidestep this with
``spark.catalog.clearCache()`` between queries; that is the wrong tool for
an embedding application because it also evicts the USER'S own cached data.

This module scopes cache ownership instead: :func:`bounded_plan_cache`
snapshots the session's persistent-RDD ids on entry and, on exit,
unpersists exactly the ids that appeared since — the blocks the enclosed
plan created — leaving pre-existing (user) blocks untouched. It works at
the RDD level, so it releases BOTH kinds of plan-internal storage:

* ``DataFrame.persist()`` blocks (InMemoryRelation) — releasing these is
  always safe: if the same DataFrame is re-consumed later, Spark's cache
  manager transparently rebuilds the cache from lineage;
* ``DataFrame.localCheckpoint()`` blocks — these have TRUNCATED lineage,
  so release is safe only after the result has been fully consumed. That
  is why the scope is a context manager around *build + consume*, not a
  decorator around plan construction.

Usage (the pattern :func:`run_query` packages):

    with bounded_plan_cache(spark):
        df = queries()["d5_minhash_lsh_pairs"](spark, sf_dir)
        rows = df.collect()          # consume INSIDE the scope
    # plan-internal blocks are gone; the user's own caches remain

Driver-side cost: two bounded py4j map reads and O(new ids) unpersist
calls — no job, no executor traffic beyond the block-removal messages.
Residual cache-manager ENTRIES (driver-side plan metadata for persisted
DataFrames) are not cleared — they hold no executor storage and re-cache
transparently if their DataFrame is ever reused.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently registered as persistent (materialized or
    not) in this session's SparkContext."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_new_since(spark: SparkSession, before: set[int], blocking: bool = False) -> int:
    """Unpersist every persistent RDD whose id is not in ``before``;
    returns how many were released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for k in jmap.keySet().toArray():
        if int(k) not in before:
            jmap.get(k).unpersist(blocking)
            released += 1
    return released


@contextmanager
def bounded_plan_cache(spark: SparkSession, *, blocking: bool = False):
    """Scope within which any cache/persist/localCheckpoint created by the
    enclosed code is released on exit. Consume (collect/write) the result
    inside the scope — localCheckpoint blocks cannot be rebuilt after
    release. Pre-existing blocks are never touched."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        release_new_since(spark, before, blocking)


def run_query(spark: SparkSession, sf_dir: str, name: str) -> list:
    """Run one catalog entry with bounded cache lifetime: build the plan,
    collect the result, release every block the plan created. The
    embedding-consumer convenience over :func:`bounded_plan_cache`."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    with bounded_plan_cache(spark):
        return fn(spark, sf_dir).collect()
