"""Structured Streaming tests (SURVEY §2.11 S1-S3): file-source micro-batch
ingest with availableNow (scroll-until-stable), arrival dedupe with
watermark, incremental resume via checkpoint (skip-if-exists F8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from nba_data_pipeline_spark.streaming.polling import (
    dedupe_on_arrival,
    read_file_stream,
    run_available_now,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "land"), str(tmp_path / "sink"), str(tmp_path / "ckpt")


def test_available_now_processes_then_stops(spark, dirs):
    import datetime as dt

    land, sink, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, land, [(1, t0, "a"), (2, t0, "b")])

    sdf = read_file_stream(spark, land, SCHEMA)
    run_available_now(sdf, sink, ckpt)
    assert spark.read.parquet(sink).count() == 2

    # second landing + rerun resumes from checkpoint: only new rows appended
    _write_batch(spark, land, [(3, t0, "c")])
    run_available_now(read_file_stream(spark, land, SCHEMA), sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert {r.event_id for r in out.collect()} == {1, 2, 3}


def test_arrival_dedupe_with_watermark(spark, dirs):
    import datetime as dt

    land, sink, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # duplicate event_ids landing within the watermark window
    _write_batch(
        spark,
        land,
        [(1, t0, "a"), (1, t0, "dup"), (2, t0, "b"), (2, t0, "dup"), (3, t0, "c")],
    )
    sdf = dedupe_on_arrival(read_file_stream(spark, land, SCHEMA), ["event_id"], "ts")
    run_available_now(sdf, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert {r.event_id for r in out.collect()} == {1, 2, 3}


def test_stability_tracker_stateful(spark, dirs):
    """S3 custom stateful op: cumulative per-key counts carried across
    micro-batches; 'stable' flips true only when a batch adds no rows."""
    import datetime as dt

    from nba_data_pipeline_spark.streaming.polling import stability_tracker

    land, _, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # two files -> two micro-batches (maxFilesPerTrigger=1); key 'a' grows
    # in both batches, key 'b' only lands in the first (stable in batch 2
    # would need a third batch — with update mode 'b' simply isn't re-emitted)
    _write_batch(spark, land, [(1, t0, "a"), (2, t0, "a"), (3, t0, "b")])
    _write_batch(spark, land, [(4, t0, "a")])

    sdf = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(land)
    )
    tracked = stability_tracker(sdf, key_col="payload")
    q = (
        tracked.writeStream.format("memory")
        .queryName("stab_mem")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("stab_mem").collect()
    a_rows = sorted(
        [(r.prev, r.total, r.stable) for r in rows if r.key == "a"]
    )
    # batch ordering by file listing isn't guaranteed, but cumulative state
    # must show one batch starting from 0 and the other continuing from it,
    # never a stable=True (counts grew in both batches 'a' appeared in)
    assert len(a_rows) == 2
    assert a_rows[0][0] == 0 and a_rows[1][1] == 3
    assert not any(s for _, _, s in a_rows)
    b_rows = [(r.prev, r.total, r.stable) for r in rows if r.key == "b"]
    assert b_rows == [(0, 1, False)]


def test_landing_cache_relands_when_source_changes(tmp_path):
    """_LANDING_CACHE keys on the source table's mtime: regenerating the
    events table at the same path within a session must produce a FRESH
    landing (a stale landing would silently replay old bytes)."""
    import os
    import shutil

    from nba_data_pipeline_spark.plans.streaming_plans import _land

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    src = os.path.join(sf_dir, "events.parquet")
    shutil.copy("/root/testdata/sf0.001/events.parquet", src)

    first = _land("tcache", sf_dir, copies=1)
    # identical source -> cached landing dir
    assert _land("tcache", sf_dir, copies=1) == first
    # regenerated source (same path, new mtime) -> fresh landing
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    second = _land("tcache", sf_dir, copies=1)
    assert second != first
