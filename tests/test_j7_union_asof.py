"""j7's union-merge asof vs the range-join + window form it replaced.

The catalog's events fixture has no event at or before any order date at
ANY scale factor, so the DuckDB oracle passes the r11 rewrite vacuously —
this test supplies the data the fixture lacks: same-timestamp event ties,
an event landing exactly on the order-date midnight boundary (the
date→timestamp coercion the old join predicate relied on), multiple
orders per user sharing a date, and an order with no qualifying event.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _old_form(o, e):
    joined = o.join(
        e.withColumnRenamed("user_id", "e_user_id"),
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("ts") <= F.col("o_orderdate")),
    )
    w = W.partitionBy("o_orderkey").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "user_id",
            F.col("event_id").alias("asof_event_id"),
            F.col("event_type").alias("asof_event_type"),
            F.col("value").alias("asof_value"),
        )
        .orderBy("o_orderkey")
    )


def _new_form(o, e):
    ev = e.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("t"),
        F.lit(0).alias("tag"),
        "event_id",
        F.struct("ts", "event_id", "event_type", "value").alias("ev"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orows = o.select(
        "user_id",
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None)
        .cast("struct<ts:timestamp,event_id:bigint,event_type:string,value:double>")
        .alias("ev"),
        "o_orderkey",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lastev = ev.unionByName(orows).withColumn(
        "last_ev", F.last("ev", ignorenulls=True).over(w)
    )
    return (
        lastev.filter((F.col("tag") == 1) & F.col("last_ev").isNotNull())
        .select(
            "o_orderkey",
            "user_id",
            F.col("last_ev.event_id").alias("asof_event_id"),
            F.col("last_ev.event_type").alias("asof_event_type"),
            F.col("last_ev.value").alias("asof_value"),
        )
        .orderBy("o_orderkey")
    )


def test_union_asof_matches_range_join_on_ties_and_boundaries(spark):
    ts = datetime.datetime
    d = datetime.date
    events = spark.createDataFrame(
        [
            # user 1: two events with the SAME ts (tie -> max event_id wins),
            # plus a later one past every order date
            (10, ts(2024, 1, 5, 12, 0, 0), 1, "a", 1.0),
            (11, ts(2024, 1, 5, 12, 0, 0), 1, "b", 2.0),
            (12, ts(2024, 3, 1, 0, 0, 0), 1, "c", 3.0),
            # user 2: one event EXACTLY at order-date midnight (ts <= date
            # must include it via the date->timestamp promotion)
            (20, ts(2024, 2, 1, 0, 0, 0), 2, "d", 4.0),
            # user 3: only events AFTER its order date (order must drop out)
            (30, ts(2024, 6, 1, 0, 0, 0), 3, "e", 5.0),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    orders = spark.createDataFrame(
        [
            (100, d(2024, 1, 10), 1),
            (101, d(2024, 1, 10), 1),  # same user, same date as 100
            (102, d(2024, 1, 5), 1),  # BEFORE the 12:00 tie events -> no match
            (200, d(2024, 2, 1), 2),  # midnight boundary event qualifies
            (300, d(2024, 1, 1), 3),  # no event at or before -> dropped
        ],
        "o_orderkey bigint, o_orderdate date, user_id bigint",
    )
    old = _old_form(orders, events).collect()
    new = _new_form(orders, events).collect()
    assert old == new
    got = {r.o_orderkey: (r.asof_event_id, r.asof_event_type, r.asof_value) for r in new}
    assert got == {
        100: (11, "b", 2.0),  # tie broken by max event_id
        101: (11, "b", 2.0),
        200: (20, "d", 4.0),  # midnight-boundary event included
    }
    assert 102 not in got and 300 not in got
