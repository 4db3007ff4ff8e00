"""Property tests for the distributed total-order primitive
(operators/totalorder.py) — the VERDICT r4 item-1 machinery.

The reference for every property is a driver-side Python sort of the same
rows (no Spark window involved), so a wrong offset, a bad cut comparison
(direction / null placement), or any bucket-boundary inconsistency between
the stats and data branches would surface as a rank/cum mismatch here."""

from __future__ import annotations

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.totalorder import (
    bounded_window,
    multi_order_cuts,
    ntile_from_rank,
    total_order,
)


def _mkdf(spark, n=997, seed=7, with_nulls=False):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x = rng.randrange(50)  # heavy ties
        g = "g1" if rng.random() < 0.7 else "g2"  # skewed groups
        w = rng.randrange(1, 100)
        xv = None if (with_nulls and rng.random() < 0.05) else x
        rows.append((i, xv, g, w))
    return spark.createDataFrame(rows, "key int, x int, grp string, w int"), rows


def _expected_rank(rows, desc=False):
    # total order (x, key), nulls first on asc / last on desc (Spark default)
    def sk(r):
        null = r[1] is None
        v = 0 if r[1] is None else r[1]
        if desc:
            return (null, -v, r[0])
        return (not null, v, r[0])

    return {r[0]: i + 1 for i, r in enumerate(sorted(rows, key=sk))}


def test_rank_matches_reference_across_partitionings(spark):
    df, rows = _mkdf(spark)
    exp = _expected_rank(rows)
    for k in (1, 3, 16, 2000):  # 2000 > n: empty partitions
        got = {
            r["key"]: r["rnk"]
            for r in total_order(
                df, ["x", "key"],
                rank_col="rnk", num_partitions=k,
            ).collect()
        }
        assert got == exp, f"num_partitions={k}"


def test_rank_desc_and_nulls(spark):
    df, rows = _mkdf(spark, with_nulls=True)
    exp = _expected_rank(rows, desc=True)
    got = {
        r["key"]: r["rnk"]
        for r in total_order(
            df, [("x", "desc"), "key"],
            rank_col="rnk", num_partitions=7,
        ).collect()
    }
    assert got == exp


def test_multi_order_cuts_ranks_match_per_order_sampling(spark):
    """One shared sample job must give the same exact ranks as per-order
    sampling — cut choice affects bucket balance only, never ranks — for
    asc/desc mixes and null-carrying keys."""
    df, rows = _mkdf(spark, with_nulls=True)
    orders = [
        ["x", "key"],
        [("x", "desc"), "key"],
        [("w", "asc"), ("key", "asc")],
    ]
    cuts = multi_order_cuts(df, orders, num_partitions=7)
    assert len(cuts) == 3
    exp_asc = _expected_rank(rows)
    exp_desc = _expected_rank(rows, desc=True)
    got_asc = {
        r["key"]: r["rnk"]
        for r in total_order(
            df, orders[0], rank_col="rnk", num_partitions=7, cuts=cuts[0]
        ).collect()
    }
    got_desc = {
        r["key"]: r["rnk"]
        for r in total_order(
            df, orders[1], rank_col="rnk", num_partitions=7, cuts=cuts[1]
        ).collect()
    }
    assert got_asc == exp_asc
    assert got_desc == exp_desc
    exp_w = {
        r[0]: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r[3], r[0])))
    }
    got_w = {
        r["key"]: r["rnk"]
        for r in total_order(
            df, orders[2], rank_col="rnk", num_partitions=7, cuts=cuts[2]
        ).collect()
    }
    assert got_w == exp_w


def test_rank_is_permutation_and_n(spark):
    df, rows = _mkdf(spark, n=500)
    out = total_order(
        df, ["x", "key"],
        rank_col="rnk", n_col="n", num_partitions=9,
    ).collect()
    assert sorted(r["rnk"] for r in out) == list(range(1, 501))
    assert {r["n"] for r in out} == {500}


def test_cum_and_totals_match_reference(spark):
    df, rows = _mkdf(spark, n=400)
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    run, exp_cum = 0, {}
    for r in srt:
        run += r[3]
        exp_cum[r[0]] = run
    out = total_order(
        df, ["x", "key"],
        rank_col="rnk", cum={"cw": "w"}, totals={"tw": "w"}, n_col="n",
        num_partitions=5,
    ).collect()
    exp_rank = _expected_rank(rows)
    for r in out:
        assert r["cw"] == exp_cum[r["key"]]
        assert r["tw"] == run
        assert r["n"] == 400
        assert r["rnk"] == exp_rank[r["key"]]


def test_part_cols_rank_and_n(spark):
    df, rows = _mkdf(spark, n=600)
    out = total_order(
        df, ["x", "key"],
        part_cols=["grp"], rank_col="rnk", n_col="n", cum={"cw": "w"},
        num_partitions=6,
    ).collect()
    for g in ("g1", "g2"):
        grows = sorted(
            (r for r in rows if r[2] == g), key=lambda r: (r[1], r[0])
        )
        exp = {r[0]: i + 1 for i, r in enumerate(grows)}
        run, expc = 0, {}
        for r in grows:
            run += r[3]
            expc[r[0]] = run
        sub = [r for r in out if r["grp"] == g]
        assert {r["key"]: r["rnk"] for r in sub} == exp
        assert {r["key"]: r["cw"] for r in sub} == expc
        assert {r["n"] for r in sub} == {len(grows)}


def test_ntile_matches_spark_ntile(spark):
    for n, k in ((997, 10), (43, 5), (7, 10), (100, 10), (9, 3)):
        df = spark.range(n).select(F.col("id").alias("key"))
        ranked = total_order(
            df, ["key"], rank_col="rnk", n_col="n",
            num_partitions=4,
        ).withColumn("tile", ntile_from_rank(F.col("rnk"), F.col("n"), k))
        ref = df.select(
            "key",
            F.ntile(k)
            .over(bounded_window(F.col("key").asc(), anchor="key"))
            .alias("tile"),
        )
        got = {r["key"]: r["tile"] for r in ranked.collect()}
        exp = {r["key"]: r["tile"] for r in ref.collect()}
        assert got == exp, f"n={n} k={k}"


def test_plan_has_no_unpartitioned_window_and_one_range_exchange(spark):
    from tools.planaudit import unpartitioned_window_specs

    df, _ = _mkdf(spark, n=300)
    out = total_order(
        df, ["x", "key"],
        rank_col="rnk", num_partitions=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert unpartitioned_window_specs(plan) == []

    out2 = total_order(
        df, ["x", "key"],
        cum={"cw": "w"}, num_partitions=8,
    )
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan2
    assert unpartitioned_window_specs(plan2) == []


def test_bounded_window_partitioned_and_wgl(spark):
    from tools.planaudit import unpartitioned_window_specs

    df, _ = _mkdf(spark, n=300)
    ranked = df.withColumn(
        "rn",
        F.row_number().over(
            bounded_window(F.col("x").desc(), F.col("key").asc(), anchor="key")
        ),
    )
    topk = ranked.filter(F.col("rn") <= 5)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_window_specs(plan) == []
    assert "WindowGroupLimit" in plan  # map-side partial top-k preserved
    # semantics identical to the unpartitioned window
    got = [(r["key"], r["rn"]) for r in topk.orderBy("rn").collect()]
    ref = (
        df.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("x").desc(), F.col("key").asc())),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("rn")
        .collect()
    )
    assert got == [(r["key"], r["rn"]) for r in ref]
