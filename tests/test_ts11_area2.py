"""TS11's triangle-area argmax key must survive scale-sized buckets.

The 30x ladder caught the original BIGINT form overflowing (ANSI
ARITHMETIC_OVERFLOW at sf3: the factor products scale ~n^3 per bucket).
This pins the DECIMAL(38,0) lane: at magnitudes past 2^63 the Spark
expression must equal exact Python integer arithmetic.
"""

from __future__ import annotations

from nba_data_pipeline_spark.plans.timeseries_plans import _ts11_area2


def _py_area2(r: dict) -> int:
    return abs(
        (r["pa_sx"] * r["na_n"] - r["na_sx"] * r["pa_n"])
        * (r["y"] * r["pa_n"] - r["pa_sy"])
        - (r["pa_sx"] - r["x"] * r["pa_n"])
        * (r["pa_sy"] * r["na_n"] - r["na_sy"] * r["pa_n"])
    )


def test_area2_exact_past_bigint_range(spark):
    # an sf3-scale bucket: n = 12k rows, epoch-second sums ~2e13 — the
    # first factor product alone is ~8e20, past the 9.2e18 BIGINT range
    n = 12_000
    row = {
        "x": 1_700_010_000,
        "y": 52_345,
        "pa_sx": n * 1_700_000_000,
        "pa_sy": n * 30_000,
        "pa_n": n,
        "na_sx": n * 1_700_021_600,
        "na_sy": n * 31_000,
        "na_n": n,
    }
    expected = _py_area2(row)
    assert expected > 2**63  # the regression is only meaningful out here
    df = spark.createDataFrame([row]).select(_ts11_area2().alias("area2"))
    got = df.collect()[0]["area2"]
    assert int(got) == expected


def test_area2_matches_python_at_small_scale(spark):
    rows = [
        {
            "x": 100 + i,
            "y": 50 - 3 * i,
            "pa_sx": 1_000 + 7 * i,
            "pa_sy": 400 - i,
            "pa_n": 10,
            "na_sx": 1_200 - 5 * i,
            "na_sy": 380 + 2 * i,
            "na_n": 11,
        }
        for i in range(8)
    ]
    df = spark.createDataFrame(rows).select(_ts11_area2().alias("area2"))
    got = [int(r["area2"]) for r in df.collect()]
    assert got == [_py_area2(r) for r in rows]
