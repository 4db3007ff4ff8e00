"""Data-layout queries (LO family): multi-dimensional clustering for scan
pruning — the write-side half of making a 100 TB table cheap to read.

The reference re-scans its whole CSV corpus for every per-team question
(get_basketball_stats_all_teams_Version6.py loops files); at warehouse
scale the fix is layout: cluster rows so every file's min/max footer
covers a narrow slab of EVERY filter dimension, and the scan planner
skips files wholesale. Z-ordering (bit-interleaving the key dimensions)
is the standard multi-dim clustering — one total order that keeps BOTH
dimensions' per-file ranges ~sqrt-bounded, where sorting by one column
makes the other's range degenerate to the full domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.plans.registry import query

_BITS = 8  # 8+8-bit z-value; top 4+4 bits pick one of 256 files


def _z_spark(x: str, y: str) -> str:
    """Spark SQL bit-interleave: x on even bits, y on odd bits."""
    terms = []
    for i in range(_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return " | ".join(terms)


def _z_duck(x: str, y: str) -> str:
    """Same interleave in DuckDB's operator syntax."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "lo1_zorder_layout",
    oracle=f"""
WITH keyed AS (
  SELECT CAST(l_partkey % 256 AS BIGINT) AS px,
         CAST(l_suppkey % 256 AS BIGINT) AS sy
  FROM lineitem
), zed AS (
  SELECT px, sy, CAST(({_z_duck("px", "sy")}) >> 8 AS INT) AS file_id
  FROM keyed
)
SELECT file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(px) - MIN(px) + 1 AS BIGINT) AS span_part,
       CAST(MAX(sy) - MIN(sy) + 1 AS BIGINT) AS span_supp
FROM zed GROUP BY file_id ORDER BY file_id
""",
)
def lo1_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO1: Z-ORDER clustering audit — assign every lineitem row to the
    file a z-ordered rewrite would land it in (interleave 8 bits of
    partkey × 8 bits of suppkey, top 4+4 bits → 256 files) and report
    each file's per-dimension min/max span, i.e. exactly the parquet
    footer stats a scan planner prunes on. The z-property the pytest
    pins: every file spans ≤ 16 of 256 values in BOTH dimensions, so a
    point predicate on EITHER dimension skips ≥ 15/16 of the files —
    versus a partkey-sorted layout where suppkey spans the full domain
    and suppkey filters scan everything. All native bit arithmetic
    (shiftleft/shiftright/&), one shuffle for the per-file rollup; at
    100 TB the same z expression feeds ``repartitionByRange(z)`` +
    sortWithinPartitions as the actual rewrite job."""
    z = _z_spark("px", "sy")
    keyed = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).cast("long").alias("px"),
        (F.col("l_suppkey") % 256).cast("long").alias("sy"),
    )
    zed = keyed.withColumn("file_id", F.expr(f"CAST(({z}) >> 8 AS INT)"))
    return (
        zed.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("px") - F.min("px") + 1).cast("long").alias("span_part"),
            (F.max("sy") - F.min("sy") + 1).cast("long").alias("span_supp"),
        )
        .orderBy("file_id")
    )
