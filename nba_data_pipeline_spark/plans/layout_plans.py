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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.operators.totalorder import bounded_window
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


@query(
    "lo2_compaction_bins",
    oracle="""
WITH files AS (
  SELECT o_orderpriority AS part,
         CAST(o_custkey % 200 AS BIGINT) AS file_key,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders
  GROUP BY 1, 2
), planned AS (
  SELECT part, file_key, n_rows,
         CAST(FLOOR((SUM(n_rows) OVER (
             PARTITION BY part ORDER BY file_key
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_rows) / 400) AS INT) AS bin_id
  FROM files
)
SELECT part, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       MIN(file_key) AS first_file,
       MAX(file_key) AS last_file
FROM planned
GROUP BY part, bin_id
ORDER BY part, bin_id
""",
)
def lo2_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO2: small-file COMPACTION planner — the maintenance job that keeps
    a 100 TB table scannable: thousands of small files per partition
    (here simulated as per-custkey-slot row groups inside each order
    priority) are assigned to target-sized rewrite bins by an exclusive
    running sum over the key order, i.e. the same sort+split plan Delta's
    OPTIMIZE or Iceberg's rewrite_data_files computes per partition. Key
    order (not size order) keeps each bin a CONTIGUOUS key range, so the
    compacted files preserve clustering and their min/max footers stay
    prune-tight (first_file/last_file in the output ARE those footers).
    The cumulative sum partitions by table-partition — every partition
    plans in parallel, no global ordering bottleneck at scale."""
    files = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("part"),
            (F.col("o_custkey") % 200).cast("long").alias("file_key"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("part")
        .orderBy("file_key")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    planned = files.withColumn(
        "bin_id",
        F.floor((F.sum("n_rows").over(w) - F.col("n_rows")) / 400).cast("int"),
    )
    return (
        planned.groupBy("part", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.min("file_key").alias("first_file"),
            F.max("file_key").alias("last_file"),
        )
        .orderBy("part", "bin_id")
    )


@query(
    "lo3_skipping_effectiveness",
    oracle=f"""
WITH keyed AS (
  SELECT CAST(l_partkey % 256 AS BIGINT) AS px,
         CAST(l_suppkey % 256 AS BIGINT) AS sy
  FROM lineitem
),
zfiles AS (
  SELECT CAST(({_z_duck("px", "sy")}) >> 8 AS INT) AS file_id,
         CAST(MAX(px) - MIN(px) + 1 AS BIGINT) AS span_px,
         CAST(MAX(sy) - MIN(sy) + 1 AS BIGINT) AS span_sy
  FROM keyed GROUP BY 1
),
lfiles AS (
  SELECT CAST(px AS INT) AS file_id,
         CAST(MAX(px) - MIN(px) + 1 AS BIGINT) AS span_px,
         CAST(MAX(sy) - MIN(sy) + 1 AS BIGINT) AS span_sy
  FROM keyed GROUP BY 1
),
spans AS (
  SELECT 'zorder' AS layout, 'partkey' AS dim,
         CAST(COUNT(*) AS BIGINT) AS n_files, CAST(SUM(span_px) AS BIGINT) AS total_span
  FROM zfiles
  UNION ALL
  SELECT 'zorder', 'suppkey', CAST(COUNT(*) AS BIGINT), CAST(SUM(span_sy) AS BIGINT)
  FROM zfiles
  UNION ALL
  SELECT 'linear', 'partkey', CAST(COUNT(*) AS BIGINT), CAST(SUM(span_px) AS BIGINT)
  FROM lfiles
  UNION ALL
  SELECT 'linear', 'suppkey', CAST(COUNT(*) AS BIGINT), CAST(SUM(span_sy) AS BIGINT)
  FROM lfiles
)
SELECT layout, dim, n_files, total_span,
       CAST(total_span AS DOUBLE) / 256 AS avg_files_per_point_query
FROM spans
ORDER BY layout, dim
""",
)
def lo3_skipping_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO3: data-SKIPPING effectiveness audit — the number that justifies
    (or rejects) a z-order rewrite before paying for it: for a uniform
    point predicate on either dimension, the expected file count a
    min/max-pruned scan opens equals Σ(per-file span)/domain — summing
    footer spans IS the integral over all probe values, no probe loop
    needed. Compared layouts: lo1's z-interleave (both dims span ≤16 of
    256 → ~6% of files per probe on either dimension) versus the
    single-column linear sort (perfect on the sort key, unprunable on the
    other — its files span the full 256 on suppkey). Four audit rows,
    all-integer span math, one exact division.

    This closes the layout loop: lo1 builds the layout, lo2 maintains it,
    lo3 measures whether it pays — on real footer statistics, the same
    audit a table-format optimizer runs from its manifest."""
    keyed = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).cast("long").alias("px"),
        (F.col("l_suppkey") % 256).cast("long").alias("sy"),
    )
    z = _z_spark("px", "sy")
    zfiles = (
        keyed.withColumn("file_id", F.expr(f"CAST(({z}) >> 8 AS INT)"))
        .groupBy("file_id")
        .agg(
            (F.max("px") - F.min("px") + 1).cast("long").alias("span_px"),
            (F.max("sy") - F.min("sy") + 1).cast("long").alias("span_sy"),
        )
    )
    lfiles = (
        keyed.groupBy(F.col("px").cast("int").alias("file_id"))
        .agg(
            (F.max("px") - F.min("px") + 1).cast("long").alias("span_px"),
            (F.max("sy") - F.min("sy") + 1).cast("long").alias("span_sy"),
        )
    )

    def spans(files: DataFrame, layout: str, dim: str, col: str) -> DataFrame:
        return files.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(col).cast("bigint").alias("total_span"),
        ).select(
            F.lit(layout).alias("layout"),
            F.lit(dim).alias("dim"),
            "n_files",
            "total_span",
        )

    rows = (
        spans(zfiles, "zorder", "partkey", "span_px")
        .unionByName(spans(zfiles, "zorder", "suppkey", "span_sy"))
        .unionByName(spans(lfiles, "linear", "partkey", "span_px"))
        .unionByName(spans(lfiles, "linear", "suppkey", "span_sy"))
    )
    return rows.select(
        "layout",
        "dim",
        "n_files",
        "total_span",
        (F.col("total_span").cast("double") / 256).alias("avg_files_per_point_query"),
    ).orderBy("layout", "dim")


@query(
    "lo4_skew_profiler",
    oracle="""
WITH cnt AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
         ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt
  FROM cnt
),
top AS (
  SELECT key, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT) AS rank
  FROM cnt
)
SELECT t.rank, t.key, t.cnt,
       ROUND(100.0 * t.cnt / s.total_rows, 4) AS share_pct,
       s.n_keys, s.total_rows, s.max_cnt, s.p50_cnt, s.p99_cnt,
       ROUND(CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.total_rows, 4)
           AS skew_ratio,
       CAST(CEIL(CAST(s.max_cnt AS DOUBLE) / s.p50_cnt) AS BIGINT)
           AS recommended_salt
FROM top t CROSS JOIN stats s
WHERE t.rank <= 5
ORDER BY t.rank
""",
)
def lo4_skew_profiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO4: join/agg key-skew profiler — the diagnostic that decides
    WHETHER the j11 salted-join / skew_salted_agg machinery is needed and
    with what salt factor. Reports the 5 heaviest keys with their row
    share plus the global distribution stats (p50/p99/max per-key counts,
    skew ratio = max/avg, recommended salt = ceil(max/p50)).

    Scale shape: one map-side-combined count per key, then every statistic
    is computed over the per-key COUNT table (|keys| rows, not |rows|);
    the exact percentiles run on that contracted table, and the top-5
    window is a tiny ordered pass over it. The fact table is scanned once.
    This is the profile a planner consults before choosing salt factors /
    AQE skew thresholds at 100 TB — persisted per table per load, its
    cost amortizes across every downstream join."""
    cnt = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = cnt.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
    )
    # fixed-k top-k via TakeOrderedAndProject (per-partition top-5 + tiny
    # merge); the rank label is a bounded_window over the 5 surviving rows
    top5 = cnt.orderBy(F.desc("cnt"), "key").limit(5)
    top = top5.select(
        "key",
        "cnt",
        F.row_number()
        .over(bounded_window(F.desc("cnt"), "key", anchor="key"))
        .cast("int")
        .alias("rank"),
    )
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.lit(100.0) * F.col("cnt") / F.col("total_rows"), 4).alias(
                "share_pct"
            ),
            "n_keys",
            "total_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            F.round(
                F.col("max_cnt").cast("double")
                * F.col("n_keys")
                / F.col("total_rows"),
                4,
            ).alias("skew_ratio"),
            F.ceil(F.col("max_cnt").cast("double") / F.col("p50_cnt"))
            .cast("long")
            .alias("recommended_salt"),
        )
        .orderBy("rank")
    )
