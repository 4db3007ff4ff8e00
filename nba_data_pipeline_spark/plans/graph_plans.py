"""Graph-analytics queries (G family): iterative algorithms as repeated
relational passes — the class the reference approximates with one-shot
pandas groupbys (team-level season aggregates) but can never iterate.

Float discipline for iteration: PageRank is normally a float fixpoint,
which no cross-engine oracle can hash. Here every score is a BIGINT in
units of 1e-12 (SCALE), damping is the exact rational 85/100 applied as
``(85 * pr) div (100 * deg)`` in floor integer division, and the teleport
term is ``(15 * SCALE) div (100 * N)`` — so three unrolled iterations are
bit-exact on both engines, and the ranking they induce equals the float
ranking to well past the distinguishable-mass level."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.plans.registry import query

_SCALE = 1_000_000_000_000

_SQL_ITER = """
{out} AS (
  SELECT n.n, base.b + COALESCE(s.contrib, 0) AS pr
  FROM nodes n
  CROSS JOIN (SELECT (15 * {scale}) // (100 * COUNT(*)) AS b FROM nodes) base
  LEFT JOIN (
    SELECT e.v AS n, CAST(SUM((85 * p.pr) // (100 * d.d)) AS BIGINT) AS contrib
    FROM edges e JOIN {inp} p ON p.n = e.u JOIN deg d ON d.u = e.u
    GROUP BY e.v
  ) s ON s.n = n.n
)"""


@query(
    "g1_pagerank_trade",
    oracle=f"""
WITH eo AS (
  SELECT o.o_orderkey, c.c_nationkey AS u
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), ls AS (
  SELECT l.l_orderkey, s.s_nationkey AS v
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
), edges AS (
  SELECT DISTINCT eo.u, ls.v FROM eo JOIN ls ON ls.l_orderkey = eo.o_orderkey
  WHERE eo.u <> ls.v
), nodes AS (
  SELECT u AS n FROM edges UNION SELECT v FROM edges
), deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u
), pr0 AS (
  SELECT n, {_SCALE} // (SELECT COUNT(*) FROM nodes) AS pr FROM nodes
),{_SQL_ITER.format(out="pr1", inp="pr0", scale=_SCALE)},{_SQL_ITER.format(out="pr2", inp="pr1", scale=_SCALE)},{_SQL_ITER.format(out="pr3", inp="pr2", scale=_SCALE)}
SELECT na.n_name AS nation, CAST(pr3.pr AS BIGINT) AS pr_scaled,
       CAST(ROW_NUMBER() OVER (ORDER BY pr3.pr DESC, na.n_name) AS INT) AS pr_rank
FROM pr3 JOIN nation na ON na.n_nationkey = pr3.n
ORDER BY pr_rank
""",
)
def g1_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: PageRank (3 damped iterations) over the nation-level trade
    graph — customer-nation → supplier-nation edges mined from the
    orders⋈customer and lineitem⋈supplier fact joins. The expensive part
    IS the edge mining (a real fact⋈fact join that shuffles once on
    orderkey); the iteration then runs on the contracted graph (≤ N²
    nation pairs), so each of the 3 rounds is a broadcast-sized join —
    the standard shape for iterative graph algorithms on Spark: contract
    first, iterate on the summary, never loop over the facts. Scores are
    integer-exact (module docstring) so the 3-round fixpoint hashes
    identically on both engines. At 100 TB the edge-mining join dominates
    and parallelizes; the per-round cost is invariant in data size (node
    count is the dimension cardinality)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    eo = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.col("c_nationkey").alias("u"))
    )
    ls = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", F.col("s_nationkey").alias("v"))
    )
    edges = (
        eo.join(ls, eo["o_orderkey"] == ls["l_orderkey"])
        .where(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select(F.col("v").alias("n")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # dimension-sized; also materializes the caches
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    base = (15 * _SCALE) // (100 * n_nodes)
    pr = nodes.withColumn("pr", F.lit(_SCALE // n_nodes))
    for _ in range(3):
        contrib = (
            edges.join(pr.withColumnRenamed("n", "u"), "u")
            .join(deg, "u")
            .groupBy(F.col("v").alias("n"))
            .agg(
                F.sum(F.expr("(85 * pr) div (100 * d)")).cast("long").alias("contrib")
            )
        )
        pr = nodes.join(contrib, "n", "left").select(
            "n",
            (F.lit(base) + F.coalesce("contrib", F.lit(0))).alias("pr"),
        )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = pr.join(
        F.broadcast(nation), pr["n"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        F.col("pr").cast("long").alias("pr_scaled"),
    )
    wr = W.orderBy(F.desc("pr_scaled"), "nation")
    return out.withColumn(
        "pr_rank", F.row_number().over(wr).cast("int")
    ).orderBy("pr_rank")
