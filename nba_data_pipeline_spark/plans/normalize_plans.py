"""Normalization-pipeline catalog queries (SURVEY §2.2 N1-N4, §2.3 F1,
§2.4 X17): drive the schema-repair library end-to-end on a deliberately
pathological projection of ``lineitem`` — flattened-MultiIndex names,
``Unnamed`` placeholders, duplicate names, in-band header-repeat rows, and a
mixed-parse numeric column around the ≥50% boundary — and verify the cleaned
result against plain SQL that names the expected output columns directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nba_data_pipeline_spark.io import read_table
from nba_data_pipeline_spark.operators.enrich import canonicalize_teams
from nba_data_pipeline_spark.operators.normalize import (
    coerce_numeric,
    drop_header_repeats,
    normalize_columns,
)
from nba_data_pipeline_spark.plans.exact import sql_dsum
from nba_data_pipeline_spark.plans.registry import query


def _pathological(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem disguised as a scraped table: messy headers, stringly-typed
    stats, an in-band header row per 500 rows, and a numeric column whose
    parse rate sits above the keep-cast threshold.

    The narrow scan is repartitioned before the string-building projection:
    the downstream pipeline persists this frame and reads it twice (X17
    stats pass + the real aggregate), and a single-row-group input would
    otherwise pin both the projection and the cache build to one task. Only
    the seven source columns move in the shuffle, not the built strings."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            "l_linenumber",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_partkey",
            "l_discount",
            "l_returnflag",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return li.select(
        F.when(F.col("l_linenumber") % 500 == 0, F.lit("Player"))
        .otherwise(F.concat(F.lit("P"), F.col("l_suppkey").cast("string")))
        .alias("Unnamed: 0_level_0 Player"),
        F.col("l_quantity").cast("string").alias("Per Game PTS"),
        F.col("l_extendedprice").cast("string").alias("Per Game PTS"),
        F.when(F.col("l_partkey") % 4 == 0, F.lit("—"))
        .otherwise(F.col("l_discount").cast("string"))
        .alias("FG%"),
        F.col("l_returnflag").alias("Shooting FG%"),
    )


@query(
    "n_normalize_pipeline",
    oracle=f"""
WITH raw AS (
  SELECT CASE WHEN l_linenumber % 500 = 0 THEN 'Player'
              ELSE concat('P', CAST(l_suppkey AS VARCHAR)) END AS "Player",
         CAST(l_quantity AS VARCHAR) AS pts_1,
         CAST(l_extendedprice AS VARCHAR) AS pts_2,
         CASE WHEN l_partkey % 4 = 0 THEN '—'
              ELSE CAST(l_discount AS VARCHAR) END AS fg_pct,
         l_returnflag AS shooting_fg_pct
  FROM lineitem
), cleaned AS (
  SELECT * FROM raw WHERE "Player" <> 'Player'
)
SELECT "Player" AS Player,
       {sql_dsum("TRY_CAST(pts_1 AS DOUBLE)")} AS sum_pts,
       CAST(SUM(CAST(TRY_CAST(pts_2 AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(TRY_CAST(pts_2 AS DOUBLE)) AS avg_pts_dup,
       CAST(SUM(CAST(TRY_CAST(fg_pct AS DOUBLE) AS DECIMAL(8,2))) AS DOUBLE)
           / COUNT(TRY_CAST(fg_pct AS DOUBLE)) AS avg_fg_pct,
       COUNT(*) AS n_rows
FROM cleaned
GROUP BY Player
ORDER BY Player
""",
)
def n_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 flatten + N2 canonical rename + N3 duplicate suffixing + F1
    header-repeat drop + X17 threshold coercion, then an aggregate over the
    repaired table. The rename passes are analysis-time only (zero jobs);
    coercion adds exactly one stats pass
    (Basketball_Refrence_alltables.py:76-186 end-to-end)."""
    # X17 is inherently two-pass (stats job, then the real query); persist
    # the constructed input so the expensive string-building projection runs
    # once — at 100 TB the first pass would read a staged/columnar copy.
    messy = _pathological(spark, sf_dir).persist()
    # N1-N3: 'Unnamed: 0_level_0 Player'->'Player', 'Per Game PTS' twice ->
    # 'Per_Game_PTS','Per_Game_PTS_1', 'FG%'->'FG_pct', 'Shooting FG%'->...
    named = normalize_columns(messy)
    cleaned = drop_header_repeats(named, "Player")
    typed = coerce_numeric(cleaned)  # PTS cols + FG_pct parse ≥ 50% → double
    price_dec = F.col("Per_Game_PTS_1").cast("decimal(18,2)")
    return (
        typed.groupBy("Player")
        .agg(
            F.sum(F.col("Per_Game_PTS").cast("decimal(18,2)")).cast("double").alias("sum_pts"),
            (F.sum(price_dec).cast("double") / F.count("Per_Game_PTS_1")).alias(
                "avg_pts_dup"
            ),
            (
                F.sum(F.col("FG_pct").cast("decimal(8,2)")).cast("double")
                / F.count("FG_pct")
            ).alias("avg_fg_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("Player")
    )


@query(
    "ud5_grouped_normalize",
    oracle="""
WITH stats AS (
  SELECT l_suppkey, MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
  FROM lineitem GROUP BY l_suppkey
)
SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey,
       CASE WHEN s.qmax = s.qmin THEN 0.0
            ELSE (l.l_quantity - s.qmin) / (s.qmax - s.qmin) END AS qty_norm
FROM lineitem l JOIN stats s ON l.l_suppkey = s.l_suppkey
ORDER BY l.l_orderkey, l.l_linenumber
""",
)
def ud5_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD5: grouped-map transformation via applyInPandas (the reference's
    whole-DataFrame clean function applied per scraped table, Basketball
    Reference Scraper unified_nba_scraper.py:175-208): per-supplier min-max
    normalization where the function sees its whole group as one pandas
    frame. Min/max/linear ops are bit-stable across engines, so this
    Python-side path still hash-matches the SQL oracle. At 100 TB the
    shuffle is one hash partition by group key; each group must fit in one
    worker's memory — use mapInPandas + a pre-joined stats table (exactly
    the oracle's shape) when groups can be huge."""
    import pandas as pd

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        qmin, qmax = pdf["l_quantity"].min(), pdf["l_quantity"].max()
        span = qmax - qmin
        out = pdf[["l_orderkey", "l_linenumber", "l_suppkey"]].copy()
        out["qty_norm"] = 0.0 if span == 0 else (pdf["l_quantity"] - qmin) / span
        return out

    normed = (
        li.groupBy("l_suppkey")
        .applyInPandas(
            norm,
            schema="l_orderkey long, l_linenumber int, l_suppkey long, qty_norm double",
        )
        .select("l_orderkey", "l_linenumber", "l_suppkey", "qty_norm")
    )
    # Pin before the global sort: orderBy's range-partitioner samples its
    # child in a separate job, and with a Python lane as the child that
    # sampling pass re-executes the whole applyInPandas stage (measured
    # 2.1 s → 1.4 s warm at sf0.1 from the pin alone). The bench/cachectl
    # scope releases the blocks after the query.
    return normed.localCheckpoint(eager=False).orderBy(
        "l_orderkey", "l_linenumber"
    )


# ---------------------------------------------------------------------------
# NBA-shaped fixture: the FIXTURES.md §3/§5 pathologies on one deterministic
# 600-row DvP table (5 positions × 4 timeframes × 30 team slots), generated
# identically in Spark and DuckDB from range(600) so both engines see the
# same dirty input. Exercises N1-N4 + F1 + X10/X11 (record-paren strip,
# alias resolution, mascot-strip retry, ordered LA disambiguation) + the
# X17 ≥50% coercion boundary on realistic column shapes.
# ---------------------------------------------------------------------------

_POSITIONS = ["PG", "SG", "SF", "PF", "C"]
_TIMEFRAMES = ["2025-26", "Last 7", "Last 15", "Last 30"]
# Slot 12/13 are the two LOS ANGELES rows per scraped (position, timeframe)
# table (DEFENSEVSPOSTION.PY:177-184); slot 14 is an in-band header repeat;
# slots 0/7/13 carry trailing "(w-l)" records (:174-175); slot 3 is an
# abbreviation alias, slot 4 needs the mascot-strip retry (:183-186).
_DIRTY_TEAMS = [
    "Chicago (14-15)",
    "Boston",
    "New York",
    "NY",
    "Golden State Warriors",
    "Miami ",
    "Dallas.",
    "Phoenix (30-1)",
    "  Denver",
    "Utah",
    "Memphis",
    "Milwaukee",
    "Los Angeles",
    "LOS ANGELES (20-9)",
    "Team",
    "Cleveland",
    "Atlanta",
    "Houston",
    "Toronto",
    "Portland",
    "Sacramento",
    "Orlando",
    "Brooklyn",
    "Detroit",
    "Indiana",
    "Charlotte",
    "Washington",
    "San Antonio",
    "New Orleans",
    "Minnesota",
]
_ALIASES = [("NY", "NEW YORK"), ("GOLDEN STATE", "GOLDEN STATE")]


def _sql_list(items: list[str]) -> str:
    return "[" + ", ".join("'" + s.replace("'", "''") + "'" for s in items) + "]"


_FIXTURE_ORACLE = f"""
WITH ids AS (SELECT range AS id FROM range(600)),
raw AS (
  SELECT id AS row_idx,
         {_sql_list(_POSITIONS)}[CAST((id // 30) % 5 AS INT) + 1] AS position,
         {_sql_list(_TIMEFRAMES)}[CAST(id // 150 AS INT) + 1] AS timeframe,
         {_sql_list(_DIRTY_TEAMS)}[CAST(id % 30 AS INT) + 1] AS team_text,
         CAST((id * 7 % 400) / 10.0 AS VARCHAR) AS pts,
         CAST((id * 11 % 500) / 10.0 AS VARCHAR) AS pts_dup,
         CASE WHEN id % 3 = 0 THEN '—'
              ELSE CAST((300 + (id * 13) % 300) / 10.0 AS VARCHAR) END AS fg_pct,
         CASE WHEN id % 5 = 4 THEN CAST((id % 21) - 10 AS VARCHAR)
              ELSE 'N/A' END AS plus_minus
  FROM ids
),
kept AS (SELECT * FROM raw WHERE team_text <> 'Team'),
cleaned AS (
  SELECT *,
         trim(regexp_replace(upper(regexp_replace(
             regexp_replace(team_text, '\\s*\\([^)]*\\)\\s*$', ''),
             '\\.', '', 'g')), '\\s+', ' ', 'g')) AS clean
  FROM kept
),
ali AS (
  SELECT * FROM (VALUES {", ".join(f"('{a}', '{c}')" for a, c in _ALIASES)})
  AS t(alias, canonical)
),
resolved AS (
  SELECT c.*, COALESCE(a1.canonical, a2.canonical, c.clean) AS canon
  FROM cleaned c
  LEFT JOIN ali a1 ON c.clean = a1.alias
  LEFT JOIN ali a2 ON regexp_replace(c.clean, '\\s+\\S+$', '') = a2.alias
),
withla AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY position, timeframe, canon = 'LOS ANGELES'
      ORDER BY row_idx) AS rn
  FROM resolved
),
teamed AS (
  SELECT *, CASE WHEN canon = 'LOS ANGELES' AND rn = 1 THEN 'LAKERS'
                 WHEN canon = 'LOS ANGELES' AND rn = 2 THEN 'CLIPPERS'
                 ELSE canon END AS team
  FROM withla
)
SELECT team, position,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(TRY_CAST(pts AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS sum_pts,
       CAST(SUM(CAST(TRY_CAST(pts_dup AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS sum_pts_dup,
       CAST(SUM(CAST(TRY_CAST(fg_pct AS DOUBLE) AS DECIMAL(8,2))) AS DOUBLE)
           / COUNT(TRY_CAST(fg_pct AS DOUBLE)) AS avg_fg_pct,
       MAX(plus_minus) AS max_plus_minus
FROM teamed
GROUP BY team, position
ORDER BY team, position
"""


@query("nba_fixture_normalize", oracle=_FIXTURE_ORACLE)
def nba_fixture_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end schema repair on the NBA-shaped fixture (FIXTURES.md §3/§5):
    N1-N3 messy-header normalization, F1 header-repeat drop, X17 threshold
    coercion (PTS/FG% parse ≥50% → double, Plus_Minus at 20% stays string),
    then X10/X11 team canonicalization — record-paren strip, broadcast alias
    lookup with mascot-strip retry, and the per-(position, timeframe) ordered
    LOS ANGELES → LAKERS/CLIPPERS rule
    (Basketball_Refrence_alltables.py:76-184, DEFENSEVSPOSTION.PY:159-188).

    The fixture is tiny by construction (600 rows — one scraped DvP page per
    (position, timeframe)); the operators it drives are the same ones the
    100 TB normalize path uses, where the rename passes stay analysis-time
    and X17 costs one map-side-combined stats scan."""
    pos_arr = F.array([F.lit(p) for p in _POSITIONS])
    tf_arr = F.array([F.lit(t) for t in _TIMEFRAMES])
    team_arr = F.array([F.lit(t) for t in _DIRTY_TEAMS])
    ids = spark.range(600)
    messy = ids.select(
        F.col("id").alias("row_idx"),
        F.element_at(pos_arr, (F.floor(F.col("id") / 30) % 5).cast("int") + 1).alias(
            "position"
        ),
        F.element_at(tf_arr, F.floor(F.col("id") / 150).cast("int") + 1).alias(
            "timeframe"
        ),
        F.element_at(team_arr, (F.col("id") % 30).cast("int") + 1).alias(
            "Unnamed: 0_level_0 Team"
        ),
        ((F.col("id") * 7 % 400) / 10.0).cast("string").alias("Per Game PTS"),
        ((F.col("id") * 11 % 500) / 10.0).cast("string").alias("Per Game PTS"),
        F.when(F.col("id") % 3 == 0, F.lit("—"))
        .otherwise(((300 + F.col("id") * 13 % 300) / 10.0).cast("string"))
        .alias("FG%"),
        F.when(F.col("id") % 5 == 4, (F.col("id") % 21 - 10).cast("string"))
        .otherwise(F.lit("N/A"))
        .alias("Plus Minus"),
    )
    named = normalize_columns(messy)  # Team, Per_Game_PTS, Per_Game_PTS_1, FG_pct, ...
    cleaned = drop_header_repeats(named, "Team")
    typed = coerce_numeric(cleaned)
    aliases = spark.createDataFrame(_ALIASES, "alias string, canonical string")
    teamed = canonicalize_teams(
        typed,
        aliases,
        team_col="Team",
        position_col=["position", "timeframe"],
        row_idx_col="row_idx",
    )
    return (
        teamed.groupBy("team", "position")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("Per_Game_PTS").cast("decimal(18,2)")).cast("double").alias(
                "sum_pts"
            ),
            F.sum(F.col("Per_Game_PTS_1").cast("decimal(18,2)")).cast("double").alias(
                "sum_pts_dup"
            ),
            (
                F.sum(F.col("FG_pct").cast("decimal(8,2)")).cast("double")
                / F.count("FG_pct")
            ).alias("avg_fg_pct"),
            F.max("Plus_Minus").alias("max_plus_minus"),
        )
        .orderBy("team", "position")
    )
