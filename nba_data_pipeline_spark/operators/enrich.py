"""Enrichment operators (SURVEY §2.4 X11, §2.5 J1-J3): team-name
canonicalization via broadcast alias dims with mascot-strip retry, and the
order-dependent "LOS ANGELES" disambiguation made deterministic with an
explicit ingestion row index (SURVEY §4.3.2, §7.3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from nba_data_pipeline_spark.functions.extract import norm_ws, strip_record_paren


def clean_team_text(c: F.Column) -> F.Column:
    """Upper, de-dot, strip trailing record '(14-15)', collapse whitespace
    (DEFENSEVSPOSTION.PY:159-175)."""
    return norm_ws(F.upper(F.regexp_replace(strip_record_paren(c), r"\.", "")))


def canonicalize_teams(
    df: DataFrame,
    aliases: DataFrame,  # columns: alias, canonical
    team_col: str = "team_raw",
    position_col: str | list[str] = "position",
    row_idx_col: str = "row_idx",
    la_first: str = "LAKERS",
    la_second: str = "CLIPPERS",
) -> DataFrame:
    """X11: two-stage alias resolution + stateful LA rule.

    Stage 1: exact alias lookup (broadcast left join).
    Stage 2: mascot-strip retry — drop the last word and look up again
    (DEFENSEVSPOSTION.PY:183-186), else pass the cleaned text through.
    LA rule: the reference disambiguates two identical 'LOS ANGELES' rows by
    DOM order — first seen is the Lakers, second the Clippers, counter reset
    per position (DEFENSEVSPOSTION.PY:177-184). Distributed execution has no
    row order, so the ingestion row index is threaded through and the rule
    becomes row_number() over (position, order by row_idx).

    ``position_col`` may be a list when the counter resets per scraped
    table, e.g. per (position, timeframe).
    """
    part_cols = [position_col] if isinstance(position_col, str) else list(position_col)
    cleaned = df.withColumn("__clean", clean_team_text(F.col(team_col)))
    a1 = aliases.select(
        F.col("alias").alias("__a1"), F.col("canonical").alias("__c1")
    )
    a2 = aliases.select(
        F.col("alias").alias("__a2"), F.col("canonical").alias("__c2")
    )
    stripped = F.regexp_replace(F.col("__clean"), r"\s+\S+$", "")
    out = (
        cleaned.join(F.broadcast(a1), cleaned["__clean"] == F.col("__a1"), "left")
        .withColumn("__stripped", stripped)
        .join(F.broadcast(a2), F.col("__stripped") == F.col("__a2"), "left")
        .withColumn("__canon", F.coalesce("__c1", "__c2", "__clean"))
    )
    la = F.col("__canon") == "LOS ANGELES"
    w = W.partitionBy(*part_cols, F.when(la, 1).otherwise(0)).orderBy(row_idx_col)
    out = out.withColumn("__la_rn", F.when(la, F.row_number().over(w)))
    return out.withColumn(
        "team",
        F.when(la & (F.col("__la_rn") == 1), la_first)
        .when(la & (F.col("__la_rn") == 2), la_second)
        .otherwise(F.col("__canon")),
    ).drop("__clean", "__a1", "__c1", "__a2", "__c2", "__stripped", "__canon", "__la_rn")
