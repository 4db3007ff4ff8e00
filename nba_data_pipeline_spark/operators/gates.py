"""Pre-commit completeness gates (SURVEY §2.11 S5, §2.6 A5).

The reference's strictest pipeline refuses partial data: exactly 30
distinct canonical teams per position×timeframe cell, all 20 cells present,
hard-fail otherwise ("never trust partial data", DEFENSEVSPOSTION.PY:41-43,
524-541, 575-598). Engine form: assertion queries that run BEFORE the sink
commits — an all-or-nothing write wrapper.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


class CompletenessError(ValueError):
    """Raised when a pre-commit gate fails; nothing is written."""


@dataclass
class GateReport:
    ok: bool
    failures: list[dict]


def check_group_completeness(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    expected_distinct: int,
) -> GateReport:
    """A5: every group must contain exactly ``expected_distinct`` distinct
    keys (the 30-teams rule). One aggregate job; failures list the groups."""
    bad = (
        df.groupBy(*group_cols)
        .agg(F.countDistinct(key_col).alias("__n"))
        .filter(F.col("__n") != expected_distinct)
        .collect()
    )
    return GateReport(ok=not bad, failures=[row.asDict() for row in bad])


def check_cell_presence(
    df: DataFrame, group_cols: list[str], expected_cells: list[tuple]
) -> GateReport:
    """Global completeness (DEFENSEVSPOSTION.PY:575-598): all expected
    group-key combinations present."""
    present = {tuple(r) for r in df.select(*group_cols).distinct().collect()}
    missing = [c for c in expected_cells if tuple(c) not in present]
    return GateReport(
        ok=not missing,
        failures=[dict(zip(group_cols, m)) for m in missing],
    )


def gated_write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    group_cols: list[str],
    key_col: str,
    expected_distinct: int,
) -> None:
    """S5: all-or-nothing sink — run the completeness gate, then (and only
    then) commit the partitioned write. The validation pass reuses the
    cached plan; nothing lands on failure."""
    df = df.cache()
    try:
        report = check_group_completeness(df, group_cols, key_col, expected_distinct)
        if not report.ok:
            raise CompletenessError(f"incomplete groups: {report.failures[:5]}")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        df.unpersist()
