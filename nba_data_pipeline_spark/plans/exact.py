"""Exact-arithmetic helpers for oracle-matched aggregates.

Floating sums are order-dependent, and Spark (partial aggregation across
partitions) and DuckDB (single-threaded scan order) sum in different orders —
so ``ROUND(SUM(double), n)`` can land on opposite sides of a rounding
boundary. The discipline used by every catalog query:

  * money/ratio sums are computed in DECIMAL (exact, order-independent),
    then cast to DOUBLE at the end → bit-identical across engines;
  * averages are expressed as ``CAST(decimal_sum AS DOUBLE) / count`` —
    IEEE division of identical operands is deterministic;
  * no rounding anywhere in the compared output.

The input data carries 2-decimal prices and rates, so DECIMAL(18,2) casts
are value-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MONEY = "decimal(18,2)"


def dsum(col: Column | str, cast: str = MONEY) -> Column:
    """Order-independent sum: decimal-exact, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(cast)).cast("double")


def davg(col: Column | str, cast: str = MONEY) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(cast)).cast("double") / F.count(c)


def sql_dsum(expr: str, cast: str = "DECIMAL(18,2)") -> str:
    # The DOUBLE cast is routed through text (STRING — an alias both
    # engines accept; a22 runs this same string through spark.sql, which
    # rejects bare VARCHAR): DuckDB's direct
    # decimal->double cast divides the int128 payload by 10^scale in
    # floating point and can land 1 ulp off the correctly-rounded double
    # once the sum needs >~16 significant digits (first seen at sf1:
    # a12's sum_charge, 27864155010.941590 -> ...941593). Text->double
    # parsing is correctly rounded in both engines, and Spark/Java's
    # BigDecimal->double cast is correctly rounded too, so the text
    # route agrees with the Spark side at EVERY magnitude and is
    # value-identical to the old form wherever the old form was right.
    return f"CAST(CAST(SUM(CAST({expr} AS {cast})) AS STRING) AS DOUBLE)"


def sql_davg(expr: str, cast: str = "DECIMAL(18,2)") -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {cast})) AS STRING) AS DOUBLE)"
        f" / COUNT({expr})"
    )
