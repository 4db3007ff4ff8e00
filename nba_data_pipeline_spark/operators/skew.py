"""Skew-handling operators: salted two-phase aggregation and a salted
join helper — the standard remedies when a handful of hot keys would pin
one reducer at 100 TB (SURVEY §4 scale notes; complements AQE's runtime
skew-join splitting, which only covers sort-merge joins).

Salting is only exact for algebraic aggregates (sum/count/min/max); the
public helpers here take decimal-cast sums so the two-phase result is
bit-identical to a direct groupBy on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over hot keys: phase 1 groups on
    (keys, salt) so a hot key spreads over ``buckets`` reducers, phase 2
    merges the partials per key. ``sum_cols`` maps input column →
    output alias; sums run as decimal(18,2) so phase order can't change
    the result.

    The salt derives from xxhash64 over the whole row (cheap, no extra
    state); any row-distribution works because the partial sums are
    algebraic.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[
                F.sum(F.col(src).cast("decimal(18,2)")).alias(f"__p_{alias}")
                for src, alias in sum_cols.items()
            ],
            F.count(F.lit(1)).alias("__p_n"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        *[
            F.sum(F.col(f"__p_{alias}")).cast("double").alias(alias)
            for alias in sum_cols.values()
        ],
        F.sum("__p_n").alias("n_rows"),
    )


def replicate_broadcast_side(small: DataFrame, buckets: int = 16) -> DataFrame:
    """Salted-join helper: replicate the small side once per salt bucket so
    a skewed big side joined on (key, salt) spreads its hot keys. Pair with
    ``withColumn('__salt', pmod(xxhash64(...), buckets))`` on the big side."""
    return small.crossJoin(
        F.broadcast(
            small.sparkSession.range(buckets).select(F.col("id").cast("int").alias("__salt"))
        )
    )
