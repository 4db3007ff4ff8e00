"""Query catalog: every implemented operator from SURVEY.md §2 registers a
named query (Spark builder) and, when SQL-expressible, its DuckDB oracle SQL
twin. ``__spark_entry__.py`` re-exports this catalog to the driver.

Determinism rules (so the oracle value-hash matches):
  * every computed column is aliased identically on both sides;
  * every window/rank order includes a unique tiebreaker;
  * floating aggregates are rounded (ROUND_DIGITS) on both sides so the
    engines' different summation orders can't leak into the hash;
  * "keep one row per key" is always expressed as row_number()==1 over a
    total order, never nondeterministic dropDuplicates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

ROUND_DIGITS = 4


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so its @query decorators run."""
    from nba_data_pipeline_spark.plans import (  # noqa: F401
        analytics,
        dedup,
        filters,
        joins,
        multimodal_plans,
        normalize_plans,
        similarity,
        streaming_plans,
        text_plans,
        windows,
    )

    return REGISTRY
