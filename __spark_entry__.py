"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``nba_data_pipeline_spark.plans`` — each plan
module registers Spark builder + DuckDB oracle side by side.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import nba_data_pipeline_spark  # noqa: E402
from nba_data_pipeline_spark.plans.registry import load_all  # noqa: E402

#: SparkContext application ids the package zip was already shipped to.
_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship the package to executor Python workers (``addPyFile`` — the
    in-session equivalent of ``spark-submit --py-files``). Module-level
    functions handed to ``mapInPandas``/UDTFs are cloudpickled BY REFERENCE,
    so workers must be able to import ``nba_data_pipeline_spark``; that holds
    for free only when the launching process's cwd is the repo root. Shipping
    the zip makes the contract hold from any cwd — and is exactly how the
    package deploys on a real multi-executor cluster."""
    app = spark.sparkContext.applicationId
    if app in _SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(nba_data_pipeline_spark.__file__))
    base = os.path.join(tempfile.mkdtemp(prefix="spark_graft_pkg_"), "pkg")
    zip_path = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir),
        base_dir="nba_data_pipeline_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.0): per-supplier rolling last-10 hit rate
    over lineitem⋈orders at sf0.001."""
    _ship_package(spark)
    specs = load_all()
    return specs["flagship_hitrate_last10"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def shipped(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: shipped(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
