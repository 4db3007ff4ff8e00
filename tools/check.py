"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin on DuckDB over the same parquet, then compares row count, sorted column
names, and order-insensitive values (exact for ints/strings, near-exact for
floats). Usage:

    python tools/check.py [name ...]      # default: all registered queries
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nba_data_pipeline_spark.io import TABLES
from nba_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(v):
    """Canonicalize a cell for order-insensitive compare."""
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return (type(v).__name__[:1], str(v))


def compare(name: str, spark_df, duck_rel) -> list[str]:
    problems: list[str] = []
    scols = sorted(spark_df.columns)
    srows = [tuple(r[c] for c in scols) for r in spark_df.collect()]

    dcols_raw = duck_rel.columns
    order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = [dcols_raw[i] for i in order]
    drows = [tuple(row[i] for i in order) for row in duck_rel.fetchall()]

    if scols != dcols:
        problems.append(f"columns differ: spark={scols} duck={dcols}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")
    sset = sorted(tuple(canon(v) for v in row) for row in srows)
    dset = sorted(tuple(canon(v) for v in row) for row in drows)
    if sset != dset:
        dseen, sseen = set(dset), set(sset)
        diff_s = [r for r in sset if r not in dseen][:3]
        diff_d = [r for r in dset if r not in sseen][:3]
        problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return problems


def main() -> int:
    want = sys.argv[1:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = want or list(qs)
    spark = get_spark("check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duck_connect(SF_DIR)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            if name in oracles:
                problems = compare(name, sdf, con.sql(oracles[name]))
            else:
                n = sdf.count()
                problems = [] if n >= 0 else ["negative count?"]
                print(f"  (rows-only: {n} rows)")
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        # Same discipline as bench.py: queries that persist() multi-consumer
        # intermediates must not accumulate cached blocks across a 264-query
        # session (MEMORY_AND_DISK keeps it correct but taxes later queries).
        spark.catalog.clearCache()
        dt = time.time() - t0
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} ({dt:.1f}s)")
        for p in problems:
            print(f"     {p}")
        if problems:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
