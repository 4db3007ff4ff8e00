"""Solo-time catalog entries exactly like bench.py does, N iterations each.

Usage: python tools/solo_time.py [--n 3] [--cpus 32] name ...

Replicates bench.py's environment per entry (JVM + Python-worker warmup,
noop sink, clearCache after each entry) but in isolation, so a single
entry's number is free of the full run's neighbor noise. Prints every
iteration plus min (bench metric is min-of-2 in one warm process).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.plans.registry import load_all
    from nba_data_pipeline_spark.session import get_spark

    spark = get_spark("solo_time", cpus=args.cpus)
    specs = load_all()

    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(args.cpus * 4).repartition(args.cpus).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.names:
        if name not in specs:
            print(f"skip (unknown): {name}", file=sys.stderr)
            continue
        times = []
        spark.sparkContext.setJobDescription(f"solo:{name}")
        for _ in range(args.n):
            t0 = time.time()
            specs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times} min={min(times)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
