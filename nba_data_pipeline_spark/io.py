"""Table IO: the engine's contract starts at landed data (parquet) and ends
at partitioned sinks, mirroring the reference's landed-JSON trees
(Cleaning_Glass_#1.py:455-495, nba_props_scraper.py:824-860 — see SURVEY §2
SNK1-SNK6) but Spark-native: columnar parquet in, ``partitionBy`` out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_TMP_ROOT: str | None = None


def session_tmpdir(prefix: str) -> str:
    """mkdtemp under ONE per-process root that is removed at interpreter
    exit. Fixture landings, sink outputs, and streaming checkpoints all
    route through here so a long-lived service doesn't accumulate orphaned
    ``*_landing_``/``*_ckpt_`` directories across catalog runs (they were
    previously leaked one per query per session)."""
    global _TMP_ROOT
    import atexit
    import shutil
    import tempfile

    if _TMP_ROOT is None:
        _TMP_ROOT = tempfile.mkdtemp(prefix="nba_spark_session_")
        atexit.register(shutil.rmtree, _TMP_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_TMP_ROOT)


_CKPT_ROOT: str | None = None


def streaming_checkpoint_dir(prefix: str) -> str:
    """Checkpoint location for a bounded streaming drain.

    A drained availableNow query's checkpoint is pure coordination
    metadata — offset/commit logs plus state-store deltas, kilobytes —
    yet every micro-batch fsyncs several of these files, so on a
    disk-backed /tmp the per-batch floor is fsync latency, not compute
    (the drains' dominant fixed cost at bench SFs). Route them to tmpfs
    (/dev/shm) when present: the local-mode analog of a production
    cluster's fast statestore volume. Durability is irrelevant here by
    construction — these checkpoints are created fresh per drain and
    never resumed across processes (the module's standing note: reusing
    an availableNow checkpoint against a drained source yields an empty
    batch). Override the root with SPARK_GRAFT_CKPT_DIR; falls back to
    the session tmpdir when no tmpfs exists."""
    global _CKPT_ROOT
    import atexit
    import shutil
    import tempfile

    root = os.environ.get("SPARK_GRAFT_CKPT_DIR")
    if root is None and os.path.isdir("/dev/shm"):
        root = "/dev/shm"
    if root is None:
        return session_tmpdir(prefix)
    if _CKPT_ROOT is None:
        _CKPT_ROOT = tempfile.mkdtemp(prefix="nba_spark_ckpt_", dir=root)
        atexit.register(shutil.rmtree, _CKPT_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_CKPT_ROOT)


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Row count from the parquet FOOTER — a driver-side stats probe, no
    Spark job. This is what size-adaptive plans (geo1's output-mass pin,
    running_extreme's small-input cutover) consult before choosing a
    strategy: on a warehouse it would be catalog statistics; on landed
    files the footer metadata is the same number for free. Returns None
    when the path isn't footer-readable (remote FS without pyarrow access)
    so callers can fall back to a bounded ``df.count()``."""
    try:
        import pyarrow.parquet as pq

        path = table_path(sf_dir, name)
        if os.path.isfile(path):
            return pq.read_metadata(path).num_rows
        if os.path.isdir(path):
            return sum(
                pq.read_metadata(os.path.join(path, f)).num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
    except Exception:
        return None
    return None


def table_col_minmax(sf_dir: str, name: str, col: str) -> tuple[int, int] | None:
    """(min, max) of ``col`` from parquet FOOTER statistics — a driver-side
    probe, zero data scan (same discipline as :func:`table_row_count`; on a
    warehouse this is catalog column stats). Used by chunked layout builds
    to derive key-range chunk bounds without a pre-pass over the fact.
    Returns None when any row group lacks statistics for the column."""
    try:
        import pyarrow.parquet as pq

        path = table_path(sf_dir, name)
        files = (
            [path]
            if os.path.isfile(path)
            else [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        )
        lo: int | None = None
        hi: int | None = None
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            return None
        return lo, hi
    except Exception:
        return None


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one landed table. Plain parquet scan → Catalyst gets pushdown +
    pruning for free; callers must select/filter declaratively.

    ``events.ts`` has landed in two physical forms across driver data
    regenerations: nanosecond timestamps (which Spark's vectorized reader
    rejects — read as long, truncate to micros) and micro timestamps with
    ``isAdjustedToUTC=false`` (which Spark 4 infers as TIMESTAMP_NTZ —
    cast to session-tz TIMESTAMP; the session runs UTC, so the cast is
    value-preserving and matches DuckDB's naive reading).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every landed table as a temp view so SQL-form queries can
    name them exactly as the DuckDB oracle does."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned_json(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """SNK1/SNK2-style partitioned document sink (reference:
    Cleaning_Glass_#1.py:479-489 folder tree) as a native partitioned write."""
    df.write.mode(mode).partitionBy(*partition_cols).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
