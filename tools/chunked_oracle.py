"""Phase-wise (chunked) FULL DuckDB oracles for the entries whose one-shot
oracle outgrows a single box — the verification-side twin of the engine's
spill-bounded plans.

Two entries carry deep-decade greens via the SAMPLED oracle only because the
oracle itself, not the engine, is the box-bound side (BENCH_sf1 defects 10
and 11):

* ``d5_minhash_lsh_pairs`` at sf300 — the 12-way MIN(md5(...)) signature
  aggregate over the unnested 2.25B-row shingle relation overshot DuckDB's
  memory cap to 77 GB anon RSS (string allocations are not buffer-managed)
  and was OOM-killed.
* ``mb1_frequent_pairs`` at sf30 — the apriori pair self-join's aggregation
  spill is disk-bound.

This tool computes the SAME oracle result exactly, in bounded phases, each
phase in a FRESH DuckDB process-state (new connection; strings freed) with
its own memory cap and spill dir, landing intermediates to scratch parquet:

d5_minhash:   A. per doc_id-range chunk: (doc_id, sz, mh_0..mh_11) —
                 signatures + distinct-shingle counts, grouped per doc, so
                 chunking by the GROUP key is exact.
              B. band keys + candidate pairs from the landed signatures
                 (15M docs x 13 small columns, no strings-of-the-corpus).
              C. exact-Jaccard verify: re-shingle ONLY docs appearing in a
                 candidate pair (the engine's own candidates-only trick —
                 `inter` rows are consumed exclusively for candidate pairs,
                 so restricting the self-join to candidate docs is lossless)
                 and emit the final (id_a, id_b, jaccard) rows.
mb1:          A. land fitems (order x frequent-item), freq (item supports)
                 and the basket count once — single aggregations DuckDB
                 spills cleanly.
              B. per p1-range chunk: pair counts with the HAVING applied
                 per chunk (exact: chunks partition the p1 GROUP key).
              C. final lift join over the landed pair chunks.

The engine side runs the entry's registered Spark plan unchanged; the
verdict comes from tools/check.py's compare() (row count + schema +
order-insensitive value hash — identical to the driver's gate).

Usage:
    python tools/chunked_oracle.py --sf sf30  mb1_frequent_pairs
    python tools/chunked_oracle.py --sf sf300 d5_minhash_lsh_pairs
    python tools/chunked_oracle.py --sf sf0.01 --chunks 4 mb1_frequent_pairs d5_minhash_lsh_pairs
"""

from __future__ import annotations

import argparse
import atexit
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import check as checkmod
from nba_data_pipeline_spark.io import table_col_minmax, table_row_count
from nba_data_pipeline_spark.plans.dedup import (
    _NUM_HASHES,
    _ROWS_PER_BAND,
    _SQL_SHINGLES,
    _TOKS,
)
from nba_data_pipeline_spark.plans.mining_plans import (
    MIN_ITEM_SUPPORT,
    MIN_PAIR_SUPPORT,
)
from nba_data_pipeline_spark.plans.registry import ROUND_DIGITS

#: per-phase DuckDB memory cap — smaller than check.py's 40GB sweep cap
#: because phases run beside a live Spark JVM and are themselves bounded by
#: construction; env SPARK_GRAFT_DUCK_MEM still wins.
_PHASE_MEM = os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")


def _fresh_con(sf_dir: str, spill: str) -> duckdb.DuckDBPyConnection:
    """A new connection per phase: DuckDB frees phase-A's string-heavy
    state only with the connection, which is exactly what the signature
    aggregate's untracked allocations need."""
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{_PHASE_MEM}'")
    con.sql(f"SET temp_directory='{spill}'")
    con.sql(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        con.sql(
            "CREATE OR REPLACE VIEW lineitem AS "
            f"SELECT * FROM '{sf_dir}/lineitem.parquet'"
        )
    return con


def _chunk_bounds(sf_dir: str, table: str, col: str, n: int) -> list[tuple[int, int]]:
    mm = table_col_minmax(sf_dir, table, col)
    if mm is None:
        raise SystemExit(f"no footer min/max for {table}.{col}")
    lo, hi = mm
    step = max(1, (hi - lo + n) // n)
    return [(lo + i * step, lo + (i + 1) * step) for i in range(n)]


def _auto_chunks(n_rows: int, bytes_per_row: int) -> int:
    """Chunks so one phase's landed/spilled working set stays within a
    quarter of free scratch (the engine-side probe discipline)."""
    try:
        free = shutil.disk_usage(tempfile.gettempdir()).free
    except Exception:  # noqa: BLE001
        free = 8 << 30
    budget = max(free * 0.25, 1 << 30)
    return min(64, max(1, math.ceil(n_rows * bytes_per_row / budget)))


# --------------------------------------------------------------------------
# d5_minhash_lsh_pairs
# --------------------------------------------------------------------------

_SQL_SIG_COLS = ",\n       ".join(
    f"MIN(md5(concat('{i}:', shingle))) AS mh_{i}" for i in range(_NUM_HASHES)
)


def _bands_sql(sig_rel: str) -> str:
    return "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, "
        f"md5(concat_ws('|', mh_{3 * b}, mh_{3 * b + 1}, mh_{3 * b + 2})) "
        f"AS band_key FROM {sig_rel}"
        for b in range(_NUM_HASHES // _ROWS_PER_BAND)
    )


def oracle_d5_minhash(sf_dir: str, scratch: str, n_chunks: int):
    """Returns a DuckDB relation with the entry's exact oracle result."""
    sig_dir = os.path.join(scratch, "sig")
    os.makedirs(sig_dir, exist_ok=True)
    n_docs = table_row_count(sf_dir, "documents") or 0
    # ~150 shingles/doc x ~40 B strings resident during one chunk's agg
    chunks = n_chunks or _auto_chunks(n_docs, 150 * 40)
    bounds = _chunk_bounds(sf_dir, "documents", "doc_id", chunks)
    print(f"# d5_minhash phase A: {len(bounds)} signature chunks", flush=True)
    for i, (lo, hi) in enumerate(bounds):
        t0 = time.time()
        con = _fresh_con(sf_dir, scratch)
        con.sql(
            f"""
COPY (
  WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
             WHERE doc_id >= {lo} AND doc_id < {hi}),
  sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM t)
  SELECT doc_id, COUNT(*) AS sz,
       {_SQL_SIG_COLS}
  FROM sh GROUP BY doc_id
) TO '{sig_dir}/part_{i:04d}.parquet' (FORMAT PARQUET)
"""
        )
        con.close()
        print(f"#   chunk {i + 1}/{len(bounds)} ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    con = _fresh_con(sf_dir, scratch)
    sig_rel = f"read_parquet('{sig_dir}/*.parquet')"
    con.sql(f"CREATE OR REPLACE VIEW sig AS SELECT * FROM {sig_rel}")
    cand_path = os.path.join(scratch, "cand.parquet")
    con.sql(
        f"""
COPY (
  WITH bands AS (
{_bands_sql('sig')}
  )
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
) TO '{cand_path}' (FORMAT PARQUET)
"""
    )
    con.close()
    print(f"# d5_minhash phase B: candidates landed ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    con = _fresh_con(sf_dir, scratch)
    rel = con.sql(
        f"""
WITH cand AS (SELECT * FROM '{cand_path}'),
cids AS (SELECT DISTINCT id FROM (
  SELECT id_a AS id FROM cand UNION ALL SELECT id_b FROM cand)),
t AS (SELECT d.doc_id, {_TOKS.replace("text", "d.text")} AS toks
      FROM documents d JOIN cids ON d.doc_id = cids.id),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM t),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(i.inter AS DOUBLE) / (x.sz + y.sz - i.inter) AS jaccard
FROM cand c
JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
JOIN (SELECT doc_id, sz FROM {sig_rel}) x ON c.id_a = x.doc_id
JOIN (SELECT doc_id, sz FROM {sig_rel}) y ON c.id_b = y.doc_id
WHERE CAST(i.inter AS DOUBLE) / (x.sz + y.sz - i.inter) >= 0.4
ORDER BY c.id_a, c.id_b
"""
    )
    print(f"# d5_minhash phase C: verify relation built ({time.time() - t0:.1f}s)", flush=True)
    return con, rel


# --------------------------------------------------------------------------
# mb1_frequent_pairs
# --------------------------------------------------------------------------


def oracle_mb1(sf_dir: str, scratch: str, n_chunks: int):
    fitems_path = os.path.join(scratch, "fitems.parquet")
    freq_path = os.path.join(scratch, "freq.parquet")
    n_path = os.path.join(scratch, "n.parquet")
    t0 = time.time()
    con = _fresh_con(sf_dir, scratch)
    con.sql(
        f"""
COPY (
  WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  sup1 AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s
           FROM items GROUP BY 1)
  SELECT l_partkey, s FROM sup1 WHERE s >= {MIN_ITEM_SUPPORT}
) TO '{freq_path}' (FORMAT PARQUET)
"""
    )
    con.sql(
        f"""
COPY (
  WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  SELECT i.l_orderkey, i.l_partkey
  FROM items i JOIN '{freq_path}' f ON f.l_partkey = i.l_partkey
) TO '{fitems_path}' (FORMAT PARQUET)
"""
    )
    con.sql(
        f"""
COPY (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
) TO '{n_path}' (FORMAT PARQUET)
"""
    )
    con.close()
    print(f"# mb1 phase A: fitems/freq/n landed ({time.time() - t0:.1f}s)", flush=True)

    n_fi = 0
    try:
        import pyarrow.parquet as pq

        n_fi = pq.read_metadata(fitems_path).num_rows
    except Exception:  # noqa: BLE001
        pass
    # pair fan-out ~ Sigma k_i^2 / baskets; 64 B/agg-row spill estimate with
    # a x8 expansion guess keeps chunks comfortably bounded
    chunks = n_chunks or _auto_chunks(n_fi * 8, 64)
    bounds = _chunk_bounds(sf_dir, "lineitem", "l_partkey", chunks)
    pairs_dir = os.path.join(scratch, "pairs")
    os.makedirs(pairs_dir, exist_ok=True)
    print(f"# mb1 phase B: {len(bounds)} pair chunks", flush=True)
    for i, (lo, hi) in enumerate(bounds):
        t0 = time.time()
        con = _fresh_con(sf_dir, scratch)
        con.sql(
            f"""
COPY (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM '{fitems_path}' a JOIN '{fitems_path}' b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey >= {lo} AND a.l_partkey < {hi}
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
) TO '{pairs_dir}/part_{i:04d}.parquet' (FORMAT PARQUET)
"""
        )
        con.close()
        print(f"#   chunk {i + 1}/{len(bounds)} ({time.time() - t0:.1f}s)", flush=True)

    con = _fresh_con(sf_dir, scratch)
    return con, con.sql(
        f"""
SELECT p.p1, p.p2, p.support,
       ROUND(CAST(p.support AS DOUBLE) * n.n_orders / (f1.s * f2.s),
             {ROUND_DIGITS}) AS lift
FROM read_parquet('{pairs_dir}/*.parquet') p
JOIN '{freq_path}' f1 ON f1.l_partkey = p.p1
JOIN '{freq_path}' f2 ON f2.l_partkey = p.p2
CROSS JOIN '{n_path}' n
ORDER BY p.support DESC, p.p1, p.p2
"""
    )


ORACLES = {
    "d5_minhash_lsh_pairs": oracle_d5_minhash,
    "mb1_frequent_pairs": oracle_mb1,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", choices=sorted(ORACLES))
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument(
        "--chunks",
        type=int,
        default=0,
        help="chunk count override (default: free-scratch probe)",
    )
    args = ap.parse_args()
    sf_dir = checkmod.resolve_sf(args.sf)
    print(f"# chunked full oracle at {sf_dir}", flush=True)

    import re

    from nba_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    m = re.search(r"sf(\d+)$", sf_dir)
    decade = int(m.group(1)) if m else 0
    if decade >= 30 and not os.environ.get("SPARK_DRIVER_MEMORY"):
        os.environ["SPARK_DRIVER_MEMORY"] = "48g"
    extra = {"spark.io.compression.codec": "zstd"} if decade >= 30 else {}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        (os.cpu_count() or 8) if decade >= 10 else 8
    )
    spark = get_spark("chunked_oracle", cpus=cpus, extra_conf=extra)
    qs = entrymod.queries()

    failed = []
    for name in args.names:
        scratch = tempfile.mkdtemp(prefix=f"chunked_oracle_{name}_")
        atexit.register(shutil.rmtree, scratch, ignore_errors=True)
        t0 = time.time()
        con = None
        try:
            sdf = qs[name](spark, sf_dir)
            # the final relation is lazy — keep its connection alive until
            # compare() has drained it
            con, rel = ORACLES[name](sf_dir, scratch, args.chunks)
            problems = checkmod.compare(name, sdf, rel)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        finally:
            if con is not None:
                con.close()
        spark.catalog.clearCache()
        shutil.rmtree(scratch, ignore_errors=True)
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} (exact chunked oracle, {time.time() - t0:.1f}s)", flush=True)
        for p in problems:
            print(f"     {p}")
        if problems:
            failed.append(name)
    print(f"\n{len(args.names) - len(failed)}/{len(args.names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
