"""Derive a larger scale factor from the driver-generated sf0.1 parquet by
K-way tiling with consistent key offsets — TPC-H-dbgen-style scaling so the
heavy catalog families can be MEASURED above sf0.1 (VERDICT r3 item 4: the
100 TB design claims need at least one sf1 execution, not just plan audits).

Key discipline: every replica k shifts each table's surrogate keys by
k * (max_key + 1), applied consistently across fact/dim pairs so FK joins
keep exactly the sf0.1 fan-out (orders⋈customer, lineitem⋈supplier, ...).
Dimension tables nation/region are NOT tiled (they're fixed-cardinality).

Content discipline: replicas must NOT be near-duplicates of each other —
a naive 10× tiling gives every document ten exact copies and turns the
near-dup benchmarks into a quadratic pair-explosion benchmark. Replica
k > 0 rewrites every 3rd word of each text (≥1/3 of shingles differ, so
cross-replica Jaccard lands ≈0.5, far below the 0.8-class thresholds) and
rolls+perturbs each embedding (cosine to the original ≈ random), keeping
within-replica duplicate structure identical to sf0.1.

Usage: python tools/make_sf_scaled.py [K] [out_dir] [--tables t1,t2,...]
       (defaults: K=10, out_dir=<repo>/sf_scaled/sf1, all tables)

--tables tiles a SUBSET (fixed dims region/nation are always written):
at deep decades the full set outgrows a single box's disk (sf300 ≈ 52 GB
on a 58 GB-free box), so the scale probes tile phase-wise — the tables a
probe batch reads, run it, swap in the next batch. Key-offset discipline
is per-table deterministic, so separately-tiled tables still join with
exactly the sf0.1 fan-out.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _offset(col: pa.ChunkedArray, k: int, base: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(k * base, type=col.type))


def _mutate_text(text: str, k: int) -> str:
    words = text.split(" ")
    for i in range(0, len(words), 3):
        words[i] = f"{words[i]}r{k}"
    return " ".join(words)


ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def scale(
    src: str, out_dir: str, K: int, tables: "list[str] | None" = None
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    want = set(tables or ALL_TABLES)
    unknown = want - set(ALL_TABLES)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    t = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in ALL_TABLES
        # key-offset bases come from max keys, which need the key COLUMN of
        # every base table regardless of selection — cheap at sf0.1 source
    }
    base = {
        "cust": int(pc.max(t["customer"]["c_custkey"]).as_py()) + 1,
        "supp": int(pc.max(t["supplier"]["s_suppkey"]).as_py()) + 1,
        "part": int(pc.max(t["part"]["p_partkey"]).as_py()) + 1,
        "order": int(pc.max(t["orders"]["o_orderkey"]).as_py()) + 1,
        "event": int(pc.max(t["events"]["event_id"]).as_py()) + 1,
        "doc": int(pc.max(t["documents"]["doc_id"]).as_py()) + 1,
        "vec": int(pc.max(t["embeddings"]["vec_id"]).as_py()) + 1,
    }

    # fixed dimensions: straight copies (always — they're 4 KB each and
    # every probe's oracle view registration expects all ten files)
    for name in ("region", "nation"):
        pq.write_table(t[name], os.path.join(out_dir, f"{name}.parquet"))

    def tile(name: str, shift) -> None:
        if name not in want:
            return
        # stream one replica at a time through a ParquetWriter: buffering
        # all K replicas then concat_tables OOMs past K≈300 on the fact
        # tables (K=1000 would hold ~100 GB of lineitem Arrow buffers)
        path = os.path.join(out_dir, f"{name}.parquet")
        with pq.ParquetWriter(path, t[name].schema) as w:
            for k in range(K):
                tbl = t[name]
                for col, b in shift:
                    idx = tbl.schema.get_field_index(col)
                    tbl = tbl.set_column(idx, col, _offset(tbl[col], k, base[b]))
                w.write_table(tbl)

    tile("customer", [("c_custkey", "cust")])
    tile("supplier", [("s_suppkey", "supp")])
    tile("part", [("p_partkey", "part")])
    tile("orders", [("o_orderkey", "order"), ("o_custkey", "cust")])
    tile(
        "lineitem",
        [("l_orderkey", "order"), ("l_suppkey", "supp"), ("l_partkey", "part")],
    )
    tile("events", [("event_id", "event"), ("user_id", "cust")])

    def tile_documents() -> None:
        # offset ids + mutate replica text so replicas aren't near-dups
        docs = t["documents"]
        texts = docs["text"].to_pylist()
        with pq.ParquetWriter(
            os.path.join(out_dir, "documents.parquet"), docs.schema
        ) as w:
            for k in range(K):
                tbl = docs.set_column(
                    docs.schema.get_field_index("doc_id"),
                    "doc_id",
                    _offset(docs["doc_id"], k, base["doc"]),
                )
                if k > 0:
                    mutated = [_mutate_text(s, k) for s in texts]
                    tbl = tbl.set_column(
                        tbl.schema.get_field_index("text"),
                        "text",
                        pa.chunked_array(
                            [pa.array(mutated, type=docs["text"].type)]
                        ),
                    )
                    if "n_chars" in tbl.schema.names:
                        tbl = tbl.set_column(
                            tbl.schema.get_field_index("n_chars"),
                            "n_chars",
                            pa.chunked_array(
                                [
                                    pa.array(
                                        [len(s) for s in mutated],
                                        type=docs["n_chars"].type,
                                    )
                                ]
                            ),
                        )
                w.write_table(tbl)

    def tile_embeddings() -> None:
        # offset ids; replica k rolls each vector by 7k dims and adds
        # seeded noise — cosine(original, replica) ≈ random, norms kept
        emb = t["embeddings"]
        vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
        with pq.ParquetWriter(
            os.path.join(out_dir, "embeddings.parquet"), emb.schema
        ) as w:
            for k in range(K):
                tbl = emb.set_column(
                    emb.schema.get_field_index("vec_id"),
                    "vec_id",
                    _offset(emb["vec_id"], k, base["vec"]),
                )
                if k > 0:
                    rng = np.random.default_rng(k)
                    v = np.roll(vecs, 7 * k, axis=1) + rng.normal(
                        0.0, vecs.std() * 0.5, size=vecs.shape
                    )
                    tbl = tbl.set_column(
                        tbl.schema.get_field_index("embedding"),
                        "embedding",
                        pa.chunked_array(
                            [pa.array(list(v), type=emb["embedding"].type)]
                        ),
                    )
                w.write_table(tbl)

    if "documents" in want:
        tile_documents()
    if "embeddings" in want:
        tile_embeddings()
    done = sorted(want | {"region", "nation"})
    print(f"wrote {K}x tiling of {src} to {out_dir}: {', '.join(done)}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    tables = None
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = [s for s in argv[i + 1].split(",") if s]
        argv = argv[:i] + argv[i + 2 :]
    K = int(argv[0]) if len(argv) > 0 else 10
    out = (
        argv[1]
        if len(argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "sf_scaled",
            "sf1",
        )
    )
    scale(SRC, out, K, tables)
