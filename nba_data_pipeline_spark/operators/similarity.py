"""Similarity-search operators over embedding columns (north-star:
approximate nearest neighbor at 100 TB).

Layers:
  * exact cosine via a left-to-right double fold (zip_with + aggregate) —
    verified bit-identical to DuckDB's list_dot_product, so ANN results can
    be oracle-checked value-for-value;
  * hyperplane LSH bucketing (deterministic md5-parity hyperplanes) — the
    blocking structure that turns all-pairs into an equi-join;
  * IVF-style partitioning: assign vectors to their nearest seed centroid;
    probe only the query's cell.

At 100 TB the brute-force path is the per-bucket/per-cell verifier, never
the global plan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double; deterministic across engines
    (matches DuckDB list_dot_product on DOUBLE[])."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def hyperplane_weights(h: int, dim: int) -> Column:
    """Deterministic ±1 hyperplane ``h``: weight_d = +1 iff the first hex
    nibble of md5('h_d') has its high bit set. Reproducible in any engine
    with md5 — and computable at PLAN TIME: the weights are constants, so
    they're hashed once here in Python and emitted as an array literal
    (the expression-tree form re-ran dim×planes md5s per row)."""
    import hashlib

    weights = [
        1.0
        if hashlib.md5(f"{h}_{d}".encode()).hexdigest()[0] >= "8"
        else -1.0
        for d in range(1, dim + 1)
    ]
    return F.array(*[F.lit(w) for w in weights])


def sql_hyperplane_weights(h: int) -> str:
    """DuckDB twin of hyperplane_weights (dim from the vector itself)."""
    return (
        "list_transform(range(1, len(embedding) + 1), "
        f"d -> CASE WHEN substring(md5(concat('{h}_', CAST(d AS VARCHAR))), 1, 1) >= '8' "
        "THEN 1.0 ELSE -1.0 END)"
    )


def lsh_bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """Bucket id: concatenated sign bits of the vector against each
    hyperplane."""
    bits = [
        F.when(dot(vec, hyperplane_weights(h, dim)) > 0, "1").otherwise("0")
        for h in range(num_planes)
    ]
    return F.concat(*bits)
