"""Single-task kernels for fixpoint iteration on DIMENSION-BOUNDED graphs.

The G-family nation-graph queries (g1 PageRank, g3 BFS, g4 Bellman-Ford,
g8 HITS) all share one shape: an expensive, fully distributed fact⋈fact
edge-mining join contracts the data to a nation-pair edge list (≤ |nation|²
= 625 rows BY CONSTRUCTION, at any scale factor — nation is a fixed
dimension), and a handful of unrolled algebraic rounds then iterate on that
summary. Expressed relationally, every round costs ~3 driver-sequential
scheduler round-trips (broadcast build + join + aggregate on ≤25-row
frames): pure fixed machinery, ~1.5-2 s per query at sf0.1 and *invariant
in data size* — the same overhead would remain at 100 TB while the mining
join grows to dominate.

These kernels fold the whole iteration into ONE ``mapInPandas`` task over
the contracted edge list (guide §1.2 step 1: remove passes; same idiom as
``operators.graph.connected_components``' single-task finishing round).
The mining stays distributed; only the dimension-sized fixpoint — which a
single task bounds regardless of SF — moves into the kernel. NOT for
graphs whose contracted form grows with the data (g2/g5/g6/g7/g9 part
graphs keep their distributed rounds).

Exactness: every kernel reproduces the relational recurrence in exact
integer arithmetic (Python ints; all operands non-negative, so Python ``//``
floor-division equals Spark's truncating ``div``), bit-equal to both the
previous DataFrame form and the DuckDB oracle's recursive CTEs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "fold_contracted",
    "pagerank_kernel",
    "bfs_kernel",
    "sssp_kernel",
    "hits_kernel",
]


def fold_contracted(
    edges: DataFrame, kernel: Callable[[pd.DataFrame], pd.DataFrame], schema: str
) -> DataFrame:
    """Run ``kernel`` (a pure pandas→pandas fixpoint) in one task over the
    contracted edge list. ``coalesce(1)`` only folds the post-shuffle tail
    of the mining plan (the final ≤625-row aggregate), never the wide join
    stages above the exchange."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        df = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame()
        )
        yield kernel(df)

    return edges.coalesce(1).mapInPandas(run, schema)


_PR_SCALE = 1_000_000_000_000


def pagerank_kernel(edges: pd.DataFrame, rounds: int = 3) -> pd.DataFrame:
    """g1 recurrence on directed distinct (u, v): integer-exact damped
    PageRank, scores in units of 1e-12. nodes = endpoints(edges);
    pr0 = SCALE // N; pr_{t+1}(n) = (15*SCALE)//(100*N)
    + Σ_{(u,n)} (85*pr_t(u)) // (100*outdeg(u))."""
    if edges.empty:
        return pd.DataFrame({"n": pd.Series(dtype="int64"), "pr": pd.Series(dtype="int64")})
    us = [int(x) for x in edges["u"]]
    vs = [int(x) for x in edges["v"]]
    nodes = sorted(set(us) | set(vs))
    n_nodes = len(nodes)
    base = (15 * _PR_SCALE) // (100 * n_nodes)
    deg: dict[int, int] = {}
    for u in us:
        deg[u] = deg.get(u, 0) + 1
    pr = {n: _PR_SCALE // n_nodes for n in nodes}
    for _ in range(rounds):
        contrib: dict[int, int] = {}
        for u, v in zip(us, vs):
            contrib[v] = contrib.get(v, 0) + (85 * pr[u]) // (100 * deg[u])
        pr = {n: base + contrib.get(n, 0) for n in nodes}
    return pd.DataFrame({"n": nodes, "pr": [pr[n] for n in nodes]}).astype("int64")


def bfs_kernel(edir: pd.DataFrame, rounds: int, source: int = 0) -> pd.DataFrame:
    """g3 recurrence on directed distinct (u, v), symmetrized here:
    dist0 = {source: 0}; each round dist_{t+1}(n) = min(dist_t(n),
    min over in-edges (u,n), u reached, of dist_t(u) + 1). Unreached
    nodes stay absent, exactly like the relational frontier union."""
    sym: set[tuple[int, int]] = set()
    for u, v in zip(edir.get("u", ()), edir.get("v", ())):
        u, v = int(u), int(v)
        sym.add((u, v))
        sym.add((v, u))
    dist = {source: 0}
    for _ in range(rounds):
        new = dict(dist)
        for u, v in sym:
            if u in dist:
                cand = dist[u] + 1
                if cand < new.get(v, cand + 1):
                    new[v] = cand
        dist = new
    ns = sorted(dist)
    return pd.DataFrame(
        {"n": pd.Series(ns, dtype="int64"), "lvl": pd.Series([dist[n] for n in ns], dtype="int32")}
    )


def sssp_kernel(dedges: pd.DataFrame, rounds: int, inf: int, source: int = 0) -> pd.DataFrame:
    """g4 recurrence on directed MIN-weighted (u, v, w), symmetrized +
    MIN-merged here: dist0(source)=0 else INF over nodes = endpoints;
    each round dist_{t+1}(n) = least(dist_t(n), min over edges (u,n) with
    dist_t(u) < INF of dist_t(u) + w)."""
    ew: dict[tuple[int, int], int] = {}
    for u, v, w in zip(dedges.get("u", ()), dedges.get("v", ()), dedges.get("w", ())):
        u, v, w = int(u), int(v), int(w)
        for key in ((u, v), (v, u)):
            if w < ew.get(key, w + 1):
                ew[key] = w
    nodes = sorted({u for u, _ in ew})
    dist = {n: (0 if n == source else inf) for n in nodes}
    for _ in range(rounds):
        best: dict[int, int] = {}
        for (u, v), w in ew.items():
            if dist[u] < inf:
                cand = dist[u] + w
                if cand < best.get(v, cand + 1):
                    best[v] = cand
        dist = {n: min(dist[n], best.get(n, inf)) for n in nodes}
    return pd.DataFrame(
        {"n": pd.Series(nodes, dtype="int64"), "dist": pd.Series([dist[n] for n in nodes], dtype="int64")}
    )


def hits_kernel(edges: pd.DataFrame) -> pd.DataFrame:
    """g8 recurrence on directed distinct (u, v): unnormalized integer
    HITS, two full mutual-reinforcement rounds. h1 = outdeg;
    a1(v) = Σ_in h1; h2(u) = Σ_out a1; a2(v) = Σ_in h2; absent → 0."""
    us = [int(x) for x in edges.get("u", ())]
    vs = [int(x) for x in edges.get("v", ())]
    nodes = sorted(set(us) | set(vs))
    h1: dict[int, int] = {}
    for u in us:
        h1[u] = h1.get(u, 0) + 1
    a1: dict[int, int] = {}
    for u, v in zip(us, vs):
        a1[v] = a1.get(v, 0) + h1[u]
    h2: dict[int, int] = {}
    for u, v in zip(us, vs):
        h2[u] = h2.get(u, 0) + a1[v]
    a2: dict[int, int] = {}
    for u, v in zip(us, vs):
        a2[v] = a2.get(v, 0) + h2[u]
    return pd.DataFrame(
        {
            "n": pd.Series(nodes, dtype="int64"),
            "hub_score": pd.Series([h2.get(n, 0) for n in nodes], dtype="int64"),
            "auth_score": pd.Series([a2.get(n, 0) for n in nodes], dtype="int64"),
        }
    )
