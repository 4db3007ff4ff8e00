"""Focused tests for the single-task contracted-graph kernels (r11).

Each kernel must be bit-equal to the relational recurrence it replaced —
checked here against brute-force reimplementations of the ORIGINAL
DataFrame algebra (the oracle-side recursive CTEs are the other witness,
exercised by tools/check.py). Graphs are randomized with a fixed seed and
include the degenerate shapes the relational form handled implicitly:
self-contained source, unreachable nodes, absent hub/auth sides, INF
non-propagation.
"""

from __future__ import annotations

import random

import pandas as pd

from nba_data_pipeline_spark.operators.graph_iter import (
    _PR_SCALE,
    bfs_kernel,
    hits_kernel,
    pagerank_kernel,
    sssp_kernel,
)


def _rand_edges(seed: int, n_nodes: int = 25, n_edges: int = 80):
    rng = random.Random(seed)
    seen = set()
    while len(seen) < n_edges:
        u, v = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if u != v:
            seen.add((u, v))
    return sorted(seen)


def test_pagerank_kernel_matches_relational_recurrence():
    for seed in (1, 2, 3):
        edges = _rand_edges(seed)
        df = pd.DataFrame(edges, columns=["u", "v"])
        out = pagerank_kernel(df, rounds=3)
        # reference: the original DataFrame algebra, literally
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        n = len(nodes)
        base = (15 * _PR_SCALE) // (100 * n)
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        pr = {x: _PR_SCALE // n for x in nodes}
        for _ in range(3):
            contrib = {}
            for u, v in edges:
                contrib[v] = contrib.get(v, 0) + (85 * pr[u]) // (100 * deg[u])
            pr = {x: base + contrib.get(x, 0) for x in nodes}
        got = dict(zip(out["n"], out["pr"]))
        assert got == pr


def test_bfs_kernel_matches_frontier_union():
    for seed in (4, 5):
        edges = _rand_edges(seed, n_nodes=30, n_edges=40)
        df = pd.DataFrame(edges, columns=["u", "v"])
        out = bfs_kernel(df, rounds=6)
        # reference: dist ∪ (dist ⋈ sym-edges → lvl+1), MIN-grouped, per round
        sym = set(edges) | {(v, u) for u, v in edges}
        dist = {0: 0}
        for _ in range(6):
            frontier = [(v, dist[u] + 1) for u, v in sym if u in dist]
            for v, lvl in frontier:
                if lvl < dist.get(v, lvl + 1):
                    dist[v] = lvl
        got = dict(zip(out["n"], out["lvl"]))
        assert got == dist
        # the seed row survives even for an isolated source
        lonely = bfs_kernel(pd.DataFrame({"u": [5], "v": [6]}), rounds=3)
        assert dict(zip(lonely["n"], lonely["lvl"]))[0] == 0


def test_sssp_kernel_matches_relaxation_rounds():
    inf = 10**9
    for seed in (6, 7):
        rng = random.Random(seed)
        dedges = [(u, v, rng.randint(1, 9)) for u, v in _rand_edges(seed, 20, 50)]
        # directed MIN-merge (g4 feeds groupBy(u,v).min(w) output)
        dmin = {}
        for u, v, w in dedges:
            dmin[(u, v)] = min(dmin.get((u, v), w), w)
        df = pd.DataFrame(
            [(u, v, w) for (u, v), w in sorted(dmin.items())], columns=["u", "v", "w"]
        )
        out = sssp_kernel(df, rounds=4, inf=inf)
        # reference: symmetrize + MIN, then 4 relaxation rounds
        ew = {}
        for (u, v), w in dmin.items():
            ew[(u, v)] = min(ew.get((u, v), w), w)
            ew[(v, u)] = min(ew.get((v, u), w), w)
        nodes = sorted({u for u, _ in ew})
        dist = {x: (0 if x == 0 else inf) for x in nodes}
        for _ in range(4):
            best = {}
            for (u, v), w in ew.items():
                if dist[u] < inf:
                    best[v] = min(best.get(v, inf), dist[u] + w)
            dist = {x: min(dist[x], best.get(x, inf)) for x in nodes}
        got = dict(zip(out["n"], out["dist"]))
        assert got == dist


def test_hits_kernel_matches_half_steps():
    for seed in (8, 9):
        edges = _rand_edges(seed)
        df = pd.DataFrame(edges, columns=["u", "v"])
        out = hits_kernel(df)
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        h1 = {}
        for u, _ in edges:
            h1[u] = h1.get(u, 0) + 1
        a1 = {}
        for u, v in edges:
            a1[v] = a1.get(v, 0) + h1[u]
        h2 = {}
        for u, v in edges:
            h2[u] = h2.get(u, 0) + a1[v]
        a2 = {}
        for u, v in edges:
            a2[v] = a2.get(v, 0) + h2[u]
        assert dict(zip(out["n"], out["hub_score"])) == {
            n: h2.get(n, 0) for n in nodes
        }
        assert dict(zip(out["n"], out["auth_score"])) == {
            n: a2.get(n, 0) for n in nodes
        }


def test_kernels_empty_input():
    empty = pd.DataFrame()
    assert pagerank_kernel(empty).empty
    assert hits_kernel(empty).empty
    assert sssp_kernel(empty, rounds=4, inf=10**9).empty
    bfs = bfs_kernel(empty, rounds=6)
    # BFS seeds the source unconditionally, like the createDataFrame seed row
    assert dict(zip(bfs["n"], bfs["lvl"])) == {0: 0}
