"""Horizon-bounded sampled-source betweenness vs an exact python Brandes
twin with the same horizon/source semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.betweenness import betweenness_sampled


def _python_betweenness(pairs, n, sources, max_depth):
    adj: dict[int, list[int]] = {v: [] for v in range(n)}
    for a, b in sorted(set(pairs)):
        if a != b:
            adj[a].append(b)
    bc = {v: 0.0 for v in range(n)}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for depth in range(1, max_depth + 1):
            nxt: dict[int, int] = {}
            for v in levels[depth - 1]:
                for w in adj[v]:
                    if w in dist and dist[w] < depth:
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[v]
            fresh = [w for w in nxt if w not in dist]
            for w in fresh:
                dist[w] = depth
                sigma[w] = nxt[w]
            levels.append(fresh)
            if not fresh:
                levels[depth] = []
        delta = {v: 0.0 for v in dist}
        for depth in range(max_depth, 0, -1):
            for v in [u for u in dist if dist[u] == depth - 1]:
                for w in adj[v]:
                    if dist.get(w) == depth:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, d in delta.items():
            if v != s:
                bc[v] += d
    return bc


def test_betweenness_matches_python_twin(spark):
    rng = np.random.default_rng(91)
    n = 40
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (160, 2))
                    if a != b})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    sources = [0, 1, 2, 5]
    got = {
        r["vertex_id"]: r["betweenness"]
        for r in betweenness_sampled(
            edges, verts, sources, max_depth=4
        ).collect()
    }
    exp = _python_betweenness(pairs, n, sources, max_depth=4)
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


def test_betweenness_path_structure(spark):
    """On a directed path s -> a -> b -> t from one source: interior
    vertices carry the classic dependency values, endpoints zero."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    verts = spark.range(4).select(F.col("id").alias("vertex_id"))
    got = {
        r["vertex_id"]: r["betweenness"]
        for r in betweenness_sampled(edges, verts, [0], max_depth=4).collect()
    }
    # delta(1) = 1 + delta(2) = 2; delta(2) = 1 + delta(3) = 1; source excluded
    assert got[0] == 0.0
    assert got[1] == pytest.approx(2.0)
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(0.0)

    # horizon bound: with max_depth=1 only direct neighbors are reached,
    # no interior dependencies accumulate
    got1 = {
        r["vertex_id"]: r["betweenness"]
        for r in betweenness_sampled(edges, verts, [0], max_depth=1).collect()
    }
    assert all(v == 0.0 for v in got1.values())

    with pytest.raises(ValueError, match="sources"):
        betweenness_sampled(edges, verts, [])
    with pytest.raises(ValueError, match="max_depth"):
        betweenness_sampled(edges, verts, [0], max_depth=0)
