"""Borůvka MSF vs a pure-Python Kruskal union-find with the identical
(weight, a, b) tie-break — independent of both Spark and the DuckDB twin."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.msf import minimum_spanning_forest


def _kruskal(pairs):
    """pairs: iterable of (a, b, w) canonical a<b unique. Returns the MSF
    under the strict total order (w, a, b)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, a, b in sorted((w, a, b) for a, b, w in pairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            forest.append((a, b, w))
    return sorted(forest)


def _canon(pairs_raw):
    """Canonicalize raw (src, dst, w): drop loops, min-w per pair."""
    best: dict[tuple[int, int], float] = {}
    for s, d, w in pairs_raw:
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        if k not in best or w < best[k]:
            best[k] = w
    return [(a, b, w) for (a, b), w in best.items()]


def _run(spark, pairs_raw):
    edges = spark.createDataFrame(
        pairs_raw, "src long, dst long, weight double"
    )
    res = minimum_spanning_forest(edges)
    got = sorted(
        (int(r["a"]), int(r["b"]), float(r["weight"]))
        for r in res.forest.collect()
    )
    want = _kruskal(_canon(pairs_raw))
    assert got == want
    assert res.num_edges == len(want)
    assert abs(res.total_weight - sum(w for _, _, w in want)) < 1e-9
    return res


def test_msf_matches_kruskal_random(spark):
    rng = np.random.default_rng(7)
    raw = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.integers(0, 60, size=(300, 2)), rng.random(300)
        )
    ]
    res = _run(spark, raw)
    assert res.rounds <= 7  # O(log V) contraction


def test_msf_duplicate_weights_deterministic(spark):
    # every edge weight 1.0: forest decided purely by the (a, b) tie-break
    rng = np.random.default_rng(13)
    raw = [
        (int(a), int(b), 1.0) for a, b in rng.integers(0, 25, size=(80, 2))
    ]
    _run(spark, raw)


def test_msf_disconnected_and_parallel_edges(spark):
    raw = [
        (0, 1, 5.0),
        (1, 0, 2.0),  # parallel, lighter — must win
        (1, 2, 1.0),
        (0, 2, 9.0),  # cycle-closing, heaviest — must be excluded
        (3, 3, 0.1),  # self-loop ignored
        (4, 5, 7.0),  # separate component
    ]
    res = _run(spark, raw)
    got = sorted(
        (int(r["a"]), int(r["b"]), float(r["weight"]))
        for r in res.forest.collect()
    )
    assert got == [(0, 1, 2.0), (1, 2, 1.0), (4, 5, 7.0)]


def test_msf_path_graph_chain_contraction(spark):
    # increasing weights along a path: pointer chains are longest here —
    # exercises the pointer-doubling resolve
    n = 64
    raw = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    res = _run(spark, raw)
    assert res.num_edges == n - 1  # a path IS its own MSF


def test_msf_fixed_rounds_prefix(spark):
    # fixed_rounds=1 returns exactly each component's round-1 choices,
    # a subset of the full forest
    rng = np.random.default_rng(3)
    raw = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.integers(0, 30, size=(90, 2)), rng.random(90)
        )
    ]
    edges = spark.createDataFrame(raw, "src long, dst long, weight double")
    r1 = minimum_spanning_forest(edges, fixed_rounds=1)
    full = {
        (int(r["a"]), int(r["b"])) for r in _run(spark, raw).forest.collect()
    }
    got1 = {(int(r["a"]), int(r["b"])) for r in r1.forest.collect()}
    assert got1 <= full and len(got1) >= 1
