"""Greedy coloring: validity (proper coloring), greedy bound, python
priority-twin replay, fixed-round semantics."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.coloring import greedy_coloring


def _ph(*vals, seed):
    s = "\x1f".join([str(v) for v in vals] + [str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_coloring(pairs, n, seed, rounds=None):
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color: dict[int, int | None] = {v: None for v in range(n)}
    r = 0
    while any(c is None for c in color.values()):
        if rounds is not None and r >= rounds:
            break
        prio = {v: (_ph(v, seed=seed + 131 * r), v) for v in range(n)}
        nxt = dict(color)
        for v in range(n):
            if color[v] is not None:
                continue
            unc = [u for u in adj[v] if color[u] is None]
            if all(prio[v] > prio[u] for u in unc):
                used = sorted({color[u] for u in adj[v] if color[u] is not None})
                mex = 0
                for c in used:
                    if c == mex:
                        mex += 1
                nxt[v] = mex
        color = nxt
        r += 1
    return color


def test_coloring_valid_and_matches_python_twin(spark):
    rng = np.random.default_rng(17)
    n = 40
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (180, 2))
                    if a != b})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = {
        r["vertex_id"]: r["color"]
        for r in greedy_coloring(
            edges, verts, seed=7, hash_method="portable"
        ).collect()
    }
    # a proper coloring: no edge joins equal colors
    for a, b in pairs:
        assert got[a] != got[b], (a, b)
    # greedy bound: colors <= max degree + 1
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert max(got.values()) <= max(deg.values())
    # identical to the python replay of the same priority schedule
    assert got == _python_coloring(pairs, n, seed=7)

    # fixed-round prefix equals the python replay's prefix (NULLs allowed)
    got2 = {
        r["vertex_id"]: r["color"]
        for r in greedy_coloring(
            edges, verts, seed=7, hash_method="portable", fixed_rounds=2
        ).collect()
    }
    assert got2 == _python_coloring(pairs, n, seed=7, rounds=2)


def test_coloring_structures(spark):
    # triangle needs 3 colors; star needs 2; isolated vertex colors 0
    tri = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    v4 = spark.range(4).select(F.col("id").alias("vertex_id"))
    got = {
        r["vertex_id"]: r["color"]
        for r in greedy_coloring(tri, v4).collect()
    }
    assert sorted(got[v] for v in range(3)) == [0, 1, 2]
    assert got[3] == 0  # isolated

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    v6 = spark.range(6).select(F.col("id").alias("vertex_id"))
    gs = {
        r["vertex_id"]: r["color"]
        for r in greedy_coloring(star, v6).collect()
    }
    assert max(gs.values()) <= 1
