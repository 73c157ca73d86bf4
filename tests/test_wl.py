"""WL refinement: python md5-twin replay + structural invariants
(isomorphic graphs get identical histograms; asymmetric vertices split)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.wl import wl_histogram, wl_refinement


def _ph(*vals, seed):
    s = "\x1f".join([str(v) for v in vals] + [str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_wl(pairs, n, rounds, seed):
    inn: dict[int, list[int]] = {v: [] for v in range(n)}
    for a, b in sorted(set(pairs)):
        inn[b].append(a)
    colors = {v: 0 for v in range(n)}
    for _ in range(rounds):
        nxt = {}
        for v in range(n):
            ms = ",".join(str(c) for c in sorted(colors[u] for u in inn[v]))
            nxt[v] = _ph(colors[v], ms, seed=seed)
        colors = nxt
    return colors


def test_wl_matches_python_md5_twin(spark):
    rng = np.random.default_rng(53)
    n = 25
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (90, 2))})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = {
        r["vertex_id"]: r["color"]
        for r in wl_refinement(
            edges, verts, rounds=3, seed=9, hash_method="portable"
        ).collect()
    }
    assert got == _python_wl(pairs, n, 3, 9)


def test_wl_histogram_isomorphism_invariant(spark):
    # same graph under a vertex relabeling -> identical color histograms
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    perm = {0: 10, 1: 23, 2: 7, 3: 41, 4: 5}
    g1 = spark.createDataFrame(pairs, "src long, dst long")
    g2 = spark.createDataFrame(
        [(perm[a], perm[b]) for a, b in pairs], "src long, dst long"
    )
    v1 = spark.range(5).select(F.col("id").alias("vertex_id"))
    v2 = spark.createDataFrame(
        [(v,) for v in perm.values()], "vertex_id long"
    )
    h1 = sorted(
        map(tuple, wl_histogram(wl_refinement(g1, v1, 3)).collect())
    )
    h2 = sorted(
        map(tuple, wl_histogram(wl_refinement(g2, v2, 3)).collect())
    )
    assert h1 == h2
    # in g1 every vertex has in-degree exactly 1, so WL over in-neighborhoods
    # correctly keeps them all one color class
    colors = {
        r["vertex_id"]: r["color"]
        for r in wl_refinement(g1, v1, 3).collect()
    }
    assert len(set(colors.values())) == 1
    # adding one edge breaks the regularity: 4 (now in-deg 2) must split
    g3 = spark.createDataFrame(
        pairs + [(0, 4)], "src long, dst long"
    )
    colors3 = {
        r["vertex_id"]: r["color"]
        for r in wl_refinement(g3, v1, 3).collect()
    }
    assert colors3[4] != colors3[1]
    with pytest.raises(ValueError, match="rounds"):
        wl_refinement(g1, v1, -1)
