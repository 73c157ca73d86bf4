"""Forman–Ricci curvature and local Jaccard sparsification.

Hand-checkable goldens on a K3-plus-pendant graph, a clique-positivity /
bridge-negativity structure test, brute-force python twins on a seeded
random graph, and the sparsifier's union-keep / quota semantics.
"""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.curvature import (
    forman_curvature,
    forman_vertex_curvature,
)
from halvesting_geometric_spark.operators.sparsify import local_jaccard_sparsify


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _verts_df(spark, n):
    return spark.createDataFrame([(int(v),) for v in range(n)], "vertex_id long")


# K3 on {0,1,2} plus pendant 3 attached to 0
K3_PENDANT = [(0, 1), (0, 2), (1, 2), (0, 3)]


def test_forman_k3_pendant_goldens(spark):
    fc = {
        (r.src, r.dst): (r.support, r.deg_src, r.deg_dst, r.curvature)
        for r in forman_curvature(_edges_df(spark, K3_PENDANT)).collect()
    }
    # deg: 0->3, 1->2, 2->2, 3->1
    assert fc[(0, 1)] == (1, 3, 2, 4 - 3 - 2 + 3)
    assert fc[(0, 2)] == (1, 3, 2, 2)
    assert fc[(1, 2)] == (1, 2, 2, 3)
    assert fc[(0, 3)] == (0, 3, 1, 0)


def test_forman_vertex_sums_and_isolated(spark):
    vc = {
        r.vertex_id: (r.degree, r.curvature)
        for r in forman_vertex_curvature(
            _edges_df(spark, K3_PENDANT), _verts_df(spark, 5)
        ).collect()
    }
    # vertex 0 touches edges (0,1)=2, (0,2)=2, (0,3)=0 -> 4
    assert vc[0] == (3, 4)
    assert vc[1] == (2, 2 + 3)
    assert vc[2] == (2, 2 + 3)
    assert vc[3] == (1, 0)
    assert vc[4] == (0, 0)  # isolated vertex present in the vertex table


def test_forman_clique_positive_bridge_negative(spark):
    # two K4s joined by one bridge: intra-clique edges are positive,
    # the bridge is the unique minimum (strongly negative)
    k4a = list(itertools.combinations(range(4), 2))
    k4b = list(itertools.combinations(range(4, 8), 2))
    bridge = [(0, 4)]
    fc = forman_curvature(_edges_df(spark, k4a + k4b + bridge)).collect()
    by_edge = {(r.src, r.dst): r.curvature for r in fc}
    # K4 edge between two degree-3 vertices with support 2: 4-3-3+6 = 4
    assert by_edge[(1, 2)] == 4
    # bridge: deg 4 and 4, support 0: 4-4-4 = -4, unique minimum
    assert by_edge[(0, 4)] == -4
    assert min(by_edge.values()) == -4
    assert sorted(by_edge.values())[1] > -4


def _python_forman(pairs):
    """Brute-force twin: adjacency sets over the simple undirected graph."""
    adj: dict[int, set[int]] = {}
    canon = set()
    for a, b in pairs:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        canon.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for u, v in canon:
        t = len(adj[u] & adj[v])
        out[(u, v)] = 4 - len(adj[u]) - len(adj[v]) + 3 * t
    return out


def test_forman_random_vs_python_twin(spark):
    rng = random.Random(7)
    pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(150)}
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _python_forman(pairs)
    got = {
        (r.src, r.dst): r.curvature
        for r in forman_curvature(_edges_df(spark, pairs)).collect()
    }
    assert got == want


def _python_sparsify(pairs, alpha=0.5):
    adj: dict[int, set[int]] = {}
    canon = set()
    for a, b in pairs:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        canon.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    sim = {}
    for u, v in canon:
        s = len(adj[u] & adj[v])
        union = len(adj[u]) + len(adj[v]) - s
        sim[(u, v)] = math.floor(s * 1_000_000.0 / union + 0.5)
    keep = set()
    for v, nbrs in adj.items():
        k = math.ceil(math.sqrt(len(nbrs))) if alpha == 0.5 else math.ceil(
            len(nbrs) ** alpha
        )
        ranked = sorted(
            nbrs, key=lambda o: (-sim[(min(v, o), max(v, o))], o)
        )[:k]
        keep |= {(min(v, o), max(v, o)) for o in ranked}
    return {e: sim[e] for e in keep}


def test_sparsify_random_vs_python_twin(spark):
    rng = random.Random(11)
    pairs = {(rng.randrange(40), rng.randrange(40)) for _ in range(300)}
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _python_sparsify(pairs)
    got = {
        (r.src, r.dst): r.jaccard_e6
        for r in local_jaccard_sparsify(_edges_df(spark, pairs)).collect()
    }
    assert got == want


def test_sparsify_union_keeps_leaf_edges(spark):
    # star center 0 with leaves 1..5 plus triangle 1-2 edge: every leaf has
    # quota 1, so every star edge survives via its leaf endpoint even though
    # the center (deg 5, quota ceil(sqrt(5)) = 3) would drop two of them
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    kept = {
        (r.src, r.dst)
        for r in local_jaccard_sparsify(_edges_df(spark, star)).collect()
    }
    assert {(0, i) for i in range(1, 6)} <= kept


def test_sparsify_alpha_one_keeps_everything(spark):
    rng = random.Random(3)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    canon = {(min(a, b), max(a, b)) for a, b in pairs}
    kept = {
        (r.src, r.dst)
        for r in local_jaccard_sparsify(
            _edges_df(spark, pairs), alpha=1.0
        ).collect()
    }
    assert kept == canon


def test_sparsify_alpha_validation(spark):
    with pytest.raises(ValueError):
        local_jaccard_sparsify(_edges_df(spark, K3_PENDANT), alpha=0.0)
    with pytest.raises(ValueError):
        local_jaccard_sparsify(_edges_df(spark, K3_PENDANT), alpha=1.5)


def test_sparsify_prunes_hub_noise(spark):
    # two K5 communities bridged through a shared hub wired to everything:
    # sparsification keeps the intra-community structure connected while
    # pruning a strict subset of the hub's spokes
    k5a = list(itertools.combinations(range(5), 2))
    k5b = list(itertools.combinations(range(5, 10), 2))
    hub = [(10, i) for i in range(10)]
    res = local_jaccard_sparsify(_edges_df(spark, k5a + k5b + hub))
    kept = {(r.src, r.dst) for r in res.collect()}

    def _connected(vs):
        parent = {v: v for v in vs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in kept:
            if a in parent and b in parent:
                parent[find(a)] = find(b)
        return len({find(v) for v in vs}) == 1

    assert _connected(set(range(5)))
    assert _connected(set(range(5, 10)))
    hub_kept = {e for e in kept if 10 in e}
    assert 0 < len(hub_kept) < len(hub)
