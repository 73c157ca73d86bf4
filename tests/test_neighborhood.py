"""Neighborhood function: exact frontier fixpoint vs python BFS closure;
HyperBall HLL sketches vs exact within sketch error."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.neighborhood import (
    neighborhood_function_exact,
    neighborhood_function_hll,
)


def _graph(spark, n=30, m=90, seed=19):
    rng = np.random.default_rng(seed)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    return edges, verts, pairs, n


def _python_nf(pairs, n, max_t):
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in pairs:
        adj[a].add(b)
    reach = {v: {v} for v in range(n)}
    counts = [sum(len(s) for s in reach.values())]
    for _ in range(max_t):
        reach = {
            v: s | set().union(*(reach[w] for w in adj[v]) if adj[v] else [set()])
            for v, s in reach.items()
        }
        counts.append(sum(len(s) for s in reach.values()))
    return counts


def test_neighborhood_function_exact_matches_python(spark):
    edges, verts, pairs, n = _graph(spark)
    got = (
        neighborhood_function_exact(edges, verts, max_t=6)
        .toPandas()
        .sort_values("t")["n_pairs"]
        .tolist()
    )
    assert got == _python_nf(pairs, n, 6)


def test_neighborhood_function_exact_fixpoint_padding(spark):
    # path 0->1->2: converges at t=2; later t repeat the converged count
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    verts = spark.range(3).select(F.col("id").alias("vertex_id"))
    got = (
        neighborhood_function_exact(edges, verts, max_t=5)
        .toPandas()
        .sort_values("t")["n_pairs"]
        .tolist()
    )
    assert got == [3, 5, 6, 6, 6, 6]


def test_neighborhood_function_hll_tracks_exact(spark):
    edges, verts, pairs, n = _graph(spark, n=60, m=240, seed=23)
    exact = (
        neighborhood_function_exact(edges, verts, max_t=5)
        .toPandas()
        .sort_values("t")["n_pairs"]
        .to_numpy()
    )
    est = (
        neighborhood_function_hll(edges, verts, max_t=5, lgk=12)
        .toPandas()
        .sort_values("t")["n_pairs_est"]
        .to_numpy()
    )
    # lgk=12 → ~1.6% relative standard error; allow 5x slack
    np.testing.assert_allclose(est, exact, rtol=0.08)
    # determinism for fixed lgk
    est2 = (
        neighborhood_function_hll(edges, verts, max_t=5, lgk=12)
        .toPandas()
        .sort_values("t")["n_pairs_est"]
        .to_numpy()
    )
    np.testing.assert_array_equal(est, est2)


def test_neighborhood_function_validates(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.range(2).select(F.col("id").alias("vertex_id"))
    with pytest.raises(ValueError, match="max_t"):
        neighborhood_function_exact(edges, verts, max_t=-1)
    with pytest.raises(ValueError, match="lgk"):
        neighborhood_function_hll(edges, verts, max_t=1, lgk=2)


def test_effective_diameter_interpolation(spark):
    from halvesting_geometric_spark.operators.neighborhood import (
        effective_diameter,
    )

    # path 0->1->2: N = [3, 5, 6]; target 0.9*6 = 5.4 → between t=1 and t=2
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    verts = spark.range(3).select(F.col("id").alias("vertex_id"))
    nf = neighborhood_function_exact(edges, verts, max_t=2)
    d = effective_diameter(nf, fraction=0.9)
    assert d == pytest.approx(1 + (5.4 - 5) / (6 - 5))
    assert effective_diameter(nf, fraction=0.5) == 0.0  # 3 >= 0.5*6 at t=0
    with pytest.raises(ValueError, match="fraction"):
        effective_diameter(nf, fraction=1.5)


def _python_harmonic(pairs, n, max_t):
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        adj[a].add(b)
    import collections

    h = {v: 0.0 for v in range(n)}
    for u in range(n):
        dist = {u: 0}
        q = collections.deque([u])
        while q:
            x = q.popleft()
            if dist[x] >= max_t:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for v, d in dist.items():
            if d > 0:
                h[v] += 1.0 / d
    return h


def test_harmonic_exact_matches_python(spark):
    from halvesting_geometric_spark.operators.neighborhood import (
        harmonic_centrality_exact,
    )

    edges, verts, pairs, n = _graph(spark, n=25, m=80, seed=29)
    got = (
        harmonic_centrality_exact(edges, verts, max_t=6)
        .toPandas()
        .set_index("vertex_id")["harmonic"]
        .to_dict()
    )
    expect = _python_harmonic(pairs, n, 6)
    assert got.keys() == expect.keys()
    for v in expect:
        assert got[v] == pytest.approx(expect[v], abs=1e-9), v


def test_harmonic_hll_tracks_exact(spark):
    from halvesting_geometric_spark.operators.neighborhood import (
        harmonic_centrality_exact,
        harmonic_centrality_hll,
    )

    edges, verts, pairs, n = _graph(spark, n=60, m=240, seed=31)
    exact = (
        harmonic_centrality_exact(edges, verts, max_t=5)
        .toPandas()
        .set_index("vertex_id")["harmonic"]
    )
    est = (
        harmonic_centrality_hll(edges, verts, max_t=5, lgk=12)
        .toPandas()
        .set_index("vertex_id")["harmonic"]
    )
    # aggregate mass within HLL error; per-vertex within looser bound
    assert est.sum() == pytest.approx(exact.sum(), rel=0.08)
    big = exact[exact > 1.0]
    for v in big.index:
        assert est[v] == pytest.approx(exact[v], rel=0.25), v


def test_reach_sketch_equals_sketch_of_true_reach_sets(spark):
    from pyspark.sql import functions as F

    from halvesting_geometric_spark.operators.neighborhood import reach_sketch
    from halvesting_geometric_spark.operators.sketch import hll_sketch

    # layered DAG: 0..3 -> 4..7 -> 8..11, plus a long chain 12->13->14->15
    edges = [(a, 4 + (a + i) % 4) for a in range(4) for i in range(2)]
    edges += [(4 + a, 8 + (a + i) % 4) for a in range(4) for i in range(2)]
    edges += [(12, 13), (13, 14), (14, 15)]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(16)], "vertex_id long")

    k = 3
    got = {
        (r.vertex_id, r.reg): r.rho
        for r in reach_sketch(e, v, rounds=k, lgk=6,
                              hash_method="portable").collect()
    }
    # true <=k-hop descendant sets (python closure)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    member = []
    for root in range(16):
        frontier, seen = {root}, {root}
        for _ in range(k):
            frontier = {w for u in frontier for w in adj.get(u, ())} - seen
            seen |= frontier
        member += [(root, m) for m in sorted(seen)]
    mdf = spark.createDataFrame(member, "root long, vertex_id long")
    want = {
        (r.root, r.reg): r.rho
        for r in hll_sketch(mdf, "vertex_id", group_cols=("root",), lgk=6,
                            hash_method="portable").collect()
    }
    assert got == {(root, reg): rho for (root, reg), rho in want.items()}
