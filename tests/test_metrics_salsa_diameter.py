"""Semantic oracles for reciprocity, rich-club, SALSA, and the double-sweep
diameter bound — each cross-checked against a dense numpy / pure-python twin
on seeded random graphs, independent of the DuckDB gate twins.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.centrality import salsa
from halvesting_geometric_spark.operators.metrics import reciprocity, rich_club
from halvesting_geometric_spark.operators.traversal import (
    double_sweep_diameter,
)


def _random_graph(spark, n=40, m=160, seed=7):
    rng = np.random.default_rng(seed)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))}
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    return edges, verts, sorted(pairs), n


def test_reciprocity_matches_python(spark):
    edges, _, pairs, _ = _random_graph(spark)
    simple = {(a, b) for a, b in pairs if a != b}
    mutual = sum(1 for a, b in simple if (b, a) in simple)
    row = reciprocity(edges).collect()[0]
    assert row["total"] == len(simple)
    assert row["mutual"] == mutual
    assert row["reciprocity_e6"] == int(
        np.floor(1_000_000.0 * mutual / len(simple) + 0.5)
    )


def test_reciprocity_two_cycle(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2)], "src long, dst long"
    )
    row = reciprocity(edges).collect()[0]
    assert (row["mutual"], row["total"]) == (2, 3)
    assert row["reciprocity_e6"] == 666667


def test_rich_club_matches_python(spark):
    edges, _, pairs, n = _random_graph(spark, seed=13)
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg: dict[int, int] = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in (0, 3, 6, 100):
        rich = {v for v, d in deg.items() if d > k}
        e_k = sum(1 for a, b in canon if a in rich and b in rich)
        n_k = len(rich)
        row = rich_club(edges, k=k).collect()[0]
        assert (row["n_rich"], row["e_rich"]) == (n_k, e_k)
        want = (
            int(np.floor(2_000_000.0 * e_k / (n_k * (n_k - 1)) + 0.5))
            if n_k >= 2
            else 0
        )
        assert row["phi_e6"] == want, f"k={k}"


def test_rich_club_rejects_negative_k(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        rich_club(edges, k=-1)


def test_salsa_matches_numpy(spark):
    edges, verts, pairs, n = _random_graph(spark, seed=23)
    got = (
        salsa(edges, verts, fixed_iters=4)
        .toPandas()
        .sort_values("vertex_id")
        .reset_index(drop=True)
    )
    outdeg = np.zeros(n)
    indeg = np.zeros(n)
    for a, b in pairs:
        outdeg[a] += 1
        indeg[b] += 1
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(4):
        auth = np.zeros(n)
        for a, b in pairs:
            auth[b] += hub[a] / outdeg[a]
        auth /= auth.sum()
        hub = np.zeros(n)
        for a, b in pairs:
            hub[a] += auth[b] / indeg[b]
        hub /= hub.sum()
    np.testing.assert_allclose(got["hub"].to_numpy(), hub, atol=1e-12)
    np.testing.assert_allclose(got["auth"].to_numpy(), auth, atol=1e-12)
    # L1-normalized each half-step
    assert abs(got["hub"].sum() - 1.0) < 1e-9
    assert abs(got["auth"].sum() - 1.0) < 1e-9


def test_salsa_resists_tkc_effect_unlike_hits(spark):
    """SALSA's defining property vs HITS (Lempel & Moran's TKC argument):
    degree-normalized gathers are mass-preserving per connected component,
    so a small community keeps its authority share, while HITS's
    copy-then-normalize recurrence drains it into the densest community
    geometrically."""
    from halvesting_geometric_spark.operators.centrality import hits

    # community A: 3 hubs x 3 authorities, complete; community B: 1 hub -> 1
    # authority. SALSA fixed point: every authority holds exactly 1/4.
    rows = [(h, a) for h in (0, 1, 2) for a in (10, 11, 12)] + [(3, 13)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    verts = spark.createDataFrame(
        [(v,) for v in (0, 1, 2, 3, 10, 11, 12, 13)], "vertex_id long"
    )
    s = salsa(edges, verts, fixed_iters=5).toPandas().set_index("vertex_id")
    assert s.loc[13, "auth"] == pytest.approx(0.25, abs=1e-12)
    assert s.loc[3, "hub"] == pytest.approx(0.25, abs=1e-12)
    h = hits(edges, verts, fixed_iters=5).toPandas().set_index("vertex_id")
    # HITS: the lone community's authority decays ~9x per iteration
    assert h.loc[13, "auth"] < 1e-3


def test_salsa_rejects_bad_args(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.range(2).select(F.col("id").alias("vertex_id"))
    with pytest.raises(ValueError):
        salsa(edges, verts, fixed_iters=0)
    lonely = spark.createDataFrame([(5,)], "vertex_id long")
    with pytest.raises(ValueError):
        salsa(edges, lonely, fixed_iters=1)


def _bfs_dist(adj: dict[int, set[int]], n: int, s: int) -> dict[int, int]:
    dist = {s: 0}
    frontier = [s]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):  # undirected adj
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_double_sweep_matches_python(spark):
    edges, verts, pairs, n = _random_graph(spark, n=30, m=45, seed=31)
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(adj.get(v, ())) for v in range(n)}
    start = min(range(n), key=lambda v: (-deg[v], v))
    d1 = _bfs_dist(adj, n, start)
    far = min(d1, key=lambda v: (-d1[v], v))
    d2 = _bfs_dist(adj, n, far)
    want = max(d2.values())
    row = double_sweep_diameter(edges, verts, max_depth=20).collect()[0]
    assert row["start"] == start
    assert row["far_vertex"] == far
    assert row["diameter_lb"] == want


def test_double_sweep_path_graph_exact(spark):
    # path 0-1-2-3-4: double sweep finds the true diameter 4
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    verts = spark.range(5).select(F.col("id").alias("vertex_id"))
    row = double_sweep_diameter(edges, verts, max_depth=10).collect()[0]
    assert row["diameter_lb"] == 4
    # depth cap clamps the bound: both sweeps stop at 2 hops
    row2 = double_sweep_diameter(edges, verts, max_depth=2).collect()[0]
    assert row2["diameter_lb"] == 2


# ---------------------------------------------------------------------------
# AUROC
# ---------------------------------------------------------------------------


def _brute_auc(pairs):
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auroc_exact_with_ties(spark):
    from halvesting_geometric_spark.operators.metrics import auroc

    pairs = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.5, 0), (0.5, 1),
        (0.5, 0), (0.3, 0), (0.1, 0), (0.9, 0),
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    got = auroc(df).first()
    assert got["auroc"] == pytest.approx(_brute_auc(pairs), abs=1e-12)
    assert (got["n_pos"], got["n_neg"]) == (4, 6)


def test_auroc_perfect_and_random(spark):
    from halvesting_geometric_spark.operators.metrics import auroc

    perfect = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(perfect, "score double, label int")
    assert auroc(df).first()["auroc"] == pytest.approx(1.0)
    const = [(1.0, i % 2) for i in range(100)]
    df2 = spark.createDataFrame(const, "score double, label int")
    assert auroc(df2).first()["auroc"] == pytest.approx(0.5)


def test_auroc_degenerate_group_is_null(spark):
    from halvesting_geometric_spark.operators.metrics import auroc

    rows = [("a", 0.5, 1), ("a", 0.2, 0), ("b", 0.9, 1), ("b", 0.7, 1)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {r["g"]: r["auroc"] for r in auroc(df, group_cols=("g",)).collect()}
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] is None


def test_auroc_scalable_matches_exact(spark):
    import random

    from halvesting_geometric_spark.operators.metrics import auroc

    rng = random.Random(7)
    pairs = [
        (round(rng.random(), 2), 1 if rng.random() < 0.3 else 0)
        for _ in range(3000)
    ]
    df = spark.createDataFrame(pairs, "score double, label int").repartition(8)
    a = auroc(df).first()
    b = auroc(df, scalable=True, buckets=16).first()
    assert a["auroc"] == pytest.approx(b["auroc"], abs=1e-12)
    assert a["auroc"] == pytest.approx(_brute_auc(pairs), abs=1e-9)
    assert (a["n_pos"], a["n_neg"]) == (b["n_pos"], b["n_neg"])


def test_auroc_grouped_scalable(spark):
    import random

    from halvesting_geometric_spark.operators.metrics import auroc

    rng = random.Random(11)
    rows = [
        (f"g{i % 3}", float(rng.randint(0, 50)), rng.randint(0, 1))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    want = {
        g: _brute_auc([(s, y) for gg, s, y in rows if gg == g])
        for g in ("g0", "g1", "g2")
    }
    got = {
        r["g"]: r["auroc"]
        for r in auroc(
            df, group_cols=("g",), scalable=True, buckets=8
        ).collect()
    }
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=1e-9), g
