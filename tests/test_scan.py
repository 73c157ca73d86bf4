"""SCAN structural clustering: hand-derived goldens + python twin.

Fixture (mu=4, eps=0.6): two K4s {0..3} and {4..7}; hub 8 wired to 0 and
4 (low similarity on both spokes -> unclustered, touches 2 clusters);
border 10 wired to 4 and 5 (two eps-edges but eps-neighborhood of 3 < mu);
pendant 9 on 0 (outlier); isolated 11 (outlier).
"""

from __future__ import annotations

import itertools
import math
import random

import pytest

from halvesting_geometric_spark.operators.scan import (
    scan_clusters,
    structural_similarity,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _verts_df(spark, ids):
    return spark.createDataFrame([(int(v),) for v in ids], "vertex_id long")


FIXTURE = (
    list(itertools.combinations(range(4), 2))
    + list(itertools.combinations(range(4, 8), 2))
    + [(8, 0), (8, 4), (0, 9), (10, 4), (10, 5)]
)


def test_structural_similarity_pins(spark):
    sim = {
        (r.src, r.dst): r.sigma_e6
        for r in structural_similarity(_edges_df(spark, FIXTURE)).collect()
    }
    assert sim[(6, 7)] == 1_000_000  # support 2, degs 3,3 -> 4/4
    assert sim[(4, 10)] == 707_107  # support 1, degs 5,2 -> 3/sqrt(18)
    assert sim[(0, 9)] == 577_350  # support 0, degs 5,1 -> 2/sqrt(12)
    assert sim[(0, 8)] == 471_405  # support 0, degs 5,2 -> 2/sqrt(18)


def test_scan_golden_classification(spark):
    res = {
        r.vertex_id: (r.cluster, r.role)
        for r in scan_clusters(
            _edges_df(spark, FIXTURE),
            _verts_df(spark, range(12)),
            eps_e6=600_000,
            mu=4,
        ).collect()
    }
    for v in range(4):
        assert res[v] == (0, "core")
    for v in range(4, 8):
        assert res[v] == (4, "core")
    assert res[10] == (4, "border")
    assert res[8] == (None, "hub")
    assert res[9] == (None, "outlier")
    assert res[11] == (None, "outlier")


def test_scan_param_validation(spark):
    e = _edges_df(spark, FIXTURE)
    v = _verts_df(spark, range(12))
    with pytest.raises(ValueError):
        scan_clusters(e, v, mu=1)
    with pytest.raises(ValueError):
        scan_clusters(e, v, eps_e6=0)


def _python_scan(pairs, n, eps_e6, mu):
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    canon = set()
    for a, b in pairs:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        canon.add((u, v))
        adj[u].add(v)
        adj[v].add(u)
    sig = {}
    for u, v in canon:
        s = len(adj[u] & adj[v])
        sig[(u, v)] = math.floor(
            (s + 2) * 1_000_000.0 / math.sqrt((len(adj[u]) + 1) * (len(adj[v]) + 1))
            + 0.5
        )
    eps_edges = {e for e, s in sig.items() if s >= eps_e6}
    eps_nbrs: dict[int, set[int]] = {v: set() for v in range(n)}
    for u, v in eps_edges:
        eps_nbrs[u].add(v)
        eps_nbrs[v].add(u)
    cores = {v for v in range(n) if len(eps_nbrs[v]) + 1 >= mu}
    # CC over core-core eps edges (union-find, min-id representative)
    parent = {v: v for v in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in eps_edges:
        if u in cores and v in cores:
            parent[find(u)] = find(v)
    members: dict[int, list[int]] = {}
    for v in cores:
        members.setdefault(find(v), []).append(v)
    cluster = {}
    for mem in members.values():
        cid = min(mem)
        for v in mem:
            cluster[v] = cid
    out = {}
    for v in cores:
        out[v] = (cluster[v], "core")
    for v in range(n):
        if v in cores:
            continue
        attached = [cluster[o] for o in eps_nbrs[v] if o in cores]
        if attached:
            out[v] = (min(attached), "border")
    for v in range(n):
        if v in out:
            continue
        touched = {out[o][0] for o in adj[v] if o in out and out[o][0] is not None}
        out[v] = (None, "hub" if len(touched) >= 2 else "outlier")
    return out


def test_scan_random_vs_python_twin(spark):
    rng = random.Random(17)
    # planted structure + noise so every role appears
    pairs = list(itertools.combinations(range(6), 2)) + list(
        itertools.combinations(range(6, 12), 2)
    )
    pairs += [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _python_scan(pairs, 25, eps_e6=600_000, mu=3)
    got = {
        r.vertex_id: (r.cluster, r.role)
        for r in scan_clusters(
            _edges_df(spark, pairs), _verts_df(spark, range(25)), mu=3
        ).collect()
    }
    assert got == want
