"""Girvan–Newman edge betweenness (sampled, horizon-bounded).

Path-graph golden, the vertex/edge credit identity (δ(s,v) equals the sum
of credits on v's outgoing shortest-path edges), and an exact python
Brandes twin with identical horizon/source semantics.
"""

from __future__ import annotations

import random
from collections import defaultdict, deque

from halvesting_geometric_spark.operators.betweenness import (
    betweenness_sampled,
    edge_betweenness_sampled,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _verts_df(spark, n):
    return spark.createDataFrame([(int(v),) for v in range(n)], "vertex_id long")


def _python_edge_betweenness(pairs, n, sources, max_depth):
    adj = defaultdict(list)
    for a, b in pairs:
        if a != b and b not in adj[a]:
            adj[a].append(b)
    eb: dict[tuple[int, int], float] = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj:
                if w in adj[v] and v in dist and dist.get(v) == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1.0 + delta[w])
                    eb[(v, w)] += c
                    delta[v] += c
    return dict(eb)


def test_path_graph_golden(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {
        (r.src, r.dst): r.betweenness
        for r in edge_betweenness_sampled(
            _edges_df(spark, pairs), _verts_df(spark, 4), [0], max_depth=3
        ).collect()
    }
    assert got == {(0, 1): 3.0, (1, 2): 2.0, (2, 3): 1.0}


def test_vertex_edge_credit_identity(spark):
    rng = random.Random(23)
    pairs = list({(rng.randrange(20), rng.randrange(20)) for _ in range(70)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    v = _verts_df(spark, 20)
    srcs = [0, 1, 2]
    vb = {
        r.vertex_id: r.betweenness
        for r in betweenness_sampled(e, v, srcs, max_depth=4).collect()
    }
    eb = edge_betweenness_sampled(e, v, srcs, max_depth=4).collect()
    # delta-sum identity: vertex betweenness(v) = sum of credits on v's
    # outgoing edges, minus the source's own-row exclusion (v != s rows
    # only) — replay the exclusion from the python twin
    py = _python_edge_betweenness(pairs, 20, srcs, 4)
    out_credit = defaultdict(float)
    for (a, b), c in py.items():
        out_credit[a] += c
    # python vertex betweenness from edge credits with Brandes exclusion
    # (the engine excludes v == s rows; a source still earns credit from
    # OTHER sources' paths)
    py_delta = defaultdict(float)
    for s in srcs:
        single = _python_edge_betweenness(pairs, 20, [s], 4)
        per_v = defaultdict(float)
        for (a, b), c in single.items():
            per_v[a] += c
        for vtx, c in per_v.items():
            if vtx != s:
                py_delta[vtx] += c
    for vtx in range(20):
        assert abs(vb[vtx] - py_delta[vtx]) < 1e-9


def test_random_vs_python_twin(spark):
    rng = random.Random(5)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(90)})
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _python_edge_betweenness(pairs, 25, [0, 3, 7], 4)
    got = {
        (r.src, r.dst): r.betweenness
        for r in edge_betweenness_sampled(
            _edges_df(spark, pairs), _verts_df(spark, 25), [0, 3, 7], 4
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
