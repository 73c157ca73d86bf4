from __future__ import annotations

from collections import deque

import numpy as np

from halvesting_geometric_spark.operators.traversal import (
    bfs_levels,
    landmark_bfs,
    landmark_distance_estimates,
)


def _sp(adj, src, max_depth):
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _graph(spark, seed=3, n=40, m=90):
    rng = np.random.RandomState(seed)
    edges = {(int(a), int(b)) for a, b in rng.randint(0, n, (m, 2)) if a != b}
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(n)], "vertex_id long")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return e, v, adj


def test_landmark_bfs_matches_per_landmark_bfs_levels(spark):
    e, v, adj = _graph(spark)
    lms = [0, 7, 19]
    joint = landmark_bfs(e, v, lms, max_depth=4, directed=False)
    got = {(r.lm, r.vertex_id): r.dist for r in joint.collect()}
    for lm in lms:
        single = {
            r.vertex_id: r.dist
            for r in bfs_levels(e, v, [lm], max_depth=4, directed=False).collect()
        }
        mine = {vid: d for (l, vid), d in got.items() if l == lm}
        assert mine == single, lm
        assert mine == {
            vid: d for vid, d in _sp(adj, lm, 4).items()
        }, lm


def test_landmark_estimates_are_valid_upper_bounds(spark):
    e, v, adj = _graph(spark, seed=11)
    lms = [0, 5, 10, 15]
    dists = landmark_bfs(e, v, lms, max_depth=6, directed=False)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(0, 40, 7) for b in range(3, 40, 9) if a != b],
        "a long, b long",
    )
    est = {
        (r.a, r.b): r.est_dist
        for r in landmark_distance_estimates(dists, pairs).collect()
    }
    sp = {lm: _sp(adj, lm, 10) for lm in lms}
    for (a, b), d in est.items():
        want = min(
            (s[a] + s[b] for s in sp.values() if a in s and b in s),
            default=None,
        )
        assert d == want, (a, b)
        # upper bound: never below the true shortest distance
        true = _sp(adj, a, 10).get(b)
        if true is not None:
            assert d >= true
    # a landmark ON the pair gives the exact distance
    d0 = _sp(adj, 0, 10)
    for b in (3, 12):
        if (0, b) in est or (b, 0) in est:
            key = (0, b) if (0, b) in est else (b, 0)
            assert est[key] == d0[b]


def test_landmark_sssp_unit_weights_equal_bfs(spark):
    e, v, _ = _graph(spark, seed=21)
    from halvesting_geometric_spark.operators.traversal import landmark_sssp

    lms = [0, 9, 27]
    bfs = {
        (r.lm, r.vertex_id): r.dist
        for r in landmark_bfs(e, v, lms, max_depth=5, directed=False).collect()
    }
    wsp = {
        (r.lm, r.vertex_id): r.dist
        for r in landmark_sssp(
            e, v, lms, weight_col=None, fixed_iters=5, directed=False
        ).collect()
    }
    assert wsp == {k: float(d) for k, d in bfs.items()}


def test_landmark_sssp_matches_per_landmark_sssp(spark):
    from pyspark.sql import functions as F

    from halvesting_geometric_spark.operators.traversal import (
        landmark_sssp,
        sssp,
    )

    e, v, _ = _graph(spark, seed=8)
    we = e.withColumn("w", ((F.col("src") + F.col("dst")) % 4 + 1).cast("double"))
    lms = [1, 6]
    joint = {
        (r.lm, r.vertex_id): r.dist
        for r in landmark_sssp(
            we, v, lms, weight_col="w", fixed_iters=6, directed=False
        ).collect()
    }
    for lm in lms:
        single = {
            r.vertex_id: r.dist
            for r in sssp(
                we, v, [lm], weight_col="w", fixed_iters=6, directed=False
            ).collect()
        }
        mine = {vid: d for (l, vid), d in joint.items() if l == lm}
        assert mine == single, lm
