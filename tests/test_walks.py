"""Deterministic random walks: python md5-twin replay (portable hash),
structural validity (every hop is an edge), sink termination."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.walks import random_walks


def _ph(*vals, seed):
    s = "\x1f".join([str(v) for v in vals] + [str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_walks(pairs, starts, length, seed):
    adj: dict[int, list[int]] = {}
    for a, b in sorted(set(pairs)):
        adj.setdefault(a, []).append(b)
    rows = []
    for w in starts:
        v = w
        rows.append((w, 0, v))
        for t in range(1, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = sorted(nbrs)[_ph(w, t, seed=seed) % len(nbrs)]
            rows.append((w, t, v))
    return sorted(rows)


def test_random_walks_match_python_md5_twin(spark):
    rng = np.random.default_rng(5)
    n = 25
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(150, 2))]
    edges = spark.createDataFrame(sorted(set(pairs)), "src long, dst long")
    starts = list(range(8))
    got = sorted(
        map(
            tuple,
            random_walks(
                edges, starts, walk_length=5, seed=7, hash_method="portable"
            )
            .toPandas()
            .to_numpy(),
        )
    )
    assert got == _python_walks(pairs, starts, 5, 7)


def test_random_walks_hops_are_edges_and_deterministic(spark):
    rng = np.random.default_rng(11)
    n = 30
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, size=(200, 2))})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    w = random_walks(edges, list(range(10)), walk_length=4, seed=1).toPandas()
    edge_set = set(pairs)
    by_walker = w.sort_values(["walker_id", "step"]).groupby("walker_id")
    for wid, grp in by_walker:
        vs = grp["vertex_id"].tolist()
        steps = grp["step"].tolist()
        assert steps == list(range(len(steps)))  # contiguous, no gaps
        for a, b in zip(vs, vs[1:]):
            assert (a, b) in edge_set
    # same seed → identical output; different seed → different somewhere
    w2 = random_walks(edges, list(range(10)), walk_length=4, seed=1).toPandas()
    assert sorted(map(tuple, w.to_numpy())) == sorted(map(tuple, w2.to_numpy()))
    w3 = random_walks(edges, list(range(10)), walk_length=4, seed=2).toPandas()
    assert sorted(map(tuple, w.to_numpy())) != sorted(map(tuple, w3.to_numpy()))


def test_random_walks_stop_at_sinks(spark):
    # path graph 0->1->2; walks from 0 longer than the path truncate at 2
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    w = random_walks(edges, [0], walk_length=10, seed=3).toPandas()
    assert sorted(map(tuple, w.to_numpy())) == [(0, 0, 0), (0, 1, 1), (0, 2, 2)]
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(edges, [0], walk_length=-1)


def test_random_walks_multiple_walkers_per_start(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (2, 0)], "src long, dst long"
    )
    starts = edges.sparkSession.createDataFrame(
        [(100, 0), (200, 0)], "walker_id long, vertex_id long"
    )
    w = random_walks(edges, starts, walk_length=3, seed=9).toPandas()
    assert set(w["walker_id"]) == {100, 200}
    assert (w.groupby("walker_id")["step"].max() == 3).all()


def _hetero_fixture(spark):
    from halvesting_geometric_spark.operators.hetero import HeteroGraph

    g = HeteroGraph()
    users = spark.createDataFrame([(u,) for u in range(4)], "id long")
    convs = spark.createDataFrame(
        [(f"c{i}",) for i in range(6)], "id string"
    )
    g.add_vertices("user", users)
    g.add_vertices("conv", convs)
    writes = [(0, "c0"), (0, "c1"), (1, "c1"), (2, "c2"), (3, "c3")]
    cites = [("c0", "c2"), ("c0", "c4"), ("c1", "c3"), ("c2", "c5")]
    g.add_edges("user", "writes", "conv",
                spark.createDataFrame(writes, "src long, dst string"))
    g.add_edges("conv", "cites", "conv",
                spark.createDataFrame(cites, "src string, dst string"))
    return g, writes, cites


def test_metapath_walks_match_python_md5_twin(spark):
    from halvesting_geometric_spark.operators.walks import metapath_walks

    g, writes, cites = _hetero_fixture(spark)
    got = sorted(
        map(
            tuple,
            metapath_walks(
                g, ["writes", "cites"], [0, 1, 2, 3], seed=11,
                hash_method="portable",
            )
            .toPandas()
            .to_numpy(),
        )
    )
    adjs = [
        {},  # step 1: writes
        {},  # step 2: cites
    ]
    for s, d in writes:
        adjs[0].setdefault(str(s), []).append(d)
    for s, d in cites:
        adjs[1].setdefault(s, []).append(d)
    expect = []
    for w in ["0", "1", "2", "3"]:
        v = w
        expect.append((w, 0, "user", v))
        for t, (adj, vt) in enumerate(zip(adjs, ["conv", "conv"]), start=1):
            nbrs = sorted(adj.get(v, []))
            if not nbrs:
                break
            v = nbrs[_ph(w, t, seed=11) % len(nbrs)]
            expect.append((w, t, vt, v))
    assert got == sorted(expect)


def test_metapath_walks_validates_chaining(spark):
    import pytest as _pytest

    from halvesting_geometric_spark.operators.walks import metapath_walks

    g, _, _ = _hetero_fixture(spark)
    with _pytest.raises(ValueError, match="metapath breaks"):
        metapath_walks(g, ["cites", "writes"], ["c0"])
    with _pytest.raises(ValueError, match="non-empty"):
        metapath_walks(g, [], [0])


def _python_node2vec(pairs, starts, length, p, q, seed):
    from halvesting_geometric_spark.operators.walks import node2vec_walks  # noqa: F401

    m = 1 << 20
    edge_set = set(pairs)
    adj: dict[int, list[int]] = {}
    for a, b in sorted(edge_set):
        adj.setdefault(a, []).append(b)
    rows = []
    for w in starts:
        v = w
        rows.append((w, 0, v))
        if length < 1:
            continue
        nbrs = adj.get(v)
        if not nbrs:
            continue
        prev, v = v, sorted(nbrs)[_ph(w, 1, seed=seed) % len(nbrs)]
        rows.append((w, 1, v))
        for t in range(2, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            cand = sorted(nbrs)
            alphas = [
                (1.0 / p)
                if x == prev
                else (1.0 if (prev, x) in edge_set else 1.0 / q)
                for x in cand
            ]
            tot = sum(alphas)
            tau = (_ph(w, t, seed=seed) % m) / m * tot
            cum = 0.0
            pick = cand[-1]
            for x, a in zip(cand, alphas):
                cum += a
                if cum > tau:
                    pick = x
                    break
            prev, v = v, pick
            rows.append((w, t, v))
    return sorted(rows)


def test_node2vec_walks_match_python_md5_twin(spark):
    from halvesting_geometric_spark.operators.walks import node2vec_walks

    rng = np.random.default_rng(17)
    n = 25
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(150, 2))
            if a != b
        }
    )
    # symmetrize: the usual node2vec setting
    sym = sorted({*pairs, *[(b, a) for a, b in pairs]})
    edges = spark.createDataFrame(sym, "src long, dst long")
    starts = list(range(n))
    got = sorted(
        (int(r["walker_id"]), int(r["step"]), int(r["vertex_id"]))
        for r in node2vec_walks(
            edges, starts, walk_length=5, p=2.0, q=4.0, seed=9,
            hash_method="portable",
        ).collect()
    )
    want = _python_node2vec(sym, starts, 5, 2.0, 4.0, 9)
    assert got == want


def test_node2vec_bias_limits_match_uniform_when_p_q_one(spark):
    # p=q=1 makes every candidate weight 1.0: the walk is first-order but
    # picked through the inverse-CDF — verify hops are edges & reproducible
    from halvesting_geometric_spark.operators.walks import node2vec_walks

    rng = np.random.default_rng(23)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, 15, size=(60, 2))
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    w1 = node2vec_walks(
        edges, list(range(15)), 4, p=1.0, q=1.0, seed=3,
        hash_method="portable",
    )
    rows = {
        (int(r["walker_id"]), int(r["step"])): int(r["vertex_id"])
        for r in w1.collect()
    }
    eset = set(pairs)
    for (w, t), v in rows.items():
        if t == 0:
            assert v == w
        else:
            assert (rows[(w, t - 1)], v) in eset
    # deterministic across invocations
    w2 = node2vec_walks(
        edges, list(range(15)), 4, p=1.0, q=1.0, seed=3,
        hash_method="portable",
    )
    assert rows == {
        (int(r["walker_id"]), int(r["step"])): int(r["vertex_id"])
        for r in w2.collect()
    }


def test_node2vec_return_bias_extremes(spark):
    # tiny p (cheap return) on a path graph forces immediate backtracking
    from halvesting_geometric_spark.operators.walks import node2vec_walks

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    # p = 1/1024: return weight 1024 vs forward 1/q — walker oscillates
    res = node2vec_walks(
        edges, [0], 4, p=1.0 / 1024, q=1.0, seed=1, hash_method="portable"
    )
    path = [
        int(r["vertex_id"])
        for r in sorted(res.collect(), key=lambda r: r["step"])
    ]
    assert path[0] == 0 and path[1] == 1
    # from step 2 on, the overwhelming return bias sends it back each time
    assert path[2] == 0 and path[3] == 1
