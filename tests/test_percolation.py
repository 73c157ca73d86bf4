"""Bond-percolation robustness: determinism, monotonicity, python twin."""

from __future__ import annotations

import hashlib
import random

import pytest

from halvesting_geometric_spark.operators.robustness import bond_percolation


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _verts_df(spark, n):
    return spark.createDataFrame([(int(v),) for v in range(n)], "vertex_id long")


def _ph(parts, seed):
    s = "\x1f".join(str(p) for p in parts) + "\x1f" + str(seed)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_percolation(pairs, n, permilles, seed):
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    out = {}
    for p in permilles:
        kept = [(a, b) for a, b in canon if _ph((a, b), seed) % 1000 < p]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in kept:
            parent[find(a)] = find(b)
        sizes = {}
        for v in range(n):
            sizes[find(v)] = sizes.get(find(v), 0) + 1
        out[p] = (len(kept), len(sizes), max(sizes.values()))
    return out


def test_full_retention_equals_cc(spark):
    pairs = [(0, 1), (1, 2), (3, 4)]
    rows = {
        r.retain_permille: (r.kept_edges, r.n_components, r.giant_size)
        for r in bond_percolation(
            _edges_df(spark, pairs), _verts_df(spark, 6), (1000,)
        ).collect()
    }
    # p=1.0 keeps every edge: components {0,1,2}, {3,4}, {5}
    assert rows[1000] == (3, 3, 3)


def test_monotone_in_p_and_twin(spark):
    rng = random.Random(13)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(90)})
    pairs = [(a, b) for a, b in pairs if a != b]
    res = {
        r.retain_permille: (r.kept_edges, r.n_components, r.giant_size)
        for r in bond_percolation(
            _edges_df(spark, pairs),
            _verts_df(spark, 30),
            (250, 500, 750),
            seed=9,
            hash_method="portable",
        ).collect()
    }
    want = _python_percolation(pairs, 30, (250, 500, 750), 9)
    assert res == want
    # more retention -> at least as many edges, at most as many components
    assert res[250][0] <= res[500][0] <= res[750][0]
    assert res[250][1] >= res[500][1] >= res[750][1]
    assert res[250][2] <= res[500][2] <= res[750][2]


def test_validation(spark):
    e = _edges_df(spark, [(0, 1)])
    v = _verts_df(spark, 2)
    with pytest.raises(ValueError):
        bond_percolation(e, v, ())
    with pytest.raises(ValueError):
        bond_percolation(e, v, (0,))
