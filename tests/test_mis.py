"""Luby MIS: python md5-twin replay (portable hash) + independence and
maximality invariants (any hash method)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.mis import maximal_independent_set


def _ph(*vals, seed):
    s = "\x1f".join([str(v) for v in vals] + [str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_mis(pairs, n, seed):
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    live = set(range(n))
    members = {}
    r = 0
    while live:
        r += 1
        pri = {v: (_ph(v, r, seed=seed), v) for v in live}
        winners = {
            v
            for v in live
            if all(pri[v] < pri[w] for w in adj[v] if w in live)
        }
        for v in winners:
            members[v] = r
        removed = winners | {w for v in winners for w in adj[v]}
        live -= removed
    return members


def _graph(spark, n=40, m=140, seed=13):
    rng = np.random.default_rng(seed)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    return edges, verts, pairs, n


def test_mis_matches_python_md5_twin(spark):
    edges, verts, pairs, n = _graph(spark)
    got = (
        maximal_independent_set(edges, verts, seed=5, hash_method="portable")
        .toPandas()
        .set_index("vertex_id")["round"]
        .to_dict()
    )
    assert got == _python_mis(pairs, n, 5)


def test_mis_is_independent_and_maximal(spark):
    edges, verts, pairs, n = _graph(spark, n=60, m=260, seed=17)
    mis = set(
        maximal_independent_set(edges, verts, seed=1)
        .toPandas()["vertex_id"]
        .tolist()
    )
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    # independence: no edge inside the set
    for v in mis:
        assert not (adj[v] & mis), v
    # maximality: every outsider has a member neighbor
    for v in set(range(n)) - mis:
        assert adj[v] & mis, v


def test_mis_isolated_vertices_and_guard(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.range(4).select(F.col("id").alias("vertex_id"))
    got = maximal_independent_set(edges, verts).toPandas()
    s = set(got["vertex_id"])
    assert {2, 3} <= s  # isolated vertices always join
    assert len(s & {0, 1}) == 1  # exactly one endpoint of the edge
    with pytest.raises(RuntimeError, match="max_rounds"):
        maximal_independent_set(edges, verts, max_rounds=0)
