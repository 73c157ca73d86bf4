"""Maximal matching: python twin replay (portable hash) + invariants."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.matching import maximal_matching


def _ph(*vals, seed):
    s = "\x1f".join([str(v) for v in vals] + [str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_matching(pairs, seed):
    live = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    matched = set()
    while live:
        key = {e: (_ph(e[0], e[1], seed=seed), e[0], e[1]) for e in live}
        vmin: dict[int, tuple] = {}
        for e in live:
            for v in e:
                if v not in vmin or key[e] < vmin[v]:
                    vmin[v] = key[e]
        sel = {e for e in live if key[e] == vmin[e[0]] == vmin[e[1]]}
        matched |= sel
        mv = {v for e in sel for v in e}
        live = {e for e in live if e[0] not in mv and e[1] not in mv}
    return matched


def _canon(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def test_matching_matches_python_twin(spark):
    rng = np.random.default_rng(41)
    pairs = [
        (int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    res = maximal_matching(edges, seed=7, hash_method="portable")
    got = {(int(r["a"]), int(r["b"])) for r in res.matching.collect()}
    assert got == _python_matching(pairs, 7)
    assert res.num_matched == len(got)


def test_matching_invariants(spark):
    rng = np.random.default_rng(43)
    pairs = [
        (int(a), int(b)) for a, b in rng.integers(0, 60, size=(250, 2))
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    res = maximal_matching(edges, seed=3)
    got = {(int(r["a"]), int(r["b"])) for r in res.matching.collect()}
    cn = _canon(pairs)
    assert got <= cn  # matched pairs are real edges
    # matching: no two matched edges share a vertex
    seen: set[int] = set()
    for a, b in got:
        assert a not in seen and b not in seen
        seen |= {a, b}
    # maximality: every edge touches a matched vertex
    for a, b in cn:
        assert a in seen or b in seen
    assert res.rounds <= 30


def test_matching_fixed_rounds_prefix_and_empty(spark):
    rng = np.random.default_rng(47)
    pairs = [
        (int(a), int(b)) for a, b in rng.integers(0, 30, size=(90, 2))
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    full = {
        (int(r["a"]), int(r["b"]))
        for r in maximal_matching(edges, seed=5).matching.collect()
    }
    r1 = {
        (int(r["a"]), int(r["b"]))
        for r in maximal_matching(
            edges, seed=5, fixed_rounds=1
        ).matching.collect()
    }
    assert r1 <= full and len(r1) >= 1
    # edgeless input: empty matching, zero rounds
    empty = spark.createDataFrame([(1, 1)], "src long, dst long")
    res = maximal_matching(empty)
    assert res.num_matched == 0 and res.rounds == 0
