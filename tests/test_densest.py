"""Densest subgraph: python peeling twin + planted-clique recovery +
approximation-bound invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.densest import densest_subgraph


def _python_densest(pairs, epsilon, fixed_rounds=None, max_rounds=64):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    best = None
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for r in range(rounds + 1):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        if not deg:
            break
        density = len(edges) / len(deg)
        if best is None or density > best[0]:
            best = (density, r, set(deg))
        if r == rounds:
            break
        thr = 2.0 * (1.0 + epsilon) * density
        keep = {v for v, d in deg.items() if d > thr}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        if not edges:
            break
    return best


def test_densest_matches_python(spark):
    rng = np.random.default_rng(47)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (160, 2))})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    for fr in (None, 2):
        got = densest_subgraph(edges, epsilon=0.1, fixed_rounds=fr)
        exp_density, exp_round, exp_members = _python_densest(
            pairs, 0.1, fixed_rounds=fr
        )
        assert got.density == pytest.approx(exp_density)
        assert got.round == exp_round
        assert {
            r["vertex_id"] for r in got.vertices.collect()
        } == exp_members


def test_densest_recovers_planted_clique(spark):
    # sparse ring of 40 vertices + K8 planted on vertices 100..107
    ring = [(i, (i + 1) % 40) for i in range(40)]
    k8 = [
        (100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)
    ]
    edges = spark.createDataFrame(ring + k8, "src long, dst long")
    got = densest_subgraph(edges, epsilon=0.05)
    members = {r["vertex_id"] for r in got.vertices.collect()}
    assert set(range(100, 108)) <= members
    # K8 density is 28/8 = 3.5; the 2(1+eps) guarantee lower-bounds us
    assert got.density >= 3.5 / (2 * 1.05)
    assert not any(v < 40 for v in members) or got.density > 1.0


def test_densest_edgeless(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    got = densest_subgraph(edges)
    assert got.density == 0.0 and got.vertices.count() == 0
    with pytest.raises(ValueError, match="epsilon"):
        densest_subgraph(edges, epsilon=0.0)


def test_densest_fixpoint_raises_when_not_emptied(spark):
    """Fixpoint mode promises peel-until-empty; exceeding max_rounds with
    edges still alive must raise, not silently return best-so-far."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        densest_subgraph(edges, epsilon=0.1, max_rounds=0)
    # fixed_rounds mode with the same budget returns best-so-far by contract
    res = densest_subgraph(edges, epsilon=0.1, fixed_rounds=0)
    assert res.density == pytest.approx(1.0)
