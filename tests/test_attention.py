"""Semantic oracle for softmax attention aggregation: dense numpy twin on a
seeded random graph + invariants (alphas sum to 1, single-neighbor identity).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.neighbors import (
    attention_aggregate,
)


def _fixture(spark, n=25, m=80, dim=6, seed=3):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, dim)).round(3)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))})
    fdf = spark.createDataFrame(
        [(i, [float(x) for x in feats[i]]) for i in range(n)],
        "vertex_id long, features array<double>",
    )
    edf = spark.createDataFrame(pairs, "src long, dst long")
    return fdf, edf, feats, pairs, n, dim


def test_attention_matches_numpy(spark):
    fdf, edf, feats, pairs, n, dim = _fixture(spark)
    got = {
        r["vertex_id"]: (r["nbr_count"], np.array(r["agg_vec"]))
        for r in attention_aggregate(fdf, edf, dim=dim).collect()
    }
    by_dst: dict[int, list[int]] = {}
    for a, b in pairs:
        by_dst.setdefault(b, []).append(a)
    assert set(got) == set(by_dst)
    for v, srcs in by_dst.items():
        scores = np.array(
            [feats[u] @ feats[v] for u in srcs]
        ) / np.sqrt(dim)
        w = np.exp(scores - scores.max())
        alpha = w / w.sum()
        want = (alpha[:, None] * feats[srcs]).sum(axis=0)
        cnt, vec = got[v]
        assert cnt == len(srcs)
        np.testing.assert_allclose(vec, want, atol=1e-12)


def test_attention_single_neighbor_is_identity(spark):
    # one in-edge => alpha = 1 => output IS the neighbor's feature vector
    fdf = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [-4.0, 0.5, 9.0])],
        "vertex_id long, features array<double>",
    )
    edf = spark.createDataFrame([(0, 1)], "src long, dst long")
    rows = attention_aggregate(fdf, edf, dim=3).collect()
    assert len(rows) == 1
    assert rows[0]["vertex_id"] == 1
    np.testing.assert_allclose(rows[0]["agg_vec"], [1.0, 2.0, 3.0])


def test_attention_convexity(spark):
    """Output lies in the convex hull of neighbor features: per-dimension
    min <= out <= max (alphas are a convex combination)."""
    fdf, edf, feats, pairs, n, dim = _fixture(spark, seed=11)
    got = {
        r["vertex_id"]: np.array(r["agg_vec"])
        for r in attention_aggregate(fdf, edf, dim=dim).collect()
    }
    by_dst: dict[int, list[int]] = {}
    for a, b in pairs:
        by_dst.setdefault(b, []).append(a)
    for v, srcs in by_dst.items():
        lo, hi = feats[srcs].min(axis=0), feats[srcs].max(axis=0)
        assert (got[v] >= lo - 1e-12).all() and (got[v] <= hi + 1e-12).all()


def test_attention_rejects_bad_args(spark):
    fdf = spark.createDataFrame(
        [(0, [1.0])], "vertex_id long, features array<double>"
    )
    edf = spark.createDataFrame([(0, 0)], "src long, dst long")
    with pytest.raises(ValueError):
        attention_aggregate(fdf, edf, dim=0)
    with pytest.raises(ValueError):
        attention_aggregate(fdf, edf, dim=1, direction="sideways")


def test_gated_matches_numpy(spark):
    from halvesting_geometric_spark.operators.neighbors import (
        gated_aggregate,
    )

    fdf, edf, feats, pairs, n, dim = _fixture(spark, seed=21)
    got = {
        r["vertex_id"]: (r["nbr_count"], np.array(r["agg_vec"]))
        for r in gated_aggregate(fdf, edf, dim=dim).collect()
    }
    by_dst: dict[int, list[int]] = {}
    for a, b in pairs:
        by_dst.setdefault(b, []).append(a)
    assert set(got) == set(by_dst)
    for v, srcs in by_dst.items():
        gate = 1.0 / (1.0 + np.exp(-(feats[srcs] + feats[v])))
        want = feats[v] + (gate * feats[srcs]).sum(axis=0)
        cnt, vec = got[v]
        assert cnt == len(srcs)
        np.testing.assert_allclose(vec, want, atol=1e-12)


def test_gated_rejects_bad_args(spark):
    from halvesting_geometric_spark.operators.neighbors import (
        gated_aggregate,
    )

    fdf = spark.createDataFrame(
        [(0, [1.0])], "vertex_id long, features array<double>"
    )
    edf = spark.createDataFrame([(0, 0)], "src long, dst long")
    with pytest.raises(ValueError):
        gated_aggregate(fdf, edf, dim=-2)
    with pytest.raises(ValueError):
        gated_aggregate(fdf, edf, dim=1, direction="up")
