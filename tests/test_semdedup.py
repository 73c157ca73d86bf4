"""SemDeDup (cluster-then-pairwise semantic dedup) against a numpy
brute-force replay of the full contract: e4-rounded assignment, within-cell
pair threshold, farther-from-centroid-survives priority."""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.ivf import (
    seed_centroids,
    semdedup,
)


def _unit(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _brute(vecs, centroids, thr_e4):
    u = _unit(vecs)
    sims = np.floor(u @ centroids.T * 10_000 + 0.5).astype(np.int64)
    cell = sims.argmax(axis=1)
    prio = sims[np.arange(len(cell)), cell]
    pair = np.floor(u @ u.T * 10_000 + 0.5).astype(np.int64)
    kept = []
    for a in range(len(vecs)):
        drop = any(
            cell[b] == cell[a]
            and pair[a, b] >= thr_e4
            and (prio[b] < prio[a] or (prio[b] == prio[a] and b < a))
            for b in range(len(vecs))
            if b != a
        )
        kept.append(not drop)
    return cell, prio, kept


def _mkvecs(seed=3, n=40, dim=8):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    # plant near-duplicate pairs: copies with tiny noise
    for a, b in [(5, 25), (11, 31), (2, 22)]:
        vecs[b] = vecs[a] + rng.standard_normal(dim) * 1e-3
    return vecs


def test_matches_bruteforce(spark):
    vecs = _mkvecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cent = seed_centroids(df, 4)
    got = {r["vec_id"]: r for r in semdedup(df, cent, dim=8).collect()}
    cell, prio, kept = _brute(vecs, cent, 9500)
    assert len(got) == len(vecs)
    for i in range(len(vecs)):
        assert got[i]["cell"] == cell[i], i
        assert got[i]["sim_e4"] == prio[i], i
        assert got[i]["kept"] == kept[i], i
    # at least one planted duplicate must actually be dropped
    assert sum(not k for k in kept) >= 1
    assert sum(not r["kept"] for r in got.values()) == sum(not k for k in kept)


def test_pairs_across_cells_never_compared(spark):
    # identical vectors forced into different cells (they ARE the centroids)
    vecs = np.eye(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cent = seed_centroids(df, 4)
    out = semdedup(df, cent, dim=4).collect()
    assert all(r["kept"] for r in out)


def test_max_cell_size_guard(spark):
    vecs = np.ones((10, 4))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cent = seed_centroids(df, 2)
    with pytest.raises(ValueError, match="max_cell_size"):
        semdedup(df, cent, dim=4, max_cell_size=5)
