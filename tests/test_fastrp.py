"""FastRP vs an independent numpy + hashlib replica (portable hash mode)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.fastrp import (
    fastrp_embeddings,
    fastrp_projection,
)

SQRT3 = math.sqrt(3.0)


def _ph(*parts, seed):
    s = "\x1f".join([*map(str, parts), str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _proj_np(n, dim, seed):
    r = np.zeros((n, dim))
    for v in range(n):
        for j in range(dim):
            b = _ph(v, j, seed=seed) % 6
            r[v, j] = SQRT3 if b == 0 else (-SQRT3 if b == 1 else 0.0)
    return r


def _rownorm(m):
    out = m.copy()
    for i in range(len(m)):
        nrm = np.sqrt((m[i] * m[i]).sum())
        if nrm > 0:
            out[i] = m[i] / nrm
    return out


def test_fastrp_projection_matches_hash_replica(spark):
    n, dim, seed = 12, 5, 7
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = (
        fastrp_projection(verts, dim, seed=seed, hash_method="portable")
        .toPandas()
        .sort_values("vertex_id")["features"]
    )
    want = _proj_np(n, dim, seed)
    np.testing.assert_allclose(np.vstack(got.to_numpy()), want, atol=0.0)


def test_fastrp_embeddings_match_numpy(spark):
    rng = np.random.default_rng(5)
    n, dim, iters, seed = 30, 4, 3, 11
    weights = [0.5, 1.0, 0.25]
    pairs = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(120, 2))
        if a != b
    }
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = (
        fastrp_embeddings(
            edges,
            verts,
            dim=dim,
            iters=iters,
            weights=weights,
            seed=seed,
            hash_method="portable",
        )
        .toPandas()
        .sort_values("vertex_id")["embedding"]
    )
    got = np.vstack(got.to_numpy())

    # numpy replica: symmetrized neighbor mean over the e6 fixed-point
    # state, per-iteration row L2 norm + e6 re-quantization (the round-5
    # integer-exact recurrence)
    sym = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    x = np.floor(_proj_np(n, dim, seed) * 1e6 + 0.5)
    acc = np.zeros((n, dim))
    for k in range(iters):
        nxt = np.zeros((n, dim))
        deg = np.zeros(n)
        for a, b in sym:
            nxt[b] += x[a]
            deg[b] += 1
        nz = deg > 0
        nxt[nz] = nxt[nz] / deg[nz, None]
        x = np.floor(_rownorm(nxt) * 1e6 + 0.5)
        acc += weights[k] * x
    want = _rownorm(acc)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # final vectors are unit (or zero for isolated vertices)
    norms = np.sqrt((got * got).sum(axis=1))
    assert np.all((np.abs(norms - 1.0) < 1e-9) | (norms == 0.0))


def test_fastrp_isolated_vertex_is_zero(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    verts = spark.range(3).select(F.col("id").alias("vertex_id"))
    got = (
        fastrp_embeddings(
            edges, verts, dim=4, iters=2, seed=1, hash_method="portable"
        )
        .toPandas()
        .set_index("vertex_id")["embedding"]
    )
    assert np.allclose(np.array(got.loc[2]), 0.0)
