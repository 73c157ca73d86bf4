"""Embedding moments / covariance / PCA vs numpy on the real test vectors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.embeddings import (
    covariance_matrix,
    embedding_moments,
    pca,
    pca_project,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_moments_and_covariance_match_numpy(spark):
    emb = _emb(spark)
    pdf = emb.toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    gram, sums, n = embedding_moments(emb)
    assert n == len(x)
    np.testing.assert_allclose(gram, x.T @ x, rtol=1e-12)
    np.testing.assert_allclose(sums, x.sum(axis=0), rtol=1e-12)

    cov = covariance_matrix(emb)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True),
                               atol=1e-12)

    # partition-invariant (partial combine is exact to fp addition order)
    gram7, sums7, n7 = embedding_moments(emb.repartition(7))
    assert n7 == n
    np.testing.assert_allclose(gram7, gram, rtol=1e-9)

    with pytest.raises(ValueError, match="empty"):
        embedding_moments(emb.limit(0), dim=64)


def test_pca_matches_numpy_and_projects_jvm_side(spark):
    emb = _emb(spark)
    pdf = emb.toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    comps, ev, mean = pca(emb, k=4)
    # numpy reference PCA on the same population covariance
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    np.testing.assert_allclose(ev, vals[order], rtol=1e-9)
    for i, j in enumerate(order):
        ref = vecs[:, j]
        got = comps[i]
        # same axis up to sign; our convention pins the sign
        assert min(np.linalg.norm(got - ref), np.linalg.norm(got + ref)) < 1e-8
    assert ev[0] >= ev[1] >= ev[2] >= ev[3] > 0

    out = pca_project(emb, comps, mean).select("vec_id", "pca").toPandas()
    got = np.stack(out.sort_values("vec_id")["pca"].to_numpy())
    ids = out.sort_values("vec_id")["vec_id"].to_numpy()
    x_sorted = x[np.argsort(pdf["vec_id"].to_numpy())]
    assert (np.sort(pdf["vec_id"].to_numpy()) == ids).all()
    exp = (x_sorted - mean) @ comps.T
    np.testing.assert_allclose(got, exp, atol=1e-9)

    # projection must be pure expressions: no Python UDFs in the plan
    plan = (
        pca_project(emb, comps, mean)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
