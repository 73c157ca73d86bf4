"""Embedding-matrix statistics and PCA compression (engine-new).

Training-data pipelines whiten, compress, or dedupe embedding corpora;
the substrate is the Gram/covariance matrix. For a d-dim embedding
column over n rows the sufficient statistics are X^T X (d×d), the column
sums (d), and n — tiny for any realistic d, so the Spark job computes
per-partition partials in one Arrow-batched pass (``mapInPandas`` →
``numpy`` ``X.T @ X`` per batch; no shuffle of the raw vectors, one
driver-side combine of d×d partials), and the eigendecomposition runs on
the driver with numpy on the d×d matrix — the standard
tall-skinny-matrix PCA split (compute-heavy distributed pass, O(d²)
driver math).

``pca_project`` broadcasts the top-k components back as array literals
and projects with ``aggregate``/``zip_with`` expressions — JVM-side,
codegen'd, no Python in the projection path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(
    df: DataFrame, emb_col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """(X^T X as (d,d) float64, column sums as (d,), n): one distributed
    Arrow pass + a driver combine of the tiny per-partition partials."""
    if dim is None:
        first = df.select(F.size(emb_col)).first()
        if first is None:
            raise ValueError("embedding_moments on an empty DataFrame")
        dim = int(first[0])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.float64)
        sums = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            x = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            gram += x.T @ x
            sums += x.sum(axis=0)
            n += x.shape[0]
        if n:
            yield pd.DataFrame(
                {
                    "gram": [gram.ravel().tolist()],
                    "sums": [sums.tolist()],
                    "n": [n],
                }
            )

    parts = (
        df.select(F.col(emb_col).cast("array<double>").alias("e"))
        .mapInPandas(
            partials, schema="gram array<double>, sums array<double>, n long"
        )
        .collect()
    )
    gram = np.zeros((dim, dim), dtype=np.float64)
    sums = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in parts:
        gram += np.array(r["gram"], dtype=np.float64).reshape(dim, dim)
        sums += np.array(r["sums"], dtype=np.float64)
        n += r["n"]
    if n == 0:
        raise ValueError("embedding_moments on an empty DataFrame")
    return gram, sums, n


def covariance_matrix(
    df: DataFrame, emb_col: str = "embedding", dim: int | None = None
) -> np.ndarray:
    """Population covariance C = X^T X / n − mean mean^T (d×d numpy)."""
    gram, sums, n = embedding_moments(df, emb_col, dim)
    mean = sums / n
    return gram / n - np.outer(mean, mean)


def pca(
    df: DataFrame, k: int, emb_col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components (k,d), explained_variance (k,), mean (d,)) — top-k
    principal axes of the embedding corpus, deterministic sign convention
    (largest-|coord| entry of each component is positive)."""
    gram, sums, n = embedding_moments(df, emb_col, dim)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = components @ (x − mean): the projection runs as
    codegen'd array expressions over broadcast literal components — no
    Python, no shuffle."""
    # Measured (2M×64, k=8, BENCH/BASELINE.md round 3): unrolling all k·d
    # terms into one giant projection expression is 0.4× — the generated
    # method for k·d=512 terms blows past JIT limits and deoptimizes. The
    # staged-fold form below wins whenever k > 1; single-dot consumers
    # (cosine, attention) are where unrolling pays (8.8×).
    centered = F.zip_with(
        F.col(emb_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    # stage the centered array once; an aggregate per component then reads it
    staged = df.withColumn("_c", centered)
    projections = [
        F.aggregate(
            F.zip_with(
                F.col("_c"),
                F.array(*[F.lit(float(w)) for w in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in components
    ]
    return staged.withColumn(out_col, F.array(*projections)).drop("_c")
