"""FastRP graph embeddings: iterated sparse random projection.

Chen, Sui, Perozzi, Skiena, "Fast and Accurate Network Embeddings via Very
Sparse Random Projection" (CIKM'19): embed every vertex as a weighted sum of
degree-normalized adjacency powers applied to a very sparse random projection
matrix,

    E = Σ_k w_k · normalize( (D⁻¹A)^k · R ),   R_{vj} ∈ {+√3, 0, −√3}

(Achlioptas s=3 projection: ±√3 with probability 1/6 each). No training loop,
no gradient — the whole embedding is k rounds of the SAME neighbor-mean
dataflow the engine's SAGE substrate already runs
(:func:`operators.neighbors.aggregate_neighbors`: gather join + Arrow
partial-aggregation kernel, hub-safe map-side combine), which is why it
scales exactly as far as the other supersteps.

Engine-new per ``BASELINE.json`` ``north_rule``: the reference learns
embeddings with a torch GNN
(``/root/reference/halvesting_geometric/modules/sage.py``); FastRP is the
data-side, deterministic, cluster-scale analog producing the same artifact
shape (vertex → array<double>) for the downstream ANN / link-prediction
operators (``similarity.py``, ``linkpred.py``).

Determinism: R is not sampled — R_{vj} is derived from the engine's
selectable 64-bit hash of (vertex_id, j, seed) (``hash_method='xxhash64'``
on the scale path, ``'portable'`` for the cross-engine DuckDB twin), so the
embedding is a pure function of the graph, bit-reproducible across runs and
engines. Per-iteration per-vertex L2 normalization keeps magnitudes
comparable across powers (GDS-style); the final vector is L2-normalized too,
ready for cosine ANN.

Zero-mass cases are defined: a vertex with no neighbors contributes a zero
vector at every power k ≥ 1 (its final embedding is w_0-weighted projection
only if ``include_self``, else zero); zero-norm vectors stay zero rather than
NaN.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.neighbors import aggregate_neighbors
from halvesting_geometric_spark.operators.sampling import hash64

_SQRT3 = math.sqrt(3.0)


def _l2_normalize(col: Column) -> Column:
    """L2-normalize an array<double>; zero vectors pass through unchanged."""
    nrm = F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x)
    )
    return F.when(
        nrm > 0.0, F.transform(col, lambda x: x / nrm)
    ).otherwise(col)


def fastrp_projection(
    vertices: DataFrame,
    dim: int,
    seed: int = 42,
    hash_method: str = "xxhash64",
    id_col: str = "vertex_id",
) -> DataFrame:
    """The sparse projection R as (vertex_id, features: array<double>).

    R_{vj} = +√3 / −√3 / 0 for hash(v, j, seed) mod 6 = 0 / 1 / other —
    expectation 0, variance 1/… per Achlioptas s=3; dim hash expressions
    per row, all inside codegen (no Python)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    cells = [
        F.when(
            hash64(hash_method, F.col(id_col), F.lit(j), seed=seed) % 6 == 0,
            F.lit(_SQRT3),
        )
        .when(
            hash64(hash_method, F.col(id_col), F.lit(j), seed=seed) % 6 == 1,
            F.lit(-_SQRT3),
        )
        .otherwise(F.lit(0.0))
        for j in range(dim)
    ]
    return vertices.select(
        F.col(id_col).alias("vertex_id"), F.array(*cells).alias("features")
    )


def fastrp_embeddings(
    edges: DataFrame,
    vertices: DataFrame,
    dim: int = 8,
    iters: int = 3,
    weights: Sequence[float] | None = None,
    seed: int = 42,
    hash_method: str = "xxhash64",
    symmetrize: bool = True,
) -> DataFrame:
    """FastRP embedding table (vertex_id, embedding: array<double>).

    ``weights``: one weight per adjacency power 1..iters (default all 1.0).
    ``symmetrize``: mean-aggregate over the undirected neighborhood (the
    usual FastRP setting); False keeps in-neighbor direction only.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if weights is None:
        weights = [1.0] * iters
    if len(weights) != iters:
        raise ValueError(
            f"need {iters} weights, got {len(weights)}"
        )
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    verts = vertices.select("vertex_id")
    x = fastrp_projection(verts, dim, seed=seed, hash_method=hash_method)
    zero = F.array_repeat(F.lit(0.0), dim)
    acc = None
    for k in range(iters):
        agg = aggregate_neighbors(
            x, e, dim, feature_col="features", agg="mean", direction="in"
        )
        # absent vertices (no in-neighbors) are zero vectors at this power
        x = (
            verts.join(
                agg.select("vertex_id", "agg_vec"), "vertex_id", "left"
            )
            .select(
                "vertex_id",
                _l2_normalize(F.coalesce("agg_vec", zero)).alias(
                    "features"
                ),
            )
            .localCheckpoint(eager=False)
        )
        w = float(weights[k])
        term = x.select(
            "vertex_id",
            F.transform("features", lambda v: v * F.lit(w)).alias("_t"),
        )
        acc = (
            term
            if acc is None
            else acc.join(term, "vertex_id").select(
                "vertex_id",
                F.zip_with("_t", F.col("_t2"), lambda a, b: a + b).alias(
                    "_t"
                ),
            )
        )
        # pre-rename for the next join round
        acc = acc.select("vertex_id", F.col("_t").alias("_t2")).localCheckpoint(
            eager=False
        )
    return acc.select(
        "vertex_id",
        _l2_normalize(F.col("_t2")).alias("embedding"),
    )
