"""IVF (inverted-file) approximate nearest-neighbor search over an
embedding column — the centroid-partitioned complement to the
random-hyperplane LSH path in ``similarity.py``.

Spherical variant (cosine metric): centroids are unit vectors; a vector is
assigned to the centroid of maximum cosine similarity; a query probes the
``nprobe`` nearest centroid cells and exact-reranks only candidates that
share a probed cell. Centroids are fit with Lloyd's k-means on the unit
sphere (deterministic seeding = the k lowest-id vectors, the same
determinism convention as the LSH hyperplane seeds).

Scale design: the centroid table is tiny (k·dim doubles — k ≤ a few
thousand) and rides to executors inside the Arrow-batched kernel closure,
so assignment is one ``mapInPandas`` scan (a single (batch × k) BLAS
matmul per Arrow batch — no per-row Python, no shuffle). The only shuffles
are the groupBy for centroid updates (k·dim partial aggregates) and the
candidate join keyed by cell id, whose fan-out is bounded by
``nprobe · cell size``; a ``cell_cap`` bounds degenerate cells the same
way ``bucket_cap`` bounds LSH buckets.

Cross-engine determinism for the correctness gate: similarities are ranked
on the 1e-4-rounded value with ascending-id tie-breaks (the same contract
as the ``knn_cosine`` gate), so Arrow float64 matmuls and DuckDB
``list_dot_product`` agree bit-for-bit on the ranking.

Reference analog: the dot-product link scorer
(``/root/reference/halvesting_geometric/modules/link_classifier.py:33-36``)
is the same similarity primitive; IVF is the standard way to serve it at
corpus scale (Jégou et al., TPAMI 2011 — public paper).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "seed_centroids",
    "kmeans_fit",
    "ivf_assign",
    "ivf_topk",
    "semdedup",
]


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def seed_centroids(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic init: the ``k`` lowest-id vectors, L2-normalized.
    Collects exactly k·dim floats — bounded driver state by construction."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need >= {k} vectors to seed, got {len(rows)}")
    return _unit_rows(np.array([r[1] for r in rows], dtype=np.float64))


def _assign_kernel(centroids: np.ndarray, id_col: str, vec_col: str):
    """mapInPandas kernel: per Arrow batch, one matmul against the centroid
    matrix; emits (id, cell, sim_e4). Ranking happens on the 1e-4-rounded
    similarity with the lowest centroid id winning ties — the portable
    contract."""
    cmat = centroids.T  # (dim, k)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat = _unit_rows(mat)
            sims = mat @ cmat  # (n, k)
            sims_e4 = np.floor(sims * 10_000.0 + 0.5).astype(np.int64)
            # np.argmax returns the FIRST index among ties = lowest centroid
            # id, matching the oracle's (sim_e4 DESC, cid ASC) ranking
            cell = sims_e4.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cell.astype(np.int64),
                    "sim_e4": sims_e4[np.arange(len(cell)), cell],
                }
            )

    return fn


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, sim_e4): nearest centroid per vector (cosine, rounded-1e-4
    ranking, lowest centroid id on ties)."""
    return emb.select(id_col, vec_col).mapInPandas(
        _assign_kernel(centroids, id_col, vec_col),
        schema=f"{id_col} long, cell long, sim_e4 long",
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's spherical k-means. Each iteration: one mapInPandas assignment
    scan + one (cell, dim-position) hash aggregate for the mean; the update
    collects k·dim partial sums (bounded). Returns (centroids, mean-sim
    history — non-decreasing up to rounding).

    The mean-aggregation uses posexplode → groupBy (cell, pos) — partial
    (map-side) aggregation keeps the shuffle at k·dim rows regardless of
    corpus size."""
    cent = seed_centroids(emb, k, id_col, vec_col)
    history: list[float] = []
    dim = cent.shape[1]
    for _ in range(iters):
        a = ivf_assign(emb, cent, id_col, vec_col)
        joined = emb.select(id_col, vec_col).join(a, id_col)
        sums = (
            joined.select(
                "cell",
                "sim_e4",
                F.posexplode(F.col(vec_col)).alias("pos", "x"),
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count("*").alias("n"),
                F.avg("sim_e4").alias("msim"),
            )
            .collect()
        )
        new = np.array(cent)  # keep empty cells where they were
        acc = np.zeros((k, dim))
        cnt = np.zeros(k)
        msim_total = 0.0
        for r in sums:
            acc[r["cell"], r["pos"]] = r["s"]
            cnt[r["cell"]] = r["n"]
            msim_total += r["msim"] * r["n"]
        nonempty = cnt > 0
        new[nonempty] = acc[nonempty] / cnt[nonempty, None]
        cent = _unit_rows(new)
        # each cell's (msim, n) arrives once per dim position — normalize by
        # N·dim, then /1e4 to read as mean cosine to the assigned centroid
        denom = cnt.sum() * dim
        history.append(msim_total / denom / 10_000.0 if denom else 0.0)
    return cent, history


def ivf_topk(
    emb: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    queries: DataFrame | None = None,
    cell_cap: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: str = "expr",
) -> DataFrame:
    """Approximate cosine top-k: candidates share one of the query's
    ``nprobe`` nearest centroid cells; exact rerank (rounded-1e-4 ranking,
    ascending neighbor-id tie-break — the ``knn_cosine`` contract).
    Returns (query_id, neighbor_id, sim_e4).

    ``rerank``: "expr" computes each candidate cosine as a Catalyst
    ``zip_with``/``aggregate`` expression (the oracle-twinned path);
    "arrow" streams the joined pair table through one mapInPandas kernel
    (a row-wise ``einsum`` per Arrow batch) — same rounded values, ~an
    order of magnitude faster when the candidate set is large (the rerank
    dominated the measured 2M-vector run; higher-order-function
    evaluation per pair is the cost, not the arithmetic).
    """
    if rerank not in ("expr", "arrow"):
        raise ValueError(f"rerank must be 'expr' or 'arrow', got {rerank!r}")
    from halvesting_geometric_spark.functions import cosine_similarity

    if queries is None:
        queries = emb
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    if cell_cap is not None:
        wcap = Window.partitionBy("cell").orderBy(F.col(id_col).asc())
        assign = (
            assign.withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= cell_cap)
            .drop("_rn")
        )
    cmat = centroids.T

    def probe_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _unit_rows(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            sims_e4 = np.floor(mat @ cmat * 10_000.0 + 0.5).astype(np.int64)
            # top-nprobe cells by (sim_e4 desc, cid asc): lexsort on
            # (cid asc) then stable sort by -sim keeps low cids first on ties
            order = np.argsort(-sims_e4, axis=1, kind="stable")[:, :nprobe]
            ids = np.repeat(pdf[id_col].to_numpy(), order.shape[1])
            yield pd.DataFrame(
                {"query_id": ids, "cell": order.reshape(-1).astype(np.int64)}
            )

    probes = queries.select(id_col, vec_col).mapInPandas(
        probe_fn, schema="query_id long, cell long"
    )
    cand = (
        probes.join(
            assign.select("cell", F.col(id_col).alias("neighbor_id")), "cell"
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    paired = cand.join(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "query_id",
    ).join(
        emb.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        "neighbor_id",
    )
    if rerank == "expr":
        scored = paired.select(
            "query_id",
            "neighbor_id",
            F.floor(
                cosine_similarity("qv", "cv", dim=int(centroids.shape[1]))
                * 10_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("sim_e4"),
        )
    else:

        def rerank_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q = np.array(pdf["qv"].tolist(), dtype=np.float64)
                c = np.array(pdf["cv"].tolist(), dtype=np.float64)
                dots = np.einsum("ij,ij->i", q, c)
                qn = np.linalg.norm(q, axis=1)
                cn = np.linalg.norm(c, axis=1)
                denom = qn * cn
                sims = np.where(denom > 0, dots / np.where(denom == 0, 1, denom), 0.0)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(),
                        "neighbor_id": pdf["neighbor_id"].to_numpy(),
                        "sim_e4": np.floor(sims * 10_000.0 + 0.5).astype(
                            np.int64
                        ),
                    }
                )

        scored = paired.select("query_id", "neighbor_id", "qv", "cv").mapInPandas(
            rerank_fn, schema="query_id long, neighbor_id long, sim_e4 long"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_e4").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim_e4")
    )


def semdedup(
    emb: DataFrame,
    centroids: np.ndarray,
    dim: int | None = None,
    threshold_e4: int = 9500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = 1_000_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public paper):
    semantic near-duplicate pruning by clustering embeddings and comparing
    pairs only WITHIN a cluster. Returns every input vector as
    (id, cell, sim_e4, kept) where ``sim_e4`` is the 1e-4-rounded cosine to
    the assigned centroid and ``kept`` is the survival flag.

    Keep policy (the paper's low-centroid-similarity rule, made
    deterministic): within any same-cell pair whose pairwise cosine rounds
    to >= ``threshold_e4``, the member FARTHER from the centroid survives —
    an item is dropped iff some same-cell neighbor above the threshold has
    strictly lower ``sim_e4`` (ties broken by lower id). Priorities form a
    total order, so the drop set is unique and SQL-replayable.

    Scale design: assignment is the IVF Arrow kernel (one matmul per batch,
    no shuffle); the pair scan shuffles once on cell id and compares
    |cell|^2 candidates per cell — exactly the paper's cost model, where k
    is chosen to keep clusters bounded (they use k ~ sqrt(N)). The witness
    join is cell-keyed (never a global cross join) and stops at a semi
    join: only the existence of a higher-priority neighbor matters, so no
    pair list is materialized. ``max_cell_size`` guards degenerate
    clusterings: the operator raises rather than silently running a
    quadratic scan over an oversized cell (pick a larger k or better
    centroids).
    """
    from halvesting_geometric_spark.functions import cosine_similarity

    assign = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    if max_cell_size is not None:
        big = (
            assign.groupBy("cell")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_cell_size)
            .limit(1)
            .collect()
        )
        if big:
            raise ValueError(
                f"cell {big[0]['cell']} holds {big[0]['n']} vectors "
                f"(> max_cell_size={max_cell_size}); the within-cell pair "
                "scan is quadratic — refit with larger k"
            )
    pts = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(assign.withColumnRenamed(id_col, "id"), "id")
    left = pts.select("cell", F.col("id").alias("a"),
                      F.col("sim_e4").alias("pa"), F.col("v").alias("va"))
    right = pts.select("cell", F.col("id").alias("b"),
                       F.col("sim_e4").alias("pb"), F.col("v").alias("vb"))
    # unrolled dot only for narrow vectors: above ~32 dims the unrolled
    # expression inside the join's codegen'd consume overflows the JVM
    # 64KB method limit and the whole stage falls back to interpreted —
    # the compact zip_with/aggregate loop form codegens fine and sums in
    # the same index order (identical float result)
    pair_e4 = F.floor(
        cosine_similarity("va", "vb", dim=dim if dim and dim <= 32 else None)
        * 10_000
        + F.lit(0.5)
    ).cast("long")
    dropped = (
        left.join(right, "cell")
        .filter(
            (F.col("pb") < F.col("pa"))
            | ((F.col("pb") == F.col("pa")) & (F.col("b") < F.col("a")))
        )
        .filter(pair_e4 >= threshold_e4)
        .select(F.col("a").alias("id"))
        .distinct()
    )
    return (
        assign.withColumnRenamed(id_col, "id")
        .join(dropped.withColumn("_d", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            "sim_e4",
            F.col("_d").isNull().alias("kept"),
        )
    )
