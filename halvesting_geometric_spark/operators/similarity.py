"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH random-hyperplane
bucketing as the scale path (candidates from bucket collisions, exact rerank
inside buckets). Dot products stay JVM-side (``zip_with`` + ``aggregate``
— see functions.cosine_similarity); the hyperplanes are tiny literal arrays
broadcast into the plan, derived from a seeded RNG (deterministic).

Reference analog: the dot-product link scorer
(``/root/reference/halvesting_geometric/modules/link_classifier.py:33-36``).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import cosine_similarity


def l2_normalize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Unit-norm vectors: v / ||v||₂ as pure array expressions — JVM-side,
    no UDF. Zero vectors pass through unchanged. Pass ``dim`` when the
    vector width is statically known (≤128): the norm and the output array
    then unroll into plain codegen arithmetic instead of interpreted
    higher-order functions (same accumulation order → bit-identical; see
    functions.unrolled_dot for the measured 8.8× fold penalty).
    Returns (id, unit: array<double>, norm: double)."""
    if dim is not None and 1 <= dim <= 128:
        v = F.col(vec_col)
        sq = v[0].cast("double") * v[0].cast("double")
        for i in range(1, dim):
            sq = sq + v[i].cast("double") * v[i].cast("double")
        staged = df.select(
            F.col(id_col),
            F.array(*[v[i].cast("double") for i in range(dim)]).alias("_v"),
            F.sqrt(sq).alias("norm"),
        )
        unit = F.array(
            *[F.col("_v")[i] / F.col("norm") for i in range(dim)]
        )
    else:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        # materialize the norm as a column FIRST: embedding the aggregate
        # inside the transform lambda would re-evaluate the O(d) reduction
        # per element (no CSE across higher-order-function calls) — O(d²)
        staged = df.select(
            F.col(id_col),
            v.alias("_v"),
            F.sqrt(
                F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
            ).alias("norm"),
        )
        unit = F.transform(F.col("_v"), lambda x: x / F.col("norm"))
    return staged.select(
        id_col,
        F.when(F.col("norm") > 0, unit).otherwise(F.col("_v")).alias("unit"),
        "norm",
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = round(x_i·scale) ∈ [−127, 127] — the standard storage/ANN
    compression (4× vs float32, 8× vs float64). Pure array expressions;
    round-half-up via floor(x+0.5) so external engines reproduce it
    bit-for-bit. All-zero vectors get scale 0 and all-zero codes.
    ``dim`` (statically-known width ≤128) unrolls the max-reduction and the
    code array into codegen arithmetic — same values, no interpreted HOFs.
    Returns (id, q: array<long>, scale: double).
    """
    if dim is not None and 1 <= dim <= 128:
        v = F.col(vec_col)
        amax = F.greatest(
            F.lit(0.0), *[F.abs(v[i].cast("double")) for i in range(dim)]
        )
        staged = df.select(
            F.col(id_col),
            F.array(*[v[i].cast("double") for i in range(dim)]).alias("_v"),
            F.when(amax > 0, F.lit(127.0) / amax)
            .otherwise(F.lit(0.0))
            .alias("scale"),
        )
        q = F.array(
            *[
                F.floor(F.col("_v")[i] * F.col("scale") + F.lit(0.5)).cast(
                    "long"
                )
                for i in range(dim)
            ]
        )
    else:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        amax = F.aggregate(
            v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
        )
        # stage the scale as a column (see l2_normalize: an aggregate
        # inlined in the transform lambda re-runs per element)
        staged = df.select(
            F.col(id_col),
            v.alias("_v"),
            F.when(amax > 0, F.lit(127.0) / amax)
            .otherwise(F.lit(0.0))
            .alias("scale"),
        )
        q = F.transform(
            F.col("_v"),
            lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("long"),
        )
    return staged.select(id_col, q.alias("q"), "scale")


def cosine_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is expected to be small — it is broadcast, so the corpus is
    scanned once with no shuffle on the pair space; only the per-query top-k
    window shuffles (keyed by query id).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine_similarity("qv", "cv", dim=dim).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(
    emb: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, bucket) — sign pattern over random hyperplanes.

    The plane matrix enters the plan as literal arrays (a few KB broadcast
    with the task binary); each sign is one zip_with/aggregate expression.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    sig = None
    for i, plane in enumerate(planes):
        if dim <= 128:
            # literal coefficients + getItem: stays in whole-stage codegen
            # (a HOF fold here runs interpreted once per plane per row —
            # see functions.unrolled_dot for the measured 8.8× penalty)
            v = F.col(vec_col)
            dot = v[0].cast("double") * float(plane[0])
            for j in range(1, dim):
                dot = dot + v[j].cast("double") * float(plane[j])
        else:
            lit_plane = F.array(*[F.lit(float(x)) for x in plane])
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col), lit_plane, lambda a, b: a.cast("double") * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i).cast("long")
        sig = bit if sig is None else sig + bit
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("embedding"),
        sig.alias("bucket"),
    )


def lsh_ann_topk(
    emb: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
    n_tables: int = 1,
    bucket_cap: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k per vector: candidates = bucket collisions across
    ``n_tables`` independent hash tables (different plane seeds), exact cosine
    rerank on the deduped candidate set.

    Scale levers (both deterministic, both oracle-replicable):

    - ``n_tables`` > 1 is the multi-band/multi-probe recall lever — a true
      neighbor missed by one table's planes is caught by another's.
    - ``bucket_cap`` bounds the per-bucket candidate blow-up: at most
      ``bucket_cap`` entries per (table, bucket), kept by ascending id, so the
      bucket-local pair count is ≤ cap², never O(bucket²) on a degenerate
      bucket (e.g. all-zero embeddings hashing together).

    The candidate set is deduped BEFORE the embedding-rerank joins, so each
    pair's cosine is computed once however many tables produced it.
    """
    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")
    cand: DataFrame | None = None
    for t in range(n_tables):
        b = lsh_bucket(
            emb, dim, n_planes, seed + t * 1_000_003, id_col, vec_col
        ).select("bucket", "id")
        if bucket_cap is not None:
            wc = Window.partitionBy("bucket").orderBy(F.col("id").asc())
            b = (
                b.withColumn("_rn", F.row_number().over(wc))
                .filter(F.col("_rn") <= bucket_cap)
                .drop("_rn")
            )
        pairs = (
            b.select("bucket", F.col("id").alias("query_id"))
            .join(b.select("bucket", F.col("id").alias("neighbor_id")), "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    scored = (
        cand.join(
            emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
            "query_id",
        )
        .join(
            emb.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("qv", "cv", dim=dim).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_near_dups(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    LSH candidate buckets. High thresholds → colliding buckets with high
    probability; multi-probe/multi-table extensions are seed variations."""
    b = lsh_bucket(emb, dim, n_planes, seed, id_col, vec_col)
    left = b.select("bucket", F.col("id").alias("a"), F.col("embedding").alias("va"))
    right = b.select("bucket", F.col("id").alias("b"), F.col("embedding").alias("vb"))
    # unrolled dot only below ~32 dims: inside the bucket join's codegen'd
    # consume a wide unrolled expression overflows the JVM 64KB method
    # limit and the stage falls back to interpreted eval; the compact
    # zip_with/aggregate loop form codegens and sums in the same index
    # order (identical float result)
    pair_dim = dim if dim and dim <= 32 else None
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", cosine_similarity("va", "vb", dim=pair_dim).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def kcenter_select(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Greedy 2-approximation k-center coreset (Gonzalez 1985) — the
    standard diversity-selection primitive for data curation: pick the
    smallest-id point, then repeatedly add the point FARTHEST from the
    selected set under e4-quantized cosine distance (ties → smallest id).

    Returns k rows (sel_order long, id long) in selection order.

    Scale shape: k − 1 rounds; each round is (a) one broadcast of the new
    center's single vector row, (b) one scan updating the running
    min-distance column ``least(md, dist_to_new_center)``, (c) one
    all-reduce ``max(struct(md, -id))`` to pick the farthest point — no
    global sort, no growing driver state beyond the k selected ids.
    Distances are quantized to e4 integers BEFORE any comparison, so the
    argmax is engine-portable (the DuckDB twin unrolls the same rounds).
    Lineage truncates per round via eager localCheckpoint on the k-row
    min-distance state join key only — the vectors stay in the cached
    input, never in the iterated state.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = emb.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = base.count()
    if k > n:
        raise ValueError(f"k={k} exceeds corpus size {n}")

    first = base.agg(F.min("id")).first()[0]
    selected = [int(first)]
    # md: e4 cosine DISTANCE (10000 - sim_e4) to the nearest selected center
    dist_e4 = (
        F.lit(10_000)
        - F.floor(cosine_similarity("v", "cv", dim=dim) * 10_000 + F.lit(0.5))
    ).cast("long")
    cvec = base.filter(F.col("id") == first).select(F.col("v").alias("cv"))
    mind = (
        base.crossJoin(F.broadcast(cvec))
        .select("id", dist_e4.alias("md"))
        .localCheckpoint(eager=True)
    )
    for _ in range(1, k):
        nxt = mind.filter(~F.col("id").isin(selected)).agg(
            F.max(F.struct(F.col("md"), (-F.col("id")).alias("nid")))
        ).first()[0]
        cid = -nxt["nid"]
        selected.append(int(cid))
        cvec = base.filter(F.col("id") == cid).select(F.col("v").alias("cv"))
        mind = (
            mind.join(base, "id")
            .crossJoin(F.broadcast(cvec))
            .select("id", F.least("md", dist_e4).alias("md"))
            .localCheckpoint(eager=True)
        )
    base.unpersist()
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(selected)], "sel_order long, id long"
    )


def mine_hard_negatives(
    candidates: DataFrame,
    positives: DataFrame,
    k: int = 10,
    score_col: str = "cosine",
) -> DataFrame:
    """Contrastive hard-negative mining over any retriever's candidates.

    ``candidates``: (query_id, neighbor_id, <score_col>) rows from any
    retrieval path — :func:`cosine_topk_bruteforce` with an over-fetched k
    at validation scale, :func:`lsh_ann_topk` / IVF at corpus scale.
    ``positives``: (query_id, positive_id) known-true pairs to exclude
    (same-label items, actually-cited papers, gold duplicates). Returns the
    per-query top-``k`` highest-scoring survivors — the "hard" negatives a
    contrastive trainer wants: maximally similar yet known-unrelated.

    Scale: one left_anti shuffle join on the composite (query, neighbor)
    key, then the per-query top-k window over an already per-query-bounded
    candidate set — the window never sees the raw corpus. Deterministic
    ties: (score desc, neighbor_id asc), same contract as the ANN top-ks.
    """
    neg = candidates.join(
        positives.select(
            F.col("query_id"), F.col("positive_id").alias("neighbor_id")
        ),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("neighbor_id").asc()
    )
    return (
        neg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
