"""Neighborhood function N(t) = #(u, v) pairs with dist(u→v) ≤ t.

The distance-distribution primitive behind effective-diameter and
closeness/harmonic centrality reports. Two implementations:

- :func:`neighborhood_function_exact` — all-pairs frontier expansion as a
  DataFrame fixpoint. State is the full reachability set (O(n·reach) rows):
  exact, the correctness oracle, validation-scale only.
- :func:`neighborhood_function_hll` — the HyperBall algorithm (Boldi &
  Vigna 2013): one HyperLogLog sketch per vertex, each superstep unions the
  sketches of out-neighbors (``hll_union_agg`` — Spark's Datasketches
  aggregate, map-side combinable), so state is O(n · 2^lgk) bytes
  regardless of reachability size. This is how web-scale graphs get
  distance distributions; per-superstep cost is one gather join, the same
  shape as the PageRank driver. Estimates are deterministic for a fixed
  lgConfigK (the sketch hash is fixed), so results are reproducible, and
  pytest pins them within HLL error of exact.

Cross-check: ``neighborhood_function_hll`` ≈ exact within ~1.04/√(2^lgk)
relative error per point.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighborhood_function_exact(
    edges: DataFrame, vertices: DataFrame, max_t: int
) -> DataFrame:
    """Exact N(t) for t = 0..max_t. Returns (t, n_pairs); pairs are ordered
    (u, v) with v reachable from u in ≤ t hops, including u itself (t=0
    counts |V|). Stops early at the fixpoint (then the remaining t rows
    repeat the converged count, matching the definition)."""
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo = (
        edges.select("src", "dst")
        .distinct()
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reach = (
        vertices.select(F.col("vertex_id").alias("u"), F.col("vertex_id").alias("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = [(0, reach.count())]
    prev_caches: list[DataFrame] = [reach]
    for t in range(1, max_t + 1):
        # eager localCheckpoint, not persist: reach is referenced twice per
        # iteration (union + join), so an un-truncated plan doubles per
        # superstep and the driver OOMs stringifying it at larger max_t
        nxt = (
            reach.unionByName(
                reach.join(topo, reach["v"] == topo["src"]).select(
                    "u", F.col("dst").alias("v")
                )
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        for p in prev_caches:
            p.unpersist()
        prev_caches = [nxt]
        converged = n == counts[-1][1]
        counts.append((t, n))
        reach = nxt
        if converged:
            counts.extend((k, n) for k in range(t + 1, max_t + 1))
            break
    for p in prev_caches:
        p.unpersist()
    topo.unpersist()
    return spark.createDataFrame(counts, "t long, n_pairs long")


def distances_exact(
    edges: DataFrame, vertices: DataFrame, max_t: int
) -> DataFrame:
    """All-pairs hop distances up to ``max_t``: (u, v, dist) for every v
    reachable from u in ≤ max_t hops (dist 0 for u=v). The same frontier
    fixpoint as :func:`neighborhood_function_exact` but keeping the
    first-discovery round — validation-scale state (O(n·reach) rows)."""
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo = (
        edges.select("src", "dst")
        .distinct()
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dist = (
        vertices.select(
            F.col("vertex_id").alias("u"),
            F.col("vertex_id").alias("v"),
            F.lit(0).cast("long").alias("dist"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = dist
    prev_caches: list[DataFrame] = [dist]
    for t in range(1, max_t + 1):
        nxt = (
            frontier.join(topo, frontier["v"] == topo["src"])
            .select("u", F.col("dst").alias("v"))
            .distinct()
            .join(dist.select("u", "v"), ["u", "v"], "left_anti")
            .select("u", "v", F.lit(t).cast("long").alias("dist"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        for p in prev_caches:
            p.unpersist()
        prev_caches = [nxt]
        frontier = nxt
    out = dist
    for p in prev_caches:
        p.unpersist()
    topo.unpersist()
    return out


def harmonic_centrality_exact(
    edges: DataFrame, vertices: DataFrame, max_t: int
) -> DataFrame:
    """Harmonic centrality H(v) = Σ_{u≠v, d(u→v) ≤ max_t} 1/d(u→v) —
    the centrality variant that handles disconnected graphs gracefully
    (unreachable pairs contribute 0). Exact within the ``max_t`` horizon;
    validation-scale (all-pairs state). Returns (vertex_id, harmonic).
    """
    d = distances_exact(edges, vertices, max_t)
    h = (
        d.filter(F.col("dist") > 0)
        .groupBy("v")
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"))
    )
    return (
        vertices.select("vertex_id")
        .join(h.select(F.col("v").alias("vertex_id"), "harmonic"), "vertex_id", "left")
        .select(
            "vertex_id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")
        )
    )


def harmonic_centrality_hll(
    edges: DataFrame, vertices: DataFrame, max_t: int, lgk: int = 12
) -> DataFrame:
    """HyperBall harmonic centrality (Boldi-Vigna 2013 §4): per-vertex
    IN-neighborhood ball sizes |B(v,t)| estimated with HLL sketches;
    H(v) ≈ Σ_t (|B(v,t)| − |B(v,t−1)|)/t. State O(n·2^lgk) regardless of
    ball sizes — the web-scale path, pytest-pinned against exact. Sketches
    propagate along REVERSED edges so the ball counts u with d(u→v) ≤ t.
    Returns (vertex_id, harmonic: double).
    """
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    if not 4 <= lgk <= 21:
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # reverse: v's ball must collect sources u that can REACH v
    topo = (
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        .distinct()
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sk = (
        vertices.select("vertex_id")
        .groupBy("vertex_id")
        .agg(F.hll_sketch_agg("vertex_id", F.lit(lgk)).alias("sk"))
        .select(
            "vertex_id",
            "sk",
            F.hll_sketch_estimate("sk").alias("ball"),
            F.lit(0.0).alias("harmonic"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sk.count()
    prev_caches: list[DataFrame] = [sk]
    for t in range(1, max_t + 1):
        gathered = (
            topo.join(
                sk.select(F.col("vertex_id").alias("dst"), "sk"), "dst"
            )
            .groupBy("src")
            .agg(F.hll_union_agg("sk", F.lit(False)).alias("nbr_sk"))
        )
        nxt = (
            sk.join(
                gathered.select(F.col("src").alias("vertex_id"), "nbr_sk"),
                "vertex_id",
                "left",
            )
            .select(
                "vertex_id",
                F.when(F.col("nbr_sk").isNull(), F.col("sk"))
                .otherwise(F.hll_union("sk", "nbr_sk"))
                .alias("sk"),
                F.col("ball").alias("prev_ball"),
                "harmonic",
            )
            .withColumn("ball", F.hll_sketch_estimate("sk"))
            .withColumn(
                "harmonic",
                F.col("harmonic")
                + F.greatest(
                    F.col("ball") - F.col("prev_ball"), F.lit(0.0)
                )
                / F.lit(float(t)),
            )
            .select("vertex_id", "sk", "ball", "harmonic")
            .localCheckpoint(eager=True)
        )
        for p in prev_caches:
            p.unpersist()
        prev_caches = [nxt]
        sk = nxt
    out = sk.select("vertex_id", "harmonic").localCheckpoint(eager=True)
    for p in prev_caches:
        p.unpersist()
    topo.unpersist()
    return out


def effective_diameter(
    nf: DataFrame, fraction: float = 0.9
) -> float:
    """Interpolated effective diameter from a neighborhood-function result
    (either variant): the smallest (fractional) t at which N(t) reaches
    ``fraction`` of the final point, linearly interpolated between integer
    t — the HyperANF/ANF convention. Driver-side math on the handful of
    collected (t, count) points."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    col = "n_pairs" if "n_pairs" in nf.columns else "n_pairs_est"
    pts = sorted(
        (int(r["t"]), float(r[col])) for r in nf.select("t", col).collect()
    )
    if not pts:
        raise ValueError("neighborhood function is empty")
    target = fraction * pts[-1][1]
    prev_t, prev_n = pts[0]
    if prev_n >= target:
        return float(prev_t)
    for t, n in pts[1:]:
        if n >= target:
            if n == prev_n:
                return float(t)
            return prev_t + (target - prev_n) / (n - prev_n)
        prev_t, prev_n = t, n
    return float(pts[-1][0])


def neighborhood_function_hll(
    edges: DataFrame,
    vertices: DataFrame,
    max_t: int,
    lgk: int = 12,
    rel_tol: float = 1e-4,
) -> DataFrame:
    """HyperBall: approximate N(t) via per-vertex HLL sketches.

    sketch_{t+1}(v) = sketch_t(v) ∪ ⋃_{v→w} sketch_t(w); N(t) is the sum of
    per-vertex estimates. ``lgk`` trades memory (2^lgk bytes per vertex) for
    accuracy (~1.04/√2^lgk relative error). Stops early when the total
    estimate grows by less than ``rel_tol`` relative (the HyperANF
    convergence rule) — later t rows then repeat the converged value, same
    padding convention as the exact variant. Returns
    (t, n_pairs_est: double).
    """
    if max_t < 0:
        raise ValueError(f"max_t must be >= 0, got {max_t}")
    if not 4 <= lgk <= 21:
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo = (
        edges.select("src", "dst")
        .distinct()
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sk = (
        vertices.select("vertex_id")
        .groupBy("vertex_id")
        .agg(F.hll_sketch_agg("vertex_id", F.lit(lgk)).alias("sk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    est = sk.agg(
        F.sum(F.hll_sketch_estimate("sk")).alias("s")
    ).first()["s"]
    counts = [(0, float(est))]
    prev_caches: list[DataFrame] = [sk]
    for t in range(1, max_t + 1):
        gathered = (
            topo.join(
                sk.select(F.col("vertex_id").alias("dst"), "sk"), "dst"
            )
            .groupBy("src")
            .agg(F.hll_union_agg("sk", F.lit(False)).alias("nbr_sk"))
        )
        # eager localCheckpoint: sk is referenced twice (gather + merge), so
        # persist alone would double the logical plan per superstep
        nxt = (
            sk.join(
                gathered.select(F.col("src").alias("vertex_id"), "nbr_sk"),
                "vertex_id",
                "left",
            )
            .select(
                "vertex_id",
                F.when(
                    F.col("nbr_sk").isNull(), F.col("sk")
                )
                .otherwise(F.hll_union("sk", "nbr_sk"))
                .alias("sk"),
            )
            .localCheckpoint(eager=True)
        )
        est = nxt.agg(
            F.sum(F.hll_sketch_estimate("sk")).alias("s")
        ).first()["s"]
        prev_est = counts[-1][1]
        counts.append((t, float(est)))
        for p in prev_caches:
            p.unpersist()
        prev_caches = [nxt]
        sk = nxt
        if prev_est > 0 and (float(est) - prev_est) / prev_est < rel_tol:
            counts.extend(
                (k, float(est)) for k in range(t + 1, max_t + 1)
            )
            break
    for p in prev_caches:
        p.unpersist()
    topo.unpersist()
    return spark.createDataFrame(counts, "t long, n_pairs_est double")


def reach_sketch(
    edges: DataFrame,
    vertices: DataFrame,
    rounds: int,
    lgk: int = 8,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Per-vertex DOWNSTREAM-reachability cardinality sketches — directed
    HyperBall (Boldi & Vigna's HLL propagation run along out-edges):
    after k rounds each vertex's sketch covers every vertex reachable in
    ≤ k hops, so on a DAG of depth ≤ k it is the full descendant set.
    "How many documents does this conversation transitively influence?"
    at 10^12 scale with 2^lgk bounded state per vertex.

    State is the sparse (vertex_id, reg, rho) register table from
    ``sketch.hll_sketch``; one round = gather successors' registers
    across out-edges + register-MAX merge (map-side combined groupBy) —
    the same associative/idempotent fold as every HLL op here, so the
    fixpoint is order-insensitive and restart-safe. Estimate per vertex
    with ``sketch.hll_estimate`` grouped by vertex_id; the gate pins the
    REGISTERS bit-for-bit (estimator floats stay out of the hash).
    """
    from halvesting_geometric_spark.operators.sketch import hll_sketch

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    state = hll_sketch(
        vertices.select("vertex_id"),
        "vertex_id",
        group_cols=("vertex_id",),
        lgk=lgk,
        hash_method=hash_method,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    topo = edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    topo.count()
    for _ in range(rounds):
        gathered = (
            topo.join(
                state.select(F.col("vertex_id").alias("dst"), "reg", "rho"),
                "dst",
            )
            .select(F.col("src").alias("vertex_id"), "reg", "rho")
        )
        nxt = (
            state.unionByName(gathered)
            .groupBy("vertex_id", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nxt.count()
        state.unpersist()
        state = nxt
    topo.unpersist()
    return state
