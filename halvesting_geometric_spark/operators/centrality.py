"""Seeded and mutual-reinforcement centralities (engine-new, beyond the
reference's analytics surface — same gather/scatter substrate as
``operators/pagerank.py``).

- :func:`personalized_pagerank` — random-walk-with-restart: the teleport
  (and dangling) mass returns to a seed set instead of spreading uniformly.
  The per-superstep execution shape matches ``pagerank``: cached pure
  (src, dst) topology, per-VERTEX contribution divide, a single left join
  pairing state with scatter sums, one aggregate per iteration that also
  yields the next iteration's dangling mass, lazy localCheckpoint lineage
  truncation.
- :func:`hits` — hubs/authorities with per-iteration L1 normalization (the
  normalization constant is computed in the same aggregate that sums the
  scatter, so each half-step is one job).

Both are deterministic fixed-iteration operators, so an external ANSI-SQL
engine can replicate them exactly (the correctness gate's DuckDB twins unroll
the iterations as CTEs).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _topology(edges: DataFrame, n_shuffle: int) -> DataFrame:
    return (
        edges.select("src", "dst")
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def personalized_pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    seeds: DataFrame | list[int],
    damping: float = 0.85,
    fixed_iters: int = 10,
) -> DataFrame:
    """Personalized PageRank over the seed set.

    rank'(v) = (1-d)·1{v∈S}/|S| + d·(Σ_{u→v} rank(u)/outdeg(u)
               + dangling_mass·1{v∈S}/|S|)

    so Σ rank = 1 every iteration and all teleport/dangling mass restarts at
    the seeds. ``seeds``: DataFrame with ``vertex_id`` or a list of ids.
    Returns (vertex_id, rank).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if fixed_iters < 0:
        raise ValueError(f"fixed_iters must be >= 0, got {fixed_iters}")
    spark = edges.sparkSession
    if isinstance(seeds, (list, tuple)):
        seeds = spark.createDataFrame(
            [(int(s),) for s in seeds], "vertex_id long"
        )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    verts = (
        vertices.select("vertex_id")
        .join(
            out_deg.select(F.col("src").alias("vertex_id"), "out_deg"),
            "vertex_id",
            "left",
        )
        .join(
            seeds.select("vertex_id", F.lit(True).alias("_s")).distinct(),
            "vertex_id",
            "left",
        )
        .select(
            "vertex_id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("_s", F.lit(False)).alias("is_seed"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    st = verts.agg(
        F.sum(F.when(F.col("is_seed"), 1).otherwise(0)).alias("n_seed"),
        F.sum(
            F.when(F.col("is_seed") & (F.col("out_deg") == 0), 1).otherwise(0)
        ).alias("n_seed_dangling"),
    ).first()
    n_seed = int(st["n_seed"] or 0)
    if n_seed == 0:
        raise ValueError("seed set is empty (or disjoint from vertices)")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo = _topology(edges, n_shuffle)
    topo.count()

    ranks = verts.select(
        "vertex_id",
        F.when(F.col("is_seed"), F.lit(1.0) / n_seed)
        .otherwise(F.lit(0.0))
        .alias("rank"),
        "out_deg",
        "is_seed",
    )
    dangling = int(st["n_seed_dangling"] or 0) / float(n_seed)
    prev_paired: DataFrame | None = None
    for _ in range(fixed_iters):
        rank_w = ranks.filter(F.col("out_deg") > 0).select(
            F.col("vertex_id").alias("src"),
            (F.col("rank") / F.col("out_deg")).alias("contrib"),
        )
        sums = (
            topo.join(rank_w, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("msg_sum"))
        )
        seed_mass = (1.0 - damping) / n_seed + damping * dangling / n_seed
        rank_expr = (
            F.when(F.col("is_seed"), F.lit(seed_mass)).otherwise(F.lit(0.0))
            + F.lit(damping) * F.coalesce(F.col("msg_sum"), F.lit(0.0))
        ).alias("rank")
        paired = (
            ranks.select("vertex_id", "out_deg", "is_seed")
            .join(
                sums.select(F.col("dst").alias("vertex_id"), "msg_sum"),
                "vertex_id",
                "left",
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        agg = paired.agg(
            F.sum(
                F.when(F.col("out_deg") == 0, rank_expr).otherwise(F.lit(0.0))
            ).alias("next_dangling")
        ).first()
        dangling = float(agg["next_dangling"] or 0.0)
        ranks = paired.select(
            "vertex_id", rank_expr, "out_deg", "is_seed"
        ).localCheckpoint(eager=False)
        if prev_paired is not None:
            prev_paired.unpersist()
        prev_paired = paired
    out = ranks.select("vertex_id", "rank")
    out.count()
    if prev_paired is not None:
        prev_paired.unpersist()
    topo.unpersist()
    verts.unpersist()
    return out


def hits(
    edges: DataFrame,
    vertices: DataFrame,
    fixed_iters: int = 5,
) -> DataFrame:
    """Hubs and authorities (Kleinberg), L1-normalized every half-step:

        auth_k(v) = Σ_{u→v} hub_{k-1}(u)   then auth_k /= Σ auth_k
        hub_k(u)  = Σ_{u→v} auth_k(v)      then hub_k  /= Σ hub_k

    Initial hub = 1/n. Returns (vertex_id, hub, auth); auth/hub are 0.0 for
    a vertex with no in/out edges respectively. Precondition: the graph has
    at least one edge whose endpoints are in ``vertices`` (an edge-free graph
    has no normalizable HITS solution — raises ValueError). Deterministic, so
    the gate's DuckDB twin unrolls the same recurrence.
    """
    if fixed_iters < 1:
        raise ValueError(f"fixed_iters must be >= 1, got {fixed_iters}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo = _topology(edges, n_shuffle)
    topo.count()
    verts = vertices.select("vertex_id").persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()

    hub = verts.select("vertex_id", (F.lit(1.0) / n).alias("score"))
    auth = None
    prev: list[DataFrame] = []
    for _ in range(fixed_iters):
        a_raw = (
            topo.join(
                hub.select(F.col("vertex_id").alias("src"), "score"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
        )
        a_full = (
            verts.join(
                a_raw.select(F.col("dst").alias("vertex_id"), "raw"),
                "vertex_id",
                "left",
            )
            .select(
                "vertex_id", F.coalesce("raw", F.lit(0.0)).alias("raw")
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        norm_a = float(a_full.agg(F.sum("raw")).first()[0] or 0.0)
        if norm_a == 0.0:
            raise ValueError("graph has no edges reaching any vertex")
        auth = a_full.select(
            "vertex_id", (F.col("raw") / norm_a).alias("score")
        )
        h_raw = (
            topo.join(
                auth.select(F.col("vertex_id").alias("dst"), "score"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("score").alias("raw"))
        )
        h_full = (
            verts.join(
                h_raw.select(F.col("src").alias("vertex_id"), "raw"),
                "vertex_id",
                "left",
            )
            .select(
                "vertex_id", F.coalesce("raw", F.lit(0.0)).alias("raw")
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        norm_h = float(h_full.agg(F.sum("raw")).first()[0] or 0.0)
        hub = h_full.select(
            "vertex_id", (F.col("raw") / norm_h).alias("score")
        ).localCheckpoint(eager=False)
        auth = auth.localCheckpoint(eager=False)
        for p in prev:
            p.unpersist()
        prev = [a_full, h_full]
    out = (
        hub.select("vertex_id", F.col("score").alias("hub"))
        .join(
            auth.select("vertex_id", F.col("score").alias("auth")),
            "vertex_id",
        )
        .select("vertex_id", "hub", "auth")
    )
    out.count()
    for p in prev:
        p.unpersist()
    topo.unpersist()
    verts.unpersist()
    return out
