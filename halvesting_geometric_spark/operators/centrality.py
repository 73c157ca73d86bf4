"""Seeded and mutual-reinforcement centralities (engine-new, beyond the
reference's analytics surface — same gather/scatter substrate as
``operators/pagerank.py``).

- :func:`personalized_pagerank` — random-walk-with-restart: the teleport
  (and dangling) mass returns to a seed set instead of spreading uniformly.
  The per-superstep execution shape matches ``pagerank``: cached pure
  (src, dst) topology, per-VERTEX contribution divide, a single left join
  pairing state with scatter sums.
- :func:`hits` — hubs/authorities with per-half-step L1 normalization.

Both are fixed-iteration, so neither needs ANY per-iteration driver
synchronization: the dangling mass (ppr) and the L1 norms (hits) are
in-plan 1-row broadcast aggregates, every intermediate state is a lazy
``localCheckpoint`` whose consumers share one RDD, and the entire
recurrence materializes in ONE Spark job at the final action — the
fixed-iteration analog of pagerank's ``delta_check_every`` batching
(measured there: driver-floor amortization took 27-iteration sf0.1
pagerank from ~90 to 151 iters/min and made walls load-insensitive).

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


def _compact_topology(
    edges: DataFrame, vertices: DataFrame, n_shuffle: int
):
    """(topo, verts, id_type): the cached (src,dst) topology hash-partitioned
    on the gather key, with ids narrowed to int32 when every vertex id fits —
    half the bytes through the cache, the per-iteration gather join and the
    scatter shuffle (the compaction that moved the 20M-edge pagerank
    superstep from E(1→4)=0.70 to 0.95; ids are keys only, callers cast the
    output id column back to long)."""
    vstats = vertices.agg(
        F.min("vertex_id").alias("vmin"), F.max("vertex_id").alias("vmax")
    ).first()
    compact = (
        vstats["vmin"] is not None
        and -(2**31) <= int(vstats["vmin"])
        and int(vstats["vmax"]) < 2**31
    )
    idt = "int" if compact else "long"
    topo = (
        edges.select(
            F.col("src").cast(idt).alias("src"),
            F.col("dst").cast(idt).alias("dst"),
        )
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        vertices.select(F.col("vertex_id").cast(idt).alias("vertex_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return topo, verts, idt


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
    dangling0 = int(st["n_seed_dangling"] or 0) / float(n_seed)
    # ONE Spark job for the whole fixed-iteration run: every iteration
    # after the first takes its dangling mass from an in-plan 1-row
    # broadcast aggregate of the previous state (the first uses the
    # precomputed scalar), and each intermediate state is a LAZY
    # localCheckpoint so its consumers share one RDD materialized inside
    # the single final action. No driver synchronization per superstep —
    # the fixed-iteration analog of pagerank's delta_check_every batching.
    for i in range(fixed_iters):
        rank_w = ranks.filter(F.col("out_deg") > 0).select(
            F.col("vertex_id").alias("src"),
            (F.col("rank") / F.col("out_deg")).alias("contrib"),
        )
        sums = (
            topo.join(rank_w, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("msg_sum"))
        )
        paired = ranks.select("vertex_id", "out_deg", "is_seed").join(
            sums.select(F.col("dst").alias("vertex_id"), "msg_sum"),
            "vertex_id",
            "left",
        )
        if i == 0:
            seed_mass = F.lit(
                (1.0 - damping) / n_seed + damping * dangling0 / n_seed
            )
        else:
            dang_df = ranks.agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("out_deg") == 0, F.col("rank")
                        ).otherwise(F.lit(0.0))
                    ),
                    F.lit(0.0),
                ).alias("_dang")
            )
            paired = paired.crossJoin(F.broadcast(dang_df))
            seed_mass = (
                F.lit((1.0 - damping) / n_seed)
                + F.lit(damping) * F.col("_dang") / F.lit(float(n_seed))
            )
        rank_expr = (
            F.when(F.col("is_seed"), seed_mass).otherwise(F.lit(0.0))
            + F.lit(damping) * F.coalesce(F.col("msg_sum"), F.lit(0.0))
        ).alias("rank")
        ranks = paired.select(
            "vertex_id", rank_expr, "out_deg", "is_seed"
        ).localCheckpoint(eager=False)
    out = ranks.select("vertex_id", "rank")
    out.count()
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

    # edge-free (or vertex-disjoint) graphs have no normalizable solution;
    # check ONCE up front — after a valid first half-step every later norm
    # is positive (the dst that received auth mass hands hub mass back to
    # its own src through the same edge), so no per-iteration check needed
    if (
        topo.join(
            verts.select(F.col("vertex_id").alias("src")), "src", "left_semi"
        )
        .limit(1)
        .count()
        == 0
    ):
        raise ValueError("graph has no edges reaching any vertex")

    def _half_step(score: DataFrame, key_in: str, key_out: str) -> DataFrame:
        """One normalized half-step: gather ``score`` across edges from
        ``key_in`` onto ``key_out``, L1-normalize with an in-plan 1-row
        broadcast aggregate, lazily checkpoint. No driver action — the
        whole fixed-iteration recurrence materializes in ONE job at the
        final count (same batching idea as pagerank delta_check_every)."""
        raw = (
            topo.join(
                score.select(F.col("vertex_id").alias(key_in), "score"),
                key_in,
            )
            .groupBy(key_out)
            .agg(F.sum("score").alias("raw"))
        )
        full = (
            verts.join(
                raw.select(F.col(key_out).alias("vertex_id"), "raw"),
                "vertex_id",
                "left",
            )
            .select("vertex_id", F.coalesce("raw", F.lit(0.0)).alias("raw"))
            # the raw table has TWO consumers (norm aggregate + division);
            # the lazy checkpoint makes them share one RDD — without it each
            # half-step's gather join runs twice (measured: hits5 7.0s vs
            # 3.9s at sf0.1)
            .localCheckpoint(eager=False)
        )
        norm_df = full.agg(F.sum("raw").alias("_norm"))
        return full.crossJoin(F.broadcast(norm_df)).select(
            "vertex_id", (F.col("raw") / F.col("_norm")).alias("score")
        )

    hub = verts.select("vertex_id", (F.lit(1.0) / n).alias("score"))
    auth = None
    for _ in range(fixed_iters):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")
    out = (
        hub.select("vertex_id", F.col("score").alias("hub"))
        .join(
            auth.select("vertex_id", F.col("score").alias("auth")),
            "vertex_id",
        )
        .select("vertex_id", "hub", "auth")
    )
    out.count()
    topo.unpersist()
    verts.unpersist()
    return out


def eigenvector_centrality(
    edges: DataFrame,
    vertices: DataFrame,
    fixed_iters: int = 8,
) -> DataFrame:
    """Eigenvector centrality by power iteration with per-step L2
    normalization:

        raw_k(v) = Σ_{u→v} x_{k-1}(u)      then x_k = raw_k / ||raw_k||_2

    starting from the L2-normalized uniform vector x_0 = 1/√n. Distinct from
    :func:`hits` (which alternates two mutually-reinforcing scores) and from
    PageRank (whose stochastic normalization + teleport changes the matrix):
    this is the dominant eigenvector of the plain adjacency matrix A^T.
    Callers who want the classic undirected variant pass a symmetrized edge
    table (``operators.graph.undirected``).

    Engine-new per ``BASELINE.json`` ``north_rule`` (centrality family over
    the citation link graph); the reference computes no spectral scores.
    Same one-job batched superstep shape as :func:`hits`: the L2 norm is an
    in-plan 1-row broadcast aggregate, every intermediate state a lazy
    ``localCheckpoint``, no per-iteration driver action. Deterministic up to
    float summation order, so the gate's DuckDB twin unrolls the same
    recurrence and compares at 1e-6 rounding.

    Returns (vertex_id, score). Raises on an edge-free graph (no
    normalizable solution).
    """
    if fixed_iters < 1:
        raise ValueError(f"fixed_iters must be >= 1, got {fixed_iters}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo, verts, _idt = _compact_topology(edges, vertices, n_shuffle)
    topo.count()
    n = verts.count()
    if (
        topo.join(
            verts.select(F.col("vertex_id").alias("src")), "src", "left_semi"
        )
        .limit(1)
        .count()
        == 0
    ):
        raise ValueError("graph has no edges reaching any vertex")

    import math

    x = verts.select("vertex_id", F.lit(1.0 / math.sqrt(n)).alias("score"))
    for _ in range(fixed_iters):
        raw = (
            topo.join(
                x.select(F.col("vertex_id").alias("src"), "score"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
        )
        full = (
            verts.join(
                raw.select(F.col("dst").alias("vertex_id"), "raw"),
                "vertex_id",
                "left",
            )
            .select("vertex_id", F.coalesce("raw", F.lit(0.0)).alias("raw"))
            # two consumers (norm aggregate + division) share one RDD
            .localCheckpoint(eager=False)
        )
        norm_df = full.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("_norm"))
        # a DAG longer than its depth drains all mass: norm 0 → scores 0
        # (defined, instead of a divide-by-zero null cascade)
        x = full.crossJoin(F.broadcast(norm_df)).select(
            "vertex_id",
            F.when(
                F.col("_norm") > 0.0, F.col("raw") / F.col("_norm")
            )
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    out = x.select(
        F.col("vertex_id").cast("long").alias("vertex_id"), "score"
    )
    out.count()
    topo.unpersist()
    verts.unpersist()
    return out


def katz_centrality(
    edges: DataFrame,
    vertices: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    fixed_iters: int = 8,
) -> DataFrame:
    """Katz centrality: attenuated count of incoming paths of every length,

        x_t(v) = β + α · Σ_{u→v} x_{t-1}(u),    x_0 = 0

    so after t iterations x(v) = Σ_{k≤t} α^k (#paths of length k into v)·β
    plus β. Converges for α < 1/λ_max; the caller picks α (no in-engine
    spectral estimate — fixed-iteration mode is the gate-verifiable one and
    the usual cluster deployment). Unlike :func:`eigenvector_centrality`
    there is no normalization step and the β source term keeps isolated
    vertices at β rather than zero; unlike PageRank the contribution is not
    divided by out-degree.

    Engine-new (centrality family per ``BASELINE.json`` ``north_rule``).
    Same one-job batched superstep shape as the other fixed-iteration
    centralities: each state is a lazy ``localCheckpoint``, no per-iteration
    driver action, DuckDB twin unrolls the recurrence. Returns
    (vertex_id, score).
    """
    if fixed_iters < 1:
        raise ValueError(f"fixed_iters must be >= 1, got {fixed_iters}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo, verts, _idt = _compact_topology(edges, vertices, n_shuffle)
    topo.count()
    verts.count()
    x = verts.select("vertex_id", F.lit(0.0).alias("score"))
    for _ in range(fixed_iters):
        raw = (
            topo.join(
                x.select(F.col("vertex_id").alias("src"), "score"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("score").alias("raw"))
        )
        x = (
            verts.join(
                raw.select(F.col("dst").alias("vertex_id"), "raw"),
                "vertex_id",
                "left",
            )
            .select(
                "vertex_id",
                (
                    F.lit(beta)
                    + F.lit(alpha) * F.coalesce("raw", F.lit(0.0))
                ).alias("score"),
            )
            .localCheckpoint(eager=False)
        )
    out = x.select(
        F.col("vertex_id").cast("long").alias("vertex_id"), "score"
    )
    out.count()
    topo.unpersist()
    verts.unpersist()
    return out


def salsa(
    edges: DataFrame,
    vertices: DataFrame,
    fixed_iters: int = 3,
) -> DataFrame:
    """SALSA (Lempel & Moran): hubs/authorities by power iteration on the
    degree-normalized bipartite chains —

        auth_k(v) = Σ_{u→v} hub_{k-1}(u) / outdeg(u)   then auth_k /= Σ auth_k
        hub_k(u)  = Σ_{u→v} auth_k(v) / indeg(v)       then hub_k  /= Σ hub_k

    i.e. HITS where every contribution is split across the contributor's
    edges instead of copied along each — SALSA's random-surfer chains, which
    makes the scores degree-robust (a pure-HITS hub farm gains nothing).
    Initial hub = 1/n. Execution shape is identical to :func:`hits`: a cached
    (src, dst, inv_out, inv_in) topology (the degree reciprocals joined ONCE,
    not per iteration), per-half-step in-plan 1-row broadcast L1 norms, lazy
    localCheckpoints, one Spark job at the final action. Deterministic →
    the gate's DuckDB twin unrolls the same recurrence.

    Returns (vertex_id, hub, auth); 0.0 where the vertex has no out/in edges.
    Raises ValueError on a graph with no edge touching ``vertices`` (same
    precondition as :func:`hits`).
    """
    if fixed_iters < 1:
        raise ValueError(f"fixed_iters must be >= 1, got {fixed_iters}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = edges.select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("id_"))
    topo = (
        e.join(outdeg, "src")
        .join(indeg, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("od")).alias("inv_out"),
            (F.lit(1.0) / F.col("id_")).alias("inv_in"),
        )
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    topo.count()
    verts = vertices.select("vertex_id").persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if (
        topo.join(
            verts.select(F.col("vertex_id").alias("src")), "src", "left_semi"
        )
        .limit(1)
        .count()
        == 0
    ):
        raise ValueError("graph has no edges reaching any vertex")

    def _half_step(score: DataFrame, key_in: str, key_out: str, w: str) -> DataFrame:
        """Degree-normalized gather from key_in onto key_out (weight column
        ``w`` is the contributor-side reciprocal degree), then L1 normalize.
        Same one-job lazy-checkpoint shape as hits()._half_step."""
        raw = (
            topo.join(
                score.select(F.col("vertex_id").alias(key_in), "score"),
                key_in,
            )
            .groupBy(key_out)
            .agg(F.sum(F.col("score") * F.col(w)).alias("raw"))
        )
        full = (
            verts.join(
                raw.select(F.col(key_out).alias("vertex_id"), "raw"),
                "vertex_id",
                "left",
            )
            .select("vertex_id", F.coalesce("raw", F.lit(0.0)).alias("raw"))
            .localCheckpoint(eager=False)
        )
        norm_df = full.agg(F.sum("raw").alias("_norm"))
        return full.crossJoin(F.broadcast(norm_df)).select(
            "vertex_id", (F.col("raw") / F.col("_norm")).alias("score")
        )

    hub = verts.select("vertex_id", (F.lit(1.0) / n).alias("score"))
    auth = None
    for _ in range(fixed_iters):
        auth = _half_step(hub, "src", "dst", "inv_out")
        hub = _half_step(auth, "dst", "src", "inv_in")
    out = (
        hub.select("vertex_id", F.col("score").alias("hub"))
        .join(
            auth.select("vertex_id", F.col("score").alias("auth")),
            "vertex_id",
        )
        .select("vertex_id", "hub", "auth")
    )
    out.count()
    topo.unpersist()
    verts.unpersist()
    return out
