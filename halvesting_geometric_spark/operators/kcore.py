"""k-core decomposition: membership peeling and full per-vertex coreness.

The k-core of an undirected graph is the maximal subgraph in which every
vertex has degree ≥ k. :func:`kcore_members` peels for one fixed k:
repeatedly drop vertices with current degree < k until a fixpoint. Each
round is two joins (restrict edges to surviving endpoints) + one aggregate
(degrees) — no driver-side graph materialization; lineage truncates per
round via lazy localCheckpoint exactly like the other superstep drivers.

:func:`coreness` computes the FULL decomposition — every vertex's core
number — with the distributed h-index fixpoint (Montresor, De Pellegrini &
Miorandi, "Distributed k-core decomposition", IEEE TPDS 2013): estimates
start at the degree and each round become the h-index of the neighbors'
estimates (the largest h such that ≥ h neighbors have estimate ≥ h);
estimates are monotonically non-increasing and converge to the exact core
number. One round is a gather join + one ``row_number`` window over the
in-estimates + one ``max(least(rank, est))`` aggregate — all sort-based
and spillable (a 10^8-degree hub streams through the sorter; nothing
materializes an adjacency buffer), no k-loop over core levels.

With ``fixed_rounds``/``fixed_iters`` set both operators are deterministic
in the round count, so the correctness gate's DuckDB twins unroll the
identical rounds as CTEs (extra rounds past the fixpoint are idempotent in
both engines).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kcore_members(
    edges: DataFrame,
    vertices: DataFrame,
    k: int = 3,
    fixed_rounds: int | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """Vertices of the k-core. Returns (vertex_id, core_degree) where
    core_degree is the vertex's degree inside the final surviving subgraph.

    Edges are treated as undirected; self-loops are ignored (a self-loop
    never keeps a vertex alive). ``fixed_rounds``: peel exactly that many
    rounds (gate mode); default peels to the fixpoint.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()

    alive = vertices.select("vertex_id")
    n_alive = alive.count()
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    prev_deg: DataFrame | None = None
    deg = None
    converged = False
    for _ in range(rounds):
        # degree within the surviving induced subgraph: keep only edges whose
        # BOTH endpoints are alive (two semi joins against the small alive set)
        live_edges = sym.join(
            alive.select(F.col("vertex_id").alias("src")), "src", "left_semi"
        ).join(
            alive.select(F.col("vertex_id").alias("dst")), "dst", "left_semi"
        )
        deg = (
            live_edges.groupBy("src")
            .agg(F.count("*").alias("core_degree"))
            .select(F.col("src").alias("vertex_id"), "core_degree")
            .filter(F.col("core_degree") >= k)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_next = deg.count()
        alive = deg.select("vertex_id").localCheckpoint(eager=False)
        if prev_deg is not None:
            prev_deg.unpersist()
        prev_deg = deg
        if fixed_rounds is None and n_next == n_alive:
            converged = True
            break
        if n_next == 0:
            converged = True  # the empty set is a fixpoint
            break
        n_alive = n_next
    if fixed_rounds is None and not converged:
        # peeling removes >= 1 vertex per non-converged round, so this only
        # happens on adversarially chain-like graphs — returning the partially
        # peeled set would silently violate the k-core contract
        if prev_deg is not None:
            prev_deg.unpersist()
        sym.unpersist()
        raise RuntimeError(
            f"k-core peeling did not reach a fixpoint in {max_rounds} rounds "
            f"({n_alive} vertices still alive); raise max_rounds"
        )
    if deg is None:  # rounds == 0: degenerate gate mode, nobody peeled
        out = (
            sym.groupBy("src")
            .agg(F.count("*").alias("core_degree"))
            .select(F.col("src").alias("vertex_id"), "core_degree")
        )
        out.count()
        sym.unpersist()
        return out
    out = deg.select("vertex_id", "core_degree")
    # materialize before dropping the cache it reads from
    out = out.localCheckpoint(eager=True)
    if prev_deg is not None:
        prev_deg.unpersist()
    sym.unpersist()
    return out


def coreness(
    edges: DataFrame,
    vertices: DataFrame,
    fixed_iters: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """Per-vertex core numbers via the distributed h-index fixpoint (see
    module docstring). Returns (vertex_id, coreness).

    Edges are undirected; self-loops ignored; isolated vertices get
    coreness 0. ``fixed_iters``: run exactly that many h-index rounds (the
    externally-verifiable gate mode — estimates after round t upper-bound
    the true coreness); default iterates to the fixpoint, which IS the
    exact decomposition.
    """
    if fixed_iters is not None and fixed_iters < 0:
        raise ValueError(f"fixed_iters must be >= 0, got {fixed_iters}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(n_shuffle, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()

    est = (
        vertices.select("vertex_id")
        .join(
            sym.groupBy("src").agg(F.count("*").alias("deg")).select(
                F.col("src").alias("vertex_id"), "deg"
            ),
            "vertex_id",
            "left",
        )
        .select(
            "vertex_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("est"),
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("nbr_est").desc(), F.col("src").asc()
    )
    target = fixed_iters if fixed_iters is not None else max_iter
    converged = fixed_iters is not None
    for _ in range(target):
        gathered = sym.join(
            est.select(
                F.col("vertex_id").alias("src"), F.col("est").alias("nbr_est")
            ),
            "src",
        )
        # h-index of the in-estimates: with estimates sorted descending,
        # H = max_i min(i, e_i) — rank ties are irrelevant to the max
        h = (
            gathered.withColumn("rn", F.row_number().over(w))
            .groupBy("dst")
            .agg(F.max(F.least("rn", "nbr_est")).alias("h"))
            .select(F.col("dst").alias("vertex_id"), "h")
        )
        nxt = (
            est.join(h, "vertex_id", "left")
            .select(
                "vertex_id",
                F.coalesce("h", F.lit(0)).cast("long").alias("est"),
                (F.col("est") != F.coalesce("h", F.lit(0))).alias("_chg"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_changed = nxt.filter(F.col("_chg")).count()
        new_est = nxt.select("vertex_id", "est").localCheckpoint(eager=True)
        nxt.unpersist()
        est = new_est
        if fixed_iters is None and n_changed == 0:
            converged = True
            break
    if not converged:
        sym.unpersist()
        raise RuntimeError(
            f"coreness h-index fixpoint not reached in {max_iter} rounds"
        )
    out = est.select("vertex_id", F.col("est").alias("coreness"))
    sym.unpersist()
    return out
