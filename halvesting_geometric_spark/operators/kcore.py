"""k-core decomposition by iterative peeling (engine-new).

The k-core of an undirected graph is the maximal subgraph in which every
vertex has degree ≥ k. Peeling: repeatedly drop vertices with current degree
< k until a fixpoint. Each round is two joins (restrict edges to surviving
endpoints) + one aggregate (degrees) — no driver-side graph materialization;
lineage truncates per round via lazy localCheckpoint exactly like the other
superstep drivers.

With ``fixed_rounds`` set the operator is deterministic in the round count,
so the correctness gate's DuckDB twin unrolls the same peeling as CTEs
(extra rounds past the fixpoint are idempotent in both engines).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
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
