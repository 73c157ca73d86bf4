"""Multi-source BFS: shortest hop distance from a seed set (engine-new).

Frontier-expansion supersteps on the same substrate as the other iterative
drivers: the cached pure-topology edge table never reshuffles; each level is
one gather join (frontier → neighbors) + one anti join (drop already-visited)
— first discovery is the shortest distance, so no min-recomputation pass is
needed. Lineage truncates per level via lazy localCheckpoint; the frontier
(not the full visited set) drives the join, so per-level work is proportional
to the frontier's edge boundary.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(
    edges: DataFrame,
    vertices: DataFrame,
    sources: DataFrame | list[int],
    max_depth: int = 20,
    directed: bool = True,
) -> DataFrame:
    """Hop distance from the nearest source. Returns (vertex_id, dist) for
    every REACHED vertex (unreached vertices are absent; sources have dist 0).

    ``directed=False`` follows edges both ways. Stops early when a level adds
    no new vertices; otherwise explores exactly ``max_depth`` levels (distances
    are then correct for every emitted row — deeper vertices are just absent),
    which is the externally-verifiable fixed-depth mode the gate uses.
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    spark = edges.sparkSession
    if isinstance(sources, (list, tuple)):
        sources = spark.createDataFrame(
            [(int(s),) for s in sources], "vertex_id long"
        )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    topo = edges.select("src", "dst")
    if not directed:
        topo = topo.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    topo = (
        topo.repartition(n_shuffle, "src").persist(StorageLevel.MEMORY_AND_DISK)
    )
    topo.count()

    # restrict seeds to real vertices so dist rows never leave the graph
    visited = (
        sources.select("vertex_id")
        .distinct()
        .join(vertices.select("vertex_id"), "vertex_id", "left_semi")
        .select("vertex_id", F.lit(0).alias("dist"))
    )
    frontier = visited
    prev_caches: list[DataFrame] = []
    for depth in range(1, max_depth + 1):
        nxt = (
            topo.join(
                frontier.select(F.col("vertex_id").alias("src")), "src", "left_semi"
            )
            .select(F.col("dst").alias("vertex_id"))
            .distinct()
            .join(visited.select("vertex_id"), "vertex_id", "left_anti")
            .select("vertex_id", F.lit(depth).alias("dist"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_new = nxt.count()
        if n_new == 0:
            nxt.unpersist()
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
        for p in prev_caches:
            p.unpersist()
        prev_caches = [nxt]
    out = visited.select("vertex_id", F.col("dist").cast("long").alias("dist"))
    out = out.localCheckpoint(eager=True)
    for p in prev_caches:
        p.unpersist()
    topo.unpersist()
    return out
