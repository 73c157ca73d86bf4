"""Bow-tie decomposition of the directed link graph (Broder et al., WWW'00).

The canonical web-graph macro-structure analysis: take the largest strongly
connected component as the CORE, then classify every vertex as

    CORE          — member of the largest SCC,
    IN            — reaches the core but is not reached from it,
    OUT           — reached from the core but does not reach it,
    TENDRIL       — in the core's weakly connected component but on no
                    directed path through the core (tendrils and tubes),
    DISCONNECTED  — outside the core's weakly connected component.

IN and OUT are disjoint by construction: a vertex that both reaches and is
reached from the core is mutually reachable with every core member and would
be inside the SCC itself.

Scale shape: one SCC run (trim + forward/backward label propagation from
scc.py, bounded per-round state), then three frontier BFS sweeps seeded by
the core (forward on edges, backward on reversed edges, undirected for the
WCC test) — each is the bfs_levels fixpoint loop whose per-round shuffle is
the frontier join, with lineage truncated every level. The only driver-side
state is the core's scc_id (one scalar). Rounds are bounded by the directed
diameter; at web scale the core seeds mean the frontiers fatten then empty
in O(diameter) supersteps, the same shape as the landmark-BFS scale runs.

Reference analog: none — the reference (Madjakul/HALvesting-Geometric)
builds the citation graph but computes no macro-structure decomposition;
engine-new link-graph analytics next to robustness and rich-club.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.scc import (
    strongly_connected_components,
)
from halvesting_geometric_spark.operators.traversal import bfs_levels

__all__ = ["bowtie_decomposition"]

CLASSES = ("CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED")


def bowtie_decomposition(
    edges: DataFrame,
    vertices: DataFrame,
    max_depth: int = 64,
) -> DataFrame:
    """(vertex_id, bowtie_class) for every vertex.

    ``max_depth`` bounds each BFS sweep; bfs_levels stops early once a
    frontier empties, so any value >= the directed diameter yields the exact
    fixpoint (64 covers real link graphs, whose cores keep diameters small).
    """
    scc = strongly_connected_components(edges, vertices)
    sizes = scc.components.groupBy("scc_id").agg(F.count("*").alias("n"))
    core_row = (
        sizes.orderBy(F.col("n").desc(), F.col("scc_id").asc()).first()
    )
    if core_row is None:  # empty graph: everything is disconnected
        return vertices.select(
            "vertex_id", F.lit("DISCONNECTED").alias("bowtie_class")
        )
    core = (
        scc.components.filter(F.col("scc_id") == int(core_row["scc_id"]))
        .select("vertex_id")
        .persist()
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = bfs_levels(edges, vertices, core, max_depth=max_depth)
    bwd = bfs_levels(rev, vertices, core, max_depth=max_depth)
    wcc = bfs_levels(edges, vertices, core, max_depth=max_depth, directed=False)

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("vertex_id", F.lit(True).alias(name))

    out = (
        vertices.select("vertex_id")
        .join(flag(core, "in_core"), "vertex_id", "left")
        .join(flag(fwd, "in_fwd"), "vertex_id", "left")
        .join(flag(bwd, "in_bwd"), "vertex_id", "left")
        .join(flag(wcc, "in_wcc"), "vertex_id", "left")
        .select(
            "vertex_id",
            F.when(F.col("in_core"), F.lit("CORE"))
            .when(F.col("in_bwd"), F.lit("IN"))
            .when(F.col("in_fwd"), F.lit("OUT"))
            .when(F.col("in_wcc"), F.lit("TENDRIL"))
            .otherwise(F.lit("DISCONNECTED"))
            .alias("bowtie_class"),
        )
    )
    out = out.localCheckpoint(eager=True)
    core.unpersist()
    return out
