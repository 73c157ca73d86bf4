"""Densest-subgraph extraction via parallel greedy peeling (engine-new).

Charikar's greedy gives a 2-approximation by repeatedly removing the
minimum-degree vertex; Bahmani-Kumar-Vassilvitskii (VLDB 2012) showed that
removing EVERY vertex with degree ≤ (1+ε)·(2·density) per round keeps a
2(1+ε) guarantee in O(log n / ε) rounds — the MapReduce/Spark shape, one
degree aggregate + one anti join per round. Density here is |E|/|V| of the
simple undirected current subgraph; the answer is the subgraph alive at
the round where density peaked.

Deterministic (no randomness), so with ``fixed_rounds`` the gate's DuckDB
twin unrolls the identical peels. Per-round lineage truncates via eager
localCheckpoint (live edges reference live vertices twice).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.graph import canonical_edges


@dataclass
class DensestResult:
    vertices: DataFrame  # (vertex_id) of the densest prefix subgraph
    density: float  # |E|/|V| of that subgraph
    round: int  # peel round at which density peaked (0 = whole graph)
    rounds_run: int


def densest_subgraph(
    edges: DataFrame,
    epsilon: float = 0.1,
    fixed_rounds: int | None = None,
    max_rounds: int = 64,
) -> DensestResult:
    """2(1+ε)-approximate densest subgraph of the simple undirected graph.

    ``fixed_rounds`` runs exactly that many peels (externally-verifiable
    mode); otherwise peels until no edges remain (≤ max_rounds, guaranteed
    for ε > 0 by the O(log n / ε) bound; raises if exceeded).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    canon = canonical_edges(edges).localCheckpoint(eager=True)
    cur = canon
    n_e = cur.count()
    best: tuple[float, int, DataFrame] | None = None
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    r = 0
    emptied = n_e == 0
    for r in range(rounds + 1):
        verts = (
            cur.select(F.col("src").alias("v"))
            .unionByName(cur.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        n_v = verts.count()
        if n_v == 0:
            emptied = True
            break
        density = n_e / n_v
        if best is None or density > best[0]:
            best = (density, r, verts.select(F.col("v").alias("vertex_id")))
        if r == rounds:
            break
        threshold = 2.0 * (1.0 + epsilon) * density
        keep = verts.filter(F.col("deg") > threshold).select("v")
        nxt = (
            cur.join(keep.select(F.col("v").alias("src")), "src", "left_semi")
            .join(keep.select(F.col("v").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_e = nxt.count()
        cur = nxt
        if n_e == 0:
            emptied = True
            break
    if fixed_rounds is None and not emptied:
        # fixpoint mode promises "peel until no edges remain"; returning
        # best-so-far here would silently weaken the 2(1+eps) guarantee
        raise RuntimeError(
            f"densest_subgraph did not finish within max_rounds={max_rounds}"
        )
    if best is None:  # edgeless input: no subgraph has positive density
        spark = edges.sparkSession
        return DensestResult(
            vertices=spark.createDataFrame([], "vertex_id long"),
            density=0.0,
            round=0,
            rounds_run=r,
        )
    density, at_round, members = best
    return DensestResult(
        vertices=members, density=density, round=at_round, rounds_run=r
    )
