"""Maximal independent set via Luby's algorithm (engine-new).

Classic O(log n)-round parallel MIS (Luby 1986): every round, each live
vertex computes a priority; a vertex joins the MIS iff its priority is a
strict local minimum among live neighbors; MIS members and their neighbors
then leave the live set. Priorities here are a seeded hash of
(vertex, round) instead of an RNG, so the result is deterministic across
runs and partitionings — and with ``hash_method="portable"`` an external
SQL engine replays every round exactly (the correctness-gate mode).

Ties: (priority, vertex_id) lexicographic — total order, so a vertex whose
hash collides with a neighbor's still resolves deterministically.

Each round is two joins over the shrinking live edge set (gather neighbor
minima; subtract MIS ∪ neighbors) with lineage truncated per round — the
same superstep shape as the other iterative drivers. The live edge set
only shrinks, so rounds get cheaper as they proceed.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.graph import canonical_edges
from halvesting_geometric_spark.operators.sampling import hash64


def maximal_independent_set(
    edges: DataFrame,
    vertices: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """MIS of the simple undirected graph. Returns (vertex_id, round) —
    the round each member joined (isolated vertices join in round 1; they
    have no neighbors, so their priority is trivially a local minimum).

    Raises if ``max_rounds`` is exhausted before the live set empties
    (cannot happen for max_rounds ≥ ~4·log₂ n with overwhelming margin —
    the guard catches miswired inputs rather than unlucky hashes).
    """
    spark = edges.sparkSession
    canon = canonical_edges(edges)
    sym = canon.select(
        F.col("src").alias("v"), F.col("dst").alias("nbr")
    ).unionByName(
        canon.select(F.col("dst").alias("v"), F.col("src").alias("nbr"))
    )
    live_v = vertices.select("vertex_id").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    live_e = sym.persist(StorageLevel.MEMORY_AND_DISK)
    members = spark.createDataFrame([], "vertex_id long, round long")
    prev_caches: list[DataFrame] = [live_v, live_e]
    for r in range(1, max_rounds + 1):
        pri = live_v.select(
            "vertex_id",
            hash64(hash_method, F.col("vertex_id"), F.lit(r), seed=seed).alias(
                "p"
            ),
        )
        # strict local minimum by (p, vertex_id): min over live neighbors
        nbr_min = (
            live_e.join(
                pri.select(
                    F.col("vertex_id").alias("nbr"), F.col("p").alias("np")
                ),
                "nbr",
            )
            .groupBy("v")
            .agg(F.min(F.struct(F.col("np"), F.col("nbr"))).alias("m"))
        )
        winners = (
            pri.join(
                nbr_min.select(F.col("v").alias("vertex_id"), "m"),
                "vertex_id",
                "left",
            )
            .filter(
                F.col("m").isNull()
                | (
                    F.struct(
                        F.col("p").alias("np"), F.col("vertex_id").alias("nbr")
                    )
                    < F.col("m")
                )
            )
            .select("vertex_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_win = winners.count()
        # eager: members is small (≤ |V| rows total) and winners gets
        # unpersisted below — a lazy checkpoint would re-derive every
        # round's winner chain at final materialization
        members = members.unionByName(
            winners.select("vertex_id", F.lit(r).cast("long").alias("round"))
        ).localCheckpoint(eager=True)
        # remove winners and their neighbors from the live set
        removed = winners.unionByName(
            live_e.join(
                winners.select(F.col("vertex_id").alias("v")), "v", "left_semi"
            ).select(F.col("nbr").alias("vertex_id"))
        ).distinct()
        # localCheckpoint (eager) truncates lineage: live_e references
        # live_v twice per round, so an un-truncated plan doubles per round
        # and the driver OOMs stringifying it (AQE explainString)
        new_live_v = live_v.join(
            removed, "vertex_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_live = new_live_v.count()
        new_live_e = (
            live_e.join(
                new_live_v.select(F.col("vertex_id").alias("v")), "v", "left_semi"
            )
            .join(
                new_live_v.select(F.col("vertex_id").alias("nbr")),
                "nbr",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        for p in prev_caches:
            p.unpersist()
        winners.unpersist()
        prev_caches = [new_live_v, new_live_e]
        live_v, live_e = new_live_v, new_live_e
        if n_live == 0:
            break
        if n_win == 0 and n_live > 0:
            for p in prev_caches:  # release caches on the error path too
                p.unpersist()
            raise RuntimeError(
                f"MIS round {r} made no progress with {n_live} live vertices"
            )
    else:
        for p in prev_caches:  # release caches on the error path too
            p.unpersist()
        raise RuntimeError(
            f"MIS did not converge within max_rounds={max_rounds}"
        )
    out = members.localCheckpoint(eager=True)
    for p in prev_caches:
        p.unpersist()
    return out
