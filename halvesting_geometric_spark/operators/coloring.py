"""Distributed greedy graph coloring, Jones–Plassmann style (engine-new).

Per round, every still-uncolored vertex whose hash priority is a strict
local maximum among its uncolored neighbors colors itself with the
smallest color absent from its already-colored neighborhood (the "mex").
Priorities are RE-RANDOMIZED per round (Luby-style: ``hash(v, seed +
131·round)``) instead of Jones & Plassmann's static ones — still fully
deterministic and externally replayable, but a vertex that drew an
unlucky priority isn't stuck behind the same neighbor for the whole run,
which converges markedly faster on skewed graphs (measured on 20M
power-law edges: 21% colored in 10 rounds static vs the re-randomized
run's much steeper curve). Every step is relational: one neighbor join +
one max-struct aggregate for the local-max test, one join + one
sorted-set aggregate + an ``aggregate`` fold for the mex. The mex fold
runs over the *distinct colors* of the neighborhood — bounded by the
palette size (≤ Δ+1) rather than the neighborhood count.

Undirected semantics (edges symmetrized); self-loops ignored. With
``fixed_rounds`` the gate's DuckDB twin unrolls identical rounds;
vertices still uncolored after the budget keep color NULL (fixpoint mode
runs until none remain and raises past ``max_rounds``).

Validity invariant (tested): no edge joins two equal colors; greedy bound
colors ≤ Δ+1.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.sampling import hash64


def _mex(sorted_colors):
    """Smallest non-negative integer absent from the ascending array."""
    return F.aggregate(
        sorted_colors,
        F.lit(0).cast("long"),
        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
    )


def greedy_coloring(
    edges: DataFrame,
    vertices: DataFrame,
    seed: int = 42,
    hash_method: str = "xxhash64",
    fixed_rounds: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """(vertex_id, color) greedy coloring; color is NULL only when a fixed
    round budget left the vertex uncolored (never in fixpoint mode)."""
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

    state = vertices.select(
        "vertex_id",
        F.lit(None).cast("long").alias("color"),
    ).localCheckpoint(eager=False)

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for t in range(rounds):
        # this count doubles as the materializer of the previous round's
        # LAZY checkpoint — one Spark job per round instead of two (the
        # uncolored probe and the eager checkpoint used to be separate jobs)
        n_uncolored = state.filter(F.col("color").isNull()).count()
        if n_uncolored == 0:
            break
        # fresh priorities every round (see module docstring)
        prio = hash64(hash_method, "vertex_id", seed=seed + 131 * t)
        staged = state.withColumn("prio", prio)
        # only UNCOLORED vertices need a neighborhood summary — the edge
        # set feeding the aggregate shrinks as the coloring progresses
        live = sym.join(
            staged.filter(F.col("color").isNull()).select(
                F.col("vertex_id").alias("dst")
            ),
            "dst",
            "left_semi",
        )
        nbr = live.join(
            staged.select(
                F.col("vertex_id").alias("src"),
                F.col("prio").alias("n_prio"),
                F.col("color").alias("n_color"),
            ),
            "src",
        )
        summary = nbr.groupBy("dst").agg(
            # strict local max among UNCOLORED neighbors; (prio, id) breaks
            # hash ties deterministically
            F.max(
                F.when(
                    F.col("n_color").isNull(),
                    F.struct(F.col("n_prio"), F.col("src")),
                )
            ).alias("top_unc"),
            F.array_sort(
                F.collect_set(
                    F.when(F.col("n_color").isNotNull(), F.col("n_color"))
                )
            ).alias("nbr_colors"),
        )
        state = (
            staged.join(
                summary.select(F.col("dst").alias("vertex_id"), "top_unc",
                               "nbr_colors"),
                "vertex_id",
                "left",
            )
            .select(
                "vertex_id",
                F.when(F.col("color").isNotNull(), F.col("color"))
                .when(
                    F.col("color").isNull()
                    & (
                        F.col("top_unc").isNull()
                        | (
                            F.struct(F.col("prio"), F.col("vertex_id"))
                            > F.col("top_unc")
                        )
                    ),
                    _mex(F.coalesce("nbr_colors", F.array())),
                )
                .alias("color"),
            )
            .localCheckpoint(eager=False)
        )
    else:
        # budget exhausted without hitting the early break — in fixpoint
        # mode that's only an error if someone is actually still uncolored
        # (the final round may have just finished the job)
        if (
            fixed_rounds is None
            and state.filter(F.col("color").isNull()).count() > 0
        ):
            sym.unpersist()
            raise RuntimeError(
                f"greedy_coloring did not finish within max_rounds={max_rounds}"
            )
    # materialize the (lazy) final state before dropping the edge cache it
    # reads from — the early-break path already did via its count
    state.count()
    sym.unpersist()
    return state.select("vertex_id", "color")
