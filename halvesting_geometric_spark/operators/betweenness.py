"""Betweenness centrality — sampled sources, bounded horizon (engine-new).

Exact betweenness is all-pairs Brandes (Brandes 2001): O(|V|·|E|),
infeasible at web scale. The standard estimator (Brandes–Pich 2007 /
Riondato–Kornaropoulos) samples source vertices and accumulates each
sample's single-source dependencies; this implementation additionally
bounds the BFS horizon, so the semantics are explicitly "contributions of
shortest paths of length ≤ ``max_depth`` starting at the ``sources``" —
deterministic, reproducible, and exactly unrollable by an external SQL
engine (the correctness gate's DuckDB twin replays every forward and
backward level).

Dataflow, all keyed (source, vertex) so any number of samples runs as ONE
job sequence (no per-source loop over actions):

- forward (``max_depth`` rounds): frontier join on edge src → sum σ per
  (s, dst) → anti-join already-visited: classic BFS with shortest-path
  counting; σ sums are exact integers.
- backward (``max_depth`` rounds, deepest level first): dependency
  δ(s,v) += Σ_{w ∈ succ(v), d(w)=d(v)+1} σ(v)/σ(w) · (1 + δ(w)) — one
  join + one aggregate per level.
- betweenness(v) = Σ_s δ(s,v) over v ≠ s.

Directed semantics (paths follow edge direction). Lineage truncates per
round like every other superstep driver.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _brandes(
    edges: DataFrame,
    vertices: DataFrame,
    sources: list[int],
    max_depth: int,
    want_edges: bool,
) -> DataFrame:
    """Shared Brandes forward/backward driver.

    Returns the vertex dependency table (s, v, delta) when ``want_edges``
    is false, else the per-edge credit table (src, dst, c) summed over
    sources and levels — the Girvan–Newman edge score before the final
    aggregate.  The edge credit for (p → w) with d(w) = d(p)+1 is exactly
    the backward term σ(p)/σ(w)·(1+δ(w)); vertex δ sums the same credits
    per predecessor, so both outputs fall out of one backward pass.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    src_df = spark.createDataFrame([(int(s),) for s in sources], "s long")
    # visited state: (s, v, dist, sigma). Every per-level state below is a
    # LAZY localCheckpoint: each is consumed several times (frontier filter,
    # anti-join, union, then once per backward level), and the lazy
    # checkpoint makes all consumers share ONE materialized RDD inside the
    # single job the final action runs — the whole forward+backward
    # recurrence is one Spark job instead of one per level (the pagerank
    # delta_check_every batching shape; eager checkpoints here cost ~10
    # driver-floor jobs per call, measured 4.9 s at bench scale).
    state = (
        vertices.join(src_df, F.col("vertex_id") == F.col("s"), "inner")
        .select(
            "s",
            F.col("vertex_id").alias("v"),
            F.lit(0).alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint(eager=False)
    )
    for level in range(1, max_depth + 1):
        frontier = state.filter(F.col("dist") == level - 1)
        grown = (
            frontier.join(e, frontier["v"] == e["src"])
            .groupBy("s", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .select("s", F.col("dst").alias("v"), "sigma")
        )
        fresh = grown.join(state.select("s", "v"), ["s", "v"], "left_anti")
        state = state.unionByName(
            fresh.select("s", "v", F.lit(level).alias("dist"), "sigma")
        ).localCheckpoint(eager=False)

    # backward accumulation, deepest level first
    delta = state.select("s", "v", F.lit(0.0).alias("delta"))
    edge_credits: list[DataFrame] = []
    for level in range(max_depth, 0, -1):
        succ = (
            state.filter(F.col("dist") == level)
            .join(
                delta.withColumnRenamed("v", "dv").withColumnRenamed(
                    "s", "ds"
                ),
                (F.col("v") == F.col("dv")) & (F.col("s") == F.col("ds")),
            )
            .select(
                "s",
                F.col("v").alias("w"),
                F.col("sigma").alias("sigma_w"),
                F.col("delta").alias("delta_w"),
            )
        )
        pred = state.filter(F.col("dist") == level - 1).select(
            "s", F.col("v").alias("p"), F.col("sigma").alias("sigma_p")
        )
        credits = (
            pred.join(e, pred["p"] == e["src"])
            .join(
                succ,
                (F.col("dst") == succ["w"]) & (pred["s"] == succ["s"]),
            )
            .select(
                pred["s"].alias("s"),
                F.col("p").alias("v"),
                F.col("w"),
                (
                    F.col("sigma_p")
                    / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("c"),
            )
        )
        if want_edges:
            edge_credits.append(
                credits.select(
                    F.col("v").alias("e_src"), F.col("w").alias("e_dst"), "c"
                ).localCheckpoint(eager=False)
            )
        contrib = credits.groupBy("s", "v").agg(F.sum("c").alias("c"))
        delta = (
            delta.join(contrib, ["s", "v"], "left")
            .select(
                "s",
                "v",
                (F.col("delta") + F.coalesce("c", F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=False)
        )

    if want_edges:
        acc = edge_credits[0]
        for part in edge_credits[1:]:
            acc = acc.unionByName(part)
        result = (
            acc.groupBy("e_src", "e_dst")
            .agg(F.sum("c").alias("betweenness"))
            .select(
                F.col("e_src").alias("src"),
                F.col("e_dst").alias("dst"),
                "betweenness",
            )
            .localCheckpoint(eager=True)
        )
        e.unpersist()
        return result

    out = (
        delta.filter(F.col("v") != F.col("s"))
        .groupBy("v")
        .agg(F.sum("delta").alias("betweenness"))
    )
    result = (
        vertices.select("vertex_id")
        .join(out.select(F.col("v").alias("vertex_id"), "betweenness"),
              "vertex_id", "left")
        .select(
            "vertex_id",
            F.coalesce("betweenness", F.lit(0.0)).alias("betweenness"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    return result


def betweenness_sampled(
    edges: DataFrame,
    vertices: DataFrame,
    sources: list[int],
    max_depth: int = 4,
) -> DataFrame:
    """Horizon-bounded Brandes dependency sums from the given sources.

    Returns (vertex_id, betweenness double) for every vertex (sources
    score their own-path contributions from OTHER sources only, per
    Brandes). ``max_depth`` bounds both BFS and back-propagation.
    """
    return _brandes(edges, vertices, sources, max_depth, want_edges=False)


def edge_betweenness_sampled(
    edges: DataFrame,
    vertices: DataFrame,
    sources: list[int],
    max_depth: int = 4,
) -> DataFrame:
    """Horizon-bounded Girvan–Newman edge betweenness from the sources.

    Returns (src, dst, betweenness double) for every directed edge on a
    shortest path of length ≤ ``max_depth`` from some source — the edge
    removal order of Girvan–Newman community detection.  Each source
    credits an edge (v → w) with σ(v)/σ(w)·(1+δ(w)) at the single level
    where d(w) = d(v)+1, so the accumulation is one extra select per
    backward round over the shared Brandes pass — no additional joins.
    """
    return _brandes(edges, vertices, sources, max_depth, want_edges=True)
