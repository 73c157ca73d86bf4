"""Minimum spanning forest via distributed Borůvka contraction.

Engine-new per ``BASELINE.json`` ``north_rule`` (link-graph analytics family);
the reference computes no spanning structures. Algorithm: classic Borůvka
(1926) in its MapReduce contraction form — each round every live component
picks its minimum-weight incident edge under a STRICT total order
``(weight, a, b)`` (ties broken by canonical ORIGINAL endpoints, so the
forest is unique even with duplicate weights), the chosen edges merge
components, and the edge multigraph is contracted onto the merged component
ids. Component count at least halves per round → O(log V) rounds.

Scale shape (100 TB design):

- The per-round work is ONE E-sized relabel join + ONE E-sized min
  aggregation, both on the *contracted* edge set, which shrinks
  geometrically: total work O(E log V) worst case, O(E) in practice once
  the giant component forms.
- The merge step never materializes per-vertex state: components are
  implicit in the contracted edge endpoints. Each round's chosen-edge
  pointer graph is component-count sized (≤ V/2^round); its merge groups
  are resolved by the engine's proven ``connected_components`` driver
  (Kiveris small-star/large-star — the same code path measured at 20M
  edges), giving each group its minimum component id as representative.
  Which representative is used does not affect the forest: the chosen-edge
  set per round depends only on the PARTITION into components and the
  (w, a, b) total order on original endpoints, not on the labels — so the
  DuckDB twin, which uses pointer-root labels instead, provably emits the
  identical forest.
- Round state is hard-bounded: every round's forest increment is an EAGER
  ``localCheckpoint`` (≤ one row per live component) taken before the old
  contracted edge table is unpersisted, so no deferred plan ever reaches
  back through freed cache blocks, and per-round lineage is truncated
  exactly like the other iterative drivers (pagerank/components/louvain).

Correctness gate: ``msf`` unrolls the same rounds as chained CTEs in DuckDB
(fixed pointer-jump depth 8 = chains up to 256, ample for the fixture);
pytest cross-checks against a pure-Python Kruskal union-find on random
graphs with duplicate weights.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MSFResult:
    forest: DataFrame  # (a, b, weight) canonical original endpoints
    rounds: int
    num_edges: int
    total_weight: float
    metrics: list[dict] = field(default_factory=list)


def _canonical_weighted(edges: DataFrame, weight_col: str) -> DataFrame:
    """Canonicalize to a<b, drop self-loops, keep the minimum-weight parallel
    edge per pair (min by weight alone is unique per pair)."""
    e = edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.col(weight_col).cast("double").alias("w"),
    )
    return e.groupBy("a", "b").agg(F.min("w").alias("w"))


def _merge_representatives(ptr: DataFrame) -> DataFrame:
    """(c, root): each component of the chosen-edge pointer graph mapped to
    its merge group's minimum component id, via the engine's
    connected-components driver (component-count-sized input)."""
    from halvesting_geometric_spark.operators.components import (
        connected_components,
    )

    verts = ptr.select(F.col("c").alias("vertex_id")).distinct()
    cc = connected_components(
        ptr.select(F.col("c").alias("src"), F.col("other").alias("dst")),
        verts,
    )
    return cc.components.select(
        F.col("vertex_id").alias("c"), F.col("component").alias("root")
    )


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    fixed_rounds: int | None = None,
    max_rounds: int = 64,
) -> MSFResult:
    """Unique minimum spanning forest of the undirected weighted graph.

    ``edges``: (src, dst, <weight_col>); treated undirected, self-loops
    dropped, parallel edges collapsed to their minimum weight. The forest is
    the MSF under the strict total order (weight, a, b) — deterministic even
    with duplicate weights (equivalent to Kruskal with the same tie-break).

    ``fixed_rounds``: run exactly that many Borůvka rounds (gate mode — the
    DuckDB twin unrolls the same count); default contracts to the fixpoint
    (no cross-component edges remain) and raises if ``max_rounds`` is
    exceeded (log2-bounded, so this indicates a bug, not a big graph).
    """
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    live = (
        _canonical_weighted(edges, weight_col)
        .select("a", "b", "w", F.col("a").alias("oa"), F.col("b").alias("ob"))
        .repartition(n_shuffle, "a")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    forest_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    r = 0
    converged = False
    for r in range(1, rounds + 1):
        if fixed_rounds is None and live.limit(1).count() == 0:
            converged = True
            r -= 1
            break
        # each live endpoint component picks its min incident edge under
        # the strict total order (w, oa, ob); `other` rides along
        cand = live.select(
            F.col("a").alias("c"),
            F.struct("w", "oa", "ob", F.col("b").alias("other")).alias("e"),
        ).unionByName(
            live.select(
                F.col("b").alias("c"),
                F.struct("w", "oa", "ob", F.col("a").alias("other")).alias(
                    "e"
                ),
            )
        )
        choice = (
            cand.groupBy("c")
            .agg(F.min("e").alias("e"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # the round's forest increment: ≤ 1 row per live component — EAGER
        # checkpoint so its lineage never reaches back after unpersists
        part = (
            choice.select(
                F.col("e.oa").alias("a"),
                F.col("e.ob").alias("b"),
                F.col("e.w").alias("weight"),
            )
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        forest_parts.append(part)
        ptr = choice.select("c", F.col("e.other").alias("other"))
        roots = _merge_representatives(ptr)
        ra = roots.select(F.col("c").alias("a"), F.col("root").alias("ra"))
        rb = roots.select(F.col("c").alias("b"), F.col("root").alias("rb"))
        relabeled = (
            live.join(ra, "a", "left")
            .join(rb, "b", "left")
            .select(
                F.coalesce("ra", F.col("a")).alias("na"),
                F.coalesce("rb", F.col("b")).alias("nb"),
                "w",
                "oa",
                "ob",
            )
            .filter(F.col("na") != F.col("nb"))
        )
        nxt = (
            relabeled.select(
                F.least("na", "nb").alias("a"),
                F.greatest("na", "nb").alias("b"),
                "w",
                "oa",
                "ob",
            )
            .groupBy("a", "b")
            .agg(F.min(F.struct("w", "oa", "ob")).alias("e"))
            .select("a", "b", "e.w", "e.oa", "e.ob")
            .repartition(n_shuffle, "a")
            .localCheckpoint(eager=True)
        )
        n_live = nxt.count()
        metrics.append(
            {"round": r, "live_edges": n_live, "chosen": part.count()}
        )
        choice.unpersist()
        live.unpersist()
        live = nxt
        if fixed_rounds is None and n_live == 0:
            converged = True
            break
    if fixed_rounds is None and not converged:
        raise RuntimeError(
            f"Borůvka did not converge within max_rounds={max_rounds} — "
            f"log2-bounded, so this indicates a bug"
        )
    spark_forest = None
    for part in forest_parts:
        spark_forest = (
            part
            if spark_forest is None
            else spark_forest.unionByName(part)
        )
    if spark_forest is None:
        spark_forest = spark.createDataFrame(
            [], "a long, b long, weight double"
        )
    forest = spark_forest.dropDuplicates(["a", "b"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats = forest.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("weight"), F.lit(0.0)).alias("tw")
    ).first()
    live.unpersist()
    return MSFResult(
        forest=forest,
        rounds=r,
        num_edges=int(stats["n"]),
        total_weight=float(stats["tw"]),
        metrics=metrics,
    )
