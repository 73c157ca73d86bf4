"""Incremental triangle counting over a growing edge table (engine-new).

The reference counts triangles batch-only; this is the delta idiom for a
stream of edge batches. State = the cumulative canonical edge set plus the
per-vertex triangle counts. For a batch B (deduped against the state), the
new triangles are exactly those of E ∪ B containing at least one B edge,
and each is counted ONCE by charging it to its canonically-smallest new
edge: for every new edge (a, b), count common neighbors c of a and b in
E ∪ B such that neither cross edge (a, c) nor (b, c) is a new edge that is
lexicographically smaller than (a, b). Triangles with one new edge have
both crosses old (always counted); with two or three new edges, only the
smallest new edge's probe survives the filter.

Scale shape: the per-update cost is a wedge probe seeded by the DELTA only
— Σ_{(a,b)∈B} (deg(a) + deg(b)) candidate rows, shuffled on the shared
neighbor key — never a recount of the cumulative graph. State lineage is
truncated every update (localCheckpoint), so plans stay flat across
thousands of updates (the frontier-plan-growth rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


class IncrementalTriangles:
    """In-session incremental triangle counter.

    ``update(new_edges)`` folds one batch of (src, dst) edges into the
    running count and returns the number of triangles the batch created.
    ``total`` is the cumulative triangle count; ``per_vertex()`` the
    cumulative (vertex_id, triangles) table (vertices in no triangle are
    absent, matching the batch counter's sparse convention).
    """

    def __init__(self) -> None:
        self.edges: DataFrame | None = None
        self.total: int = 0
        self._pv: DataFrame | None = None
        self.updates: int = 0

    def update(self, new_edges: DataFrame) -> int:
        b = _canon(new_edges)
        if self.edges is not None:
            b = b.join(self.edges, ["src", "dst"], "left_anti")
        b = b.localCheckpoint(eager=True)

        old = (
            self.edges.withColumn("is_new", F.lit(False))
            if self.edges is not None
            else None
        )
        alle = b.withColumn("is_new", F.lit(True))
        if old is not None:
            alle = old.unionByName(alle)
        # symmetric adjacency carrying each cross edge's canonical identity,
        # so the "smallest new edge owns the triangle" filter can compare
        adj = alle.select(
            F.col("src").alias("u"), F.col("dst").alias("v"),
            "src", "dst", "is_new",
        ).unionByName(
            alle.select(
                F.col("dst").alias("u"), F.col("src").alias("v"),
                "src", "dst", "is_new",
            )
        )
        e_key = F.struct(F.col("e.src"), F.col("e.dst"))
        probe = (
            b.alias("e")
            .join(adj.alias("x"), F.col("x.u") == F.col("e.src"))
            .filter(F.col("x.v") != F.col("e.dst"))
            .join(
                adj.alias("y"),
                (F.col("y.u") == F.col("e.dst"))
                & (F.col("y.v") == F.col("x.v")),
            )
            .filter(
                ~(
                    F.col("x.is_new")
                    & (F.struct(F.col("x.src"), F.col("x.dst")) < e_key)
                )
                & ~(
                    F.col("y.is_new")
                    & (F.struct(F.col("y.src"), F.col("y.dst")) < e_key)
                )
            )
            .select(
                F.col("e.src").alias("a"),
                F.col("e.dst").alias("b"),
                F.col("x.v").alias("c"),
            )
            .localCheckpoint(eager=True)
        )
        delta_pv = (
            probe.select(F.col("a").alias("vertex_id"))
            .unionByName(probe.select(F.col("b").alias("vertex_id")))
            .unionByName(probe.select(F.col("c").alias("vertex_id")))
            .groupBy("vertex_id")
            .agg(F.count("*").cast("long").alias("triangles"))
        )
        delta = probe.count()

        merged = b if self.edges is None else self.edges.unionByName(b)
        self.edges = merged.localCheckpoint(eager=True)
        if self._pv is None:
            self._pv = delta_pv.localCheckpoint(eager=True)
        else:
            self._pv = (
                self._pv.unionByName(delta_pv)
                .groupBy("vertex_id")
                .agg(F.sum("triangles").cast("long").alias("triangles"))
                .localCheckpoint(eager=True)
            )
        self.total += delta
        self.updates += 1
        return delta

    def per_vertex(self) -> DataFrame:
        if self._pv is None:
            raise ValueError("no updates folded yet")
        return self._pv
