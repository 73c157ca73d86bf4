"""Strongly connected components of the directed conversation graph via
the coloring algorithm (Orzan 2004; the BSP formulation used by Slota et
al. and graph engines generally — public algorithms), expressed as
DataFrame supersteps.

Each peel round:

1. **Trim** — an active vertex with no in-edge or no out-edge inside the
   active subgraph cannot sit in a non-trivial SCC: emit it as a singleton
   (this is what collapses chains and the power-law periphery in O(1)
   rounds each).
2. **Forward min-color propagation** — ``color(v)`` converges to the
   smallest vertex id that reaches ``v`` (superstep join + min-aggregate,
   O(diameter) iterations).
3. **Backward collection** — for each root ``c`` (``color(c) = c``), the
   SCC of ``c`` is exactly the set of vertices that reach ``c`` through
   same-colored vertices; collect it by reverse-BFS along same-color
   edges. Members are assigned ``scc_id = c`` and removed.

The giant SCC of a web-like graph is collected in the first round; the
rest peels in a handful of rounds. SCC ids are canonical (minimum member
id), so results are deterministic and engine-independent — the DuckDB
oracle recomputes them from the mutual-reachability closure.

Scale shape: every step is an equi-join + hash aggregate keyed by vertex
id; per-iteration state is one (vertex, color|root) table; lineage is cut
per iteration (persist + count, previous unpersisted). No adjacency is
ever buffered per-vertex.

Reference analog: the reference's citation graph is directed
(``/root/reference/halvesting_geometric/utils/data/link_prediction_datamodule.py``
builds directed cites edges); SCC is the standard directed complement of
the undirected connected-components driver (components.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "strongly_connected_components",
    "SCCResult",
    "condensation",
    "topological_levels",
]


@dataclass
class SCCResult:
    components: DataFrame  # (vertex_id, scc_id) — scc_id = min member id
    rounds: int
    num_components: int
    metrics: list[dict] = field(default_factory=list)


def _minus(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b.select("vertex_id"), "vertex_id", "left_anti")


def strongly_connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_peel_rounds: int = 64,
    max_prop_iters: int = 256,
) -> SCCResult:
    """(vertex_id, scc_id) over the simple digraph induced by ``edges``."""
    dir_e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vertex_id"))
            .unionByName(edges.select(F.col("dst").alias("vertex_id")))
            .distinct()
        )
    active = vertices.select("vertex_id").persist(StorageLevel.MEMORY_AND_DISK)
    e_act = dir_e.persist(StorageLevel.MEMORY_AND_DISK)
    e_act.count()

    assigned: DataFrame | None = None
    metrics: list[dict] = []
    rounds = 0
    for rounds in range(1, max_peel_rounds + 1):
        n_active = active.count()
        if n_active == 0:
            rounds -= 1
            break
        # ---- trim: no out-edge or no in-edge inside the active subgraph
        has_out = e_act.select(F.col("src").alias("vertex_id")).distinct()
        has_in = e_act.select(F.col("dst").alias("vertex_id")).distinct()
        both = active.join(has_out, "vertex_id", "left_semi").join(
            has_in, "vertex_id", "left_semi"
        )
        trimmed = _minus(active, both).select(
            "vertex_id", F.col("vertex_id").alias("scc_id")
        )
        n_trim = trimmed.count()
        new_assigned = trimmed
        survivors = both.persist(StorageLevel.MEMORY_AND_DISK)
        n_surv = survivors.count()
        members_cnt = 0
        if n_surv > 0:
            sub_e = (
                e_act.join(
                    survivors.select(F.col("vertex_id").alias("src")), "src", "left_semi"
                )
                .join(
                    survivors.select(F.col("vertex_id").alias("dst")), "dst", "left_semi"
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            sub_e.count()
            # ---- forward min-color propagation to fixpoint
            color = survivors.select(
                "vertex_id", F.col("vertex_id").alias("color")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            for _ in range(max_prop_iters):
                inc = (
                    sub_e.join(
                        color.select(
                            F.col("vertex_id").alias("src"), F.col("color").alias("c")
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("vertex_id"))
                    .agg(F.min("c").alias("min_in"))
                )
                nxt = (
                    color.join(inc, "vertex_id", "left")
                    .select(
                        "vertex_id",
                        F.col("color").alias("old"),
                        F.least(
                            F.col("color"), F.coalesce("min_in", F.col("color"))
                        ).alias("color"),
                    )
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                changed = nxt.filter(F.col("color") != F.col("old")).count()
                color.unpersist()
                color = nxt.select("vertex_id", "color").localCheckpoint(
                    eager=False
                ).persist(StorageLevel.MEMORY_AND_DISK)
                nxt.unpersist()
                if changed == 0:
                    break
            else:
                raise RuntimeError(
                    f"forward propagation exceeded {max_prop_iters} iters"
                )
            # ---- backward collection along same-color edges
            ce = (
                sub_e.join(
                    color.select(
                        F.col("vertex_id").alias("src"), F.col("color").alias("sc")
                    ),
                    "src",
                )
                .join(
                    color.select(
                        F.col("vertex_id").alias("dst"), F.col("color").alias("dc")
                    ),
                    "dst",
                )
                .filter(F.col("sc") == F.col("dc"))
                .select("src", "dst", F.col("sc").alias("c"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            ce.count()
            members = (
                color.filter(F.col("color") == F.col("vertex_id"))
                .select("vertex_id", F.col("vertex_id").alias("scc_id"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            roots = members
            frontier = members
            while True:
                grown = (
                    ce.join(
                        frontier.select(
                            F.col("vertex_id").alias("dst"),
                            F.col("scc_id").alias("root"),
                        ),
                        "dst",
                    )
                    .filter(F.col("c") == F.col("root"))
                    .select(
                        F.col("src").alias("vertex_id"), F.col("root").alias("scc_id")
                    )
                    .distinct()
                )
                fresh = grown.join(
                    members.select("vertex_id"), "vertex_id", "left_anti"
                ).persist(StorageLevel.MEMORY_AND_DISK)
                n_fresh = fresh.count()
                if frontier is not roots:
                    frontier.unpersist()
                if n_fresh == 0:
                    fresh.unpersist()
                    break
                prev_members = members
                members = (
                    members.unionByName(fresh)
                    .localCheckpoint(eager=False)
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                members.count()
                if prev_members is not roots:
                    prev_members.unpersist()
                frontier = fresh
            members_cnt = members.count()
            new_assigned = new_assigned.unionByName(members)
            # ---- shrink the active set
            remaining = _minus(survivors, members).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            new_e = (
                sub_e.join(
                    remaining.select(F.col("vertex_id").alias("src")), "src", "left_semi"
                )
                .join(
                    remaining.select(F.col("vertex_id").alias("dst")), "dst", "left_semi"
                )
                .localCheckpoint(eager=False)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_e.count()
            ce.unpersist()
            color.unpersist()
            sub_e.unpersist()
            e_act.unpersist()
            e_act = new_e
            nxt_active = remaining
        else:
            members = None
            roots = None
            nxt_active = survivors
        prev_assigned = assigned
        assigned = (
            new_assigned
            if assigned is None
            else assigned.unionByName(new_assigned)
        ).localCheckpoint(eager=False).persist(StorageLevel.MEMORY_AND_DISK)
        assigned.count()
        if prev_assigned is not None:
            prev_assigned.unpersist()
        if n_surv > 0 and members is not None:
            if roots is not None and roots is not members:
                roots.unpersist()
            members.unpersist()
        metrics.append(
            {
                "round": rounds,
                "active": n_active,
                "trimmed": n_trim,
                "collected": members_cnt,
            }
        )
        prev_active = active
        active = nxt_active.localCheckpoint(eager=False).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        active.count()
        prev_active.unpersist()
        survivors.unpersist()
    else:
        if active.count() > 0:
            raise RuntimeError(f"SCC did not finish in {max_peel_rounds} rounds")
    if assigned is None:  # empty vertex set
        assigned = vertices.sparkSession.createDataFrame(
            [], "vertex_id long, scc_id long"
        )
    n_comp = assigned.select("scc_id").distinct().count()
    e_act.unpersist()
    active.unpersist()
    return SCCResult(
        components=assigned.select("vertex_id", "scc_id"),
        rounds=rounds,
        num_components=n_comp,
        metrics=metrics,
    )


def condensation(edges: DataFrame, components: DataFrame) -> DataFrame:
    """The condensation DAG: one vertex per SCC, a distinct edge
    (scc(src) → scc(dst)) for every inter-component edge. Always acyclic
    (textbook property), so downstream DAG algorithms — topological
    levels, longest paths, reachability — apply. Returns (src, dst)."""
    lab = components.select(
        F.col(components.columns[0]).alias("v"),
        F.col(components.columns[1]).alias("c"),
    )
    return (
        edges.select("src", "dst")
        .join(lab.select(F.col("v").alias("src"), F.col("c").alias("cs")), "src")
        .join(lab.select(F.col("v").alias("dst"), F.col("c").alias("cd")), "dst")
        .filter(F.col("cs") != F.col("cd"))
        .select(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def topological_levels(
    dag_edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 512,
) -> DataFrame:
    """Longest-path-from-source level per DAG vertex (level 0 = sources):
    the canonical parallel topological layering — ``level(v) =
    1 + max(level(u) for u → v)``, iterated to fixpoint (≤ DAG depth
    supersteps, each one gather join + max aggregate + pair compare).
    Raises if the fixpoint is not reached in ``max_iters`` (i.e. the
    input has a cycle — feed SCC condensations, not raw digraphs).
    Returns (vertex_id, level)."""
    if vertices is None:
        vertices = (
            dag_edges.select(F.col("src").alias("vertex_id"))
            .unionByName(dag_edges.select(F.col("dst").alias("vertex_id")))
            .distinct()
        )
    e = dag_edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    level = vertices.select(
        "vertex_id", F.lit(0).cast("long").alias("level")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    prev: DataFrame | None = None
    for _ in range(max_iters):
        cand = (
            e.join(
                level.select(F.col("vertex_id").alias("src"), "level"), "src"
            )
            .groupBy(F.col("dst").alias("vertex_id"))
            .agg((F.max("level") + F.lit(1)).alias("cand"))
        )
        nxt = (
            level.join(cand, "vertex_id", "left")
            .select(
                "vertex_id",
                F.col("level").alias("old"),
                F.greatest(
                    F.col("level"), F.coalesce("cand", F.col("level"))
                ).alias("level"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = nxt.filter(F.col("level") != F.col("old")).count()
        if prev is not None:
            prev.unpersist()
        state = nxt.select("vertex_id", "level").localCheckpoint(eager=False)
        prev = nxt
        level = state
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"no fixpoint within {max_iters} supersteps — input has a cycle"
        )
    out = level.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    e.unpersist()
    return out
