"""Distributed Louvain community detection (synchronous move rounds +
multilevel contraction), expressed entirely as DataFrame joins and hash
aggregates — no collect of graph state, no per-row Python.

Reference analog: the reference clusters its citation graph with label
propagation / community structure for evaluation splits
(``/root/reference/halvesting_geometric/utils/data/link_prediction_datamodule.py``
builds the graph whose communities these rounds optimize); Louvain is the
standard modularity-maximizing upgrade of that dataflow (Blondel et al. 2008,
synchronous/distributed variant per Grappolo / "Parallel heuristics for
scalable community detection", Lu et al. 2015 — public papers).

Semantics of one synchronous round (resolution γ=1):

- every vertex *simultaneously* evaluates moving to each neighbor community
  ``c``, scoring ``gain(c) ∝ 2m·k_in(c) − k_v·(Σ_tot(c) − [c = c_cur]·k_v)``
  (the usual ΔQ numerator scaled by (2m)² — order-preserving, and *integral*
  when edge weights are integral, so ranking is bit-portable across engines);
- it moves to the best-scoring community only if that score strictly beats
  the score of staying; ties prefer staying, then the smaller community id.

Scale design: per round the state is one (vertex, comm) table; the round is
three hash-aggregate shuffles (community totals, per-(vertex, neighbor-comm)
weights, argmax) plus the labels join — identical shuffle shape to one label
-propagation superstep, so the pagerank/LPA scaling evidence carries over.
Synchronous moves can oscillate (two singletons swapping communities
forever); the fixpoint driver breaks symmetry with a deterministic per-round
hash parity gate (only half the vertices may move each round), the standard
distributed-Louvain mitigation. Lineage is truncated every round
(localCheckpoint) exactly like pagerank.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "louvain_round",
    "contract_graph",
    "louvain",
    "LouvainResult",
]


def _prepare(edges: DataFrame, weight_col: str | None):
    """Normalize to (und, loops, weighted?) where ``und`` is (a < b, w) with
    multiplicities summed and ``loops`` is (v, w_loop). Weights stay LONG
    when ``weight_col`` is None (exact integral gain arithmetic end-to-end,
    including through contracted levels)."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = edges.select("src", "dst", w.alias("w"))
    loops = (
        base.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("v"))
        .agg(F.sum("w").alias("w_loop"))
    )
    und = (
        base.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    return und, loops


def _degrees(und: DataFrame, loops: DataFrame) -> DataFrame:
    """Weighted degree k_v = Σ_{u≠v} w(v,u) + 2·w_loop(v)."""
    inc = und.select(F.col("a").alias("v"), "w").unionByName(
        und.select(F.col("b").alias("v"), "w")
    )
    deg = inc.groupBy("v").agg(F.sum("w").alias("k"))
    return (
        deg.join(loops, "v", "full_outer")
        .select(
            "v",
            (
                F.coalesce(F.col("k"), F.lit(0))
                + F.lit(2) * F.coalesce(F.col("w_loop"), F.lit(0))
            ).alias("k"),
        )
    )


def louvain_round(
    edges: DataFrame,
    labels: DataFrame | None = None,
    weight_col: str | None = None,
    eligible_parity: int | None = None,
    round_no: int = 0,
) -> DataFrame:
    """One synchronous Louvain move round; returns (vertex_id, comm).

    ``labels`` is (vertex_id, comm); None means singleton init (comm = id).
    ``eligible_parity`` of 0/1 gates moves to vertices whose
    ``xxhash64(vertex_id, round_no) % 2`` matches — the deterministic
    symmetry breaker used by the fixpoint driver. None (the default, and
    what the correctness gate runs) lets every vertex move.

    ``und`` and ``deg`` are persisted here: the round references them ~5
    times each, and without a cache boundary every reference re-expands
    the full upstream plan tree (measured: ~7.7k textual Exchange nodes on
    the gate pipeline — planning-time poison, and 5× recompute of the
    edge normalization at execution). The fixpoint driver persists its own
    copies per level and calls ``_round`` directly.
    """
    und, loops = _prepare(edges, weight_col)
    und = und.persist(StorageLevel.MEMORY_AND_DISK)
    deg = _degrees(und, loops).persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()
    return _round(und, deg, labels, eligible_parity, round_no)


def _round(
    und: DataFrame,
    deg: DataFrame,
    labels: DataFrame | None,
    eligible_parity: int | None,
    round_no: int,
) -> DataFrame:
    """Core move round over a prepared (und, deg) pair — the fixpoint driver
    persists those once per level and calls this per round."""
    if labels is None:
        labels = deg.select("v", F.col("v").alias("comm"))
    else:
        labels = labels.select(
            F.col(labels.columns[0]).alias("v"), F.col(labels.columns[1]).alias("comm")
        )
    state = labels.join(deg, "v")  # (v, comm, k)

    # 2m = total weight incident (loops count twice) — a 1-row literal join
    m2 = state.agg(F.sum("k").alias("m2"))

    sym = und.select(F.col("a").alias("v"), F.col("b").alias("u"), "w").unionByName(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"), "w")
    )
    # k_in(v, c): weight from v into community c (loops excluded by sym)
    kin = (
        sym.join(
            state.select(F.col("v").alias("u"), F.col("comm").alias("c")), "u"
        )
        .groupBy("v", "c")
        .agg(F.sum("w").alias("kin"))
    )
    sigtot = state.groupBy(F.col("comm").alias("c")).agg(F.sum("k").alias("sigtot"))

    # candidate scores: 2m·kin − k_v·(Σtot(c) − [c = comm_v]·k_v)
    cand = (
        kin.join(sigtot, "c")
        .join(state, "v")
        .crossJoin(F.broadcast(m2))
        .select(
            "v",
            "c",
            "comm",
            "k",
            (
                F.col("m2") * F.col("kin")
                - F.col("k")
                * (
                    F.col("sigtot")
                    - F.when(F.col("c") == F.col("comm"), F.col("k")).otherwise(
                        F.lit(0)
                    )
                )
            ).alias("score"),
        )
    )
    # the stay option always exists even with no intra-community neighbor:
    # kin(c_cur) = 0 there, so stay score = −k_v·(Σtot(c_cur) − k_v)
    stay = (
        state.join(sigtot, state["comm"] == sigtot["c"])
        .crossJoin(F.broadcast(m2))
        .select(
            "v",
            (-F.col("k") * (F.col("sigtot") - F.col("k"))).alias("stay0"),
        )
    )
    best = (
        cand.filter(F.col("c") != F.col("comm"))
        .groupBy("v")
        .agg(
            F.max(F.struct(F.col("score"), (-F.col("c")).alias("negc"))).alias("b")
        )
        .select("v", F.col("b.score").alias("best_score"), (-F.col("b.negc")).alias("best_c"))
    )
    stay_full = (
        stay.join(
            cand.filter(F.col("c") == F.col("comm")).select(
                "v", F.col("score").alias("stay_in")
            ),
            "v",
            "left",
        )
        .select("v", F.coalesce("stay_in", "stay0").alias("stay_score"))
    )
    gate = F.lit(True)
    if eligible_parity is not None:
        gate = (
            F.pmod(F.xxhash64(F.col("v"), F.lit(round_no)), F.lit(2))
            == F.lit(eligible_parity)
        )
    return (
        state.select("v", "comm")
        .join(best, "v", "left")
        .join(stay_full, "v")
        .select(
            F.col("v").alias("vertex_id"),
            F.when(
                (F.col("best_score").isNotNull())
                & (F.col("best_score") > F.col("stay_score"))
                & gate,
                F.col("best_c"),
            )
            .otherwise(F.col("comm"))
            .alias("comm"),
        )
    )


def contract_graph(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = None,
) -> DataFrame:
    """Community supergraph: vertices = communities, edge weight = summed
    inter-community weight, self-loops = intra-community weight (internal
    und edges once + member loops). Returns (src, dst, weight) with
    src <= dst — feed back into ``louvain_round(weight_col="weight")``
    (or weight_col=None arithmetic stays integral since the column is LONG
    for unweighted inputs — pass ``weight_col="weight"`` to use it)."""
    und, loops = _prepare(edges, weight_col)
    lab = labels.select(
        F.col(labels.columns[0]).alias("v"), F.col(labels.columns[1]).alias("comm")
    )
    mapped = (
        und.join(lab.select(F.col("v").alias("a"), F.col("comm").alias("ca")), "a")
        .join(lab.select(F.col("v").alias("b"), F.col("comm").alias("cb")), "b")
        .select(
            F.least("ca", "cb").alias("src"),
            F.greatest("ca", "cb").alias("dst"),
            "w",
        )
    )
    loop_part = loops.join(lab, "v").select(
        F.col("comm").alias("src"), F.col("comm").alias("dst"), F.col("w_loop").alias("w")
    )
    return (
        mapped.unionByName(loop_part)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("weight"))
    )


@dataclass
class LouvainResult:
    labels: DataFrame  # (vertex_id, comm) over the ORIGINAL vertex ids
    levels: int
    rounds_per_level: list[int]
    num_communities: int
    metrics: list[dict] = field(default_factory=list)


def louvain(
    edges: DataFrame,
    weight_col: str | None = None,
    max_levels: int = 4,
    max_rounds: int = 16,
) -> LouvainResult:
    """Multilevel Louvain fixpoint: parity-gated synchronous move rounds to
    local convergence, contract, repeat until the community count stops
    shrinking or ``max_levels``. One Spark action per round (the move
    count), lineage truncated per round."""
    metrics: list[dict] = []
    rounds_per_level: list[int] = []
    # current level's graph + the original-vertex → current-comm composition
    cur_edges = edges.select("src", "dst", *([weight_col] if weight_col else []))
    cur_w = weight_col
    mapping: DataFrame | None = None  # (vertex_id, comm) over original ids
    n_comm_prev: int | None = None
    level = 0
    for level in range(max_levels):
        und, loops = _prepare(cur_edges, cur_w)
        und = und.persist(StorageLevel.MEMORY_AND_DISK)
        deg = _degrees(und, loops).persist(StorageLevel.MEMORY_AND_DISK)
        deg.count()
        labels: DataFrame | None = None
        prev_cached: DataFrame | None = None
        rounds = 0
        idle = 0
        for r in range(max_rounds):
            t0 = time.monotonic()
            nxt = _round(
                und,
                deg,
                labels,
                eligible_parity=r % 2,
                round_no=r,
            ).persist(StorageLevel.MEMORY_AND_DISK)
            if labels is None:
                moved = nxt.filter(F.col("vertex_id") != F.col("comm")).count()
            else:
                moved = (
                    nxt.join(
                        labels.select(
                            F.col("vertex_id"), F.col("comm").alias("old")
                        ),
                        "vertex_id",
                    )
                    .filter(F.col("comm") != F.col("old"))
                    .count()
                )
            metrics.append(
                {
                    "level": level,
                    "round": r,
                    "moved": moved,
                    "wall_sec": time.monotonic() - t0,
                }
            )
            state = nxt.select("vertex_id", "comm").localCheckpoint(eager=False)
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = nxt
            labels = state
            rounds = r + 1
            idle = idle + 1 if moved == 0 else 0
            if idle >= 2:  # a full even+odd parity sweep with no motion
                break
        rounds_per_level.append(rounds)
        assert labels is not None
        labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
        n_comm = labels.select("comm").distinct().count()
        if prev_cached is not None:
            prev_cached.unpersist()
        und.unpersist()
        deg.unpersist()
        # compose down to original vertex ids
        if mapping is None:
            mapping = labels
        else:
            mapping = (
                mapping.select(
                    "vertex_id", F.col("comm").alias("mid")
                )
                .join(
                    labels.select(
                        F.col("vertex_id").alias("mid"), F.col("comm")
                    ),
                    "mid",
                )
                .select("vertex_id", "comm")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        if n_comm_prev is not None and n_comm >= n_comm_prev:
            level += 1
            break
        n_comm_prev = n_comm
        contracted = contract_graph(cur_edges, labels, weight_col=cur_w).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        contracted.count()
        cur_edges = contracted
        cur_w = "weight"
        level += 1
    assert mapping is not None
    n_final = mapping.select("comm").distinct().count()
    return LouvainResult(
        labels=mapping.select("vertex_id", "comm"),
        levels=level,
        rounds_per_level=rounds_per_level,
        num_communities=n_final,
        metrics=metrics,
    )
