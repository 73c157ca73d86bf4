"""Maximal matching via local-minimum edge selection (Luby-style).

Engine-new per ``BASELINE.json`` ``north_rule`` (link-graph analytics
family) — the edge analog of ``operators/mis.py``: per round, every live
edge whose seeded-hash priority is a STRICT minimum among all edges sharing
either endpoint joins the matching; both endpoints then leave the live set.
Expected O(log n) rounds (Israeli–Itai / Luby analysis). The result is a
maximal (not maximum) matching — every original edge touches a matched
vertex — the standard substrate for multilevel graph coarsening.

Determinism: edge priority is the engine's selectable 64-bit hash of the
canonical endpoints (``hash_method='portable'`` for the DuckDB twin), with
the strict total order (priority, a, b) breaking hash collisions, so the
matching is a pure function of the graph and seed.

Scale shape: each round is one explode-to-endpoints projection (2·E rows),
one min-struct hash aggregate per vertex (map-side combinable — no
per-vertex edge lists), one join back to the live edge set, and two
left-anti joins to drop matched endpoints; live edges shrink every round
(every unmatched live edge lost at least one competitor), per-round
lineage truncated with eager ``localCheckpoint`` like the other iterative
drivers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.sampling import hash64


@dataclass
class MatchingResult:
    matching: DataFrame  # (a, b) canonical matched pairs
    rounds: int
    num_matched: int
    metrics: list[dict] = field(default_factory=list)


def maximal_matching(
    edges: DataFrame,
    seed: int = 42,
    hash_method: str = "xxhash64",
    fixed_rounds: int | None = None,
    max_rounds: int = 200,
) -> MatchingResult:
    """Greedy maximal matching of the undirected graph.

    ``edges``: (src, dst); treated undirected, self-loops dropped,
    deduplicated. Returns canonical (a, b) matched pairs. ``fixed_rounds``
    runs exactly that many selection rounds (gate mode — the DuckDB twin
    unrolls the same count); default runs to maximality and raises past
    ``max_rounds`` (expected-log-bounded: indicates a bug, not a big graph).
    """
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    live = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .withColumn("pr", hash64(hash_method, F.col("a"), F.col("b"), seed=seed))
        .repartition(n_shuffle, "a")
        .localCheckpoint(eager=True)
    )
    matched_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    r = 0
    converged = False
    for r in range(1, rounds + 1):
        if live.limit(1).count() == 0:
            converged = True
            r -= 1
            break
        key = F.struct("pr", "a", "b")
        cand = live.select(F.col("a").alias("v"), key.alias("k")).unionByName(
            live.select(F.col("b").alias("v"), key.alias("k"))
        )
        vmin = cand.groupBy("v").agg(F.min("k").alias("m"))
        sel = (
            live.join(
                vmin.select(F.col("v").alias("a"), F.col("m").alias("ma")),
                "a",
            )
            .join(
                vmin.select(F.col("v").alias("b"), F.col("m").alias("mb")),
                "b",
            )
            .filter((key == F.col("ma")) & (key == F.col("mb")))
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_sel = sel.count()
        matched_parts.append(sel)
        mv = (
            sel.select(F.col("a").alias("v"))
            .unionByName(sel.select(F.col("b").alias("v")))
            .distinct()
        )
        nxt = (
            live.join(mv.select(F.col("v").alias("a")), "a", "left_anti")
            .join(mv.select(F.col("v").alias("b")), "b", "left_anti")
            .select("a", "b", "pr")
            .repartition(n_shuffle, "a")
            .localCheckpoint(eager=True)
        )
        n_live = nxt.count()
        metrics.append({"round": r, "matched": n_sel, "live_edges": n_live})
        live.unpersist()
        live = nxt
        if fixed_rounds is None and n_live == 0:
            converged = True
            break
    if fixed_rounds is None and not converged:
        raise RuntimeError(
            f"maximal_matching did not converge within max_rounds="
            f"{max_rounds} — expected-log-bounded, so this indicates a bug"
        )
    out = None
    for p in matched_parts:
        out = p if out is None else out.unionByName(p)
    if out is None:
        out = spark.createDataFrame([], "a long, b long")
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    n = out.count()
    live.unpersist()
    return MatchingResult(
        matching=out, rounds=r, num_matched=n, metrics=metrics
    )


def coarsen_graph(
    edges: DataFrame,
    seed: int = 42,
    hash_method: str = "xxhash64",
    fixed_rounds: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """One level of multilevel graph coarsening over a maximal matching —
    the Metis/Karypis-Kumar scheme re-expressed as dataflow: every matched
    pair (a, b) contracts into supernode ``a`` (the canonical smaller id),
    unmatched vertices survive unchanged, and the coarse edge set is the
    relabeled canonical edge set with multiplicities summed into a
    ``weight`` column (collapsed parallel edges carry their count, the
    standard coarse-weight convention) and self-loops dropped.

    Returns (a, b, weight) canonical coarse edges. The contraction mapping
    is only materialized for MATCHED ``b``-side vertices (one row per
    matched pair — everything else is identity), so relabeling is two
    broadcast-or-shuffle left joins against a table half the matching size,
    never a vertex-universe join. Repeated application halves the vertex
    count geometrically (matching is maximal), which is the multilevel
    ladder a partitioner or a coarse-to-fine layout pass runs on.
    """
    res = maximal_matching(
        edges,
        seed=seed,
        hash_method=hash_method,
        fixed_rounds=fixed_rounds,
        max_rounds=max_rounds,
    )
    mp = res.matching.select(F.col("b").alias("v"), F.col("a").alias("s"))
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("ca"),
            F.greatest("src", "dst").alias("cb"),
        )
        .distinct()
    )
    rel = (
        canon.join(
            mp.select(F.col("v").alias("ca"), F.col("s").alias("sa")),
            "ca",
            "left",
        )
        .join(
            mp.select(F.col("v").alias("cb"), F.col("s").alias("sb")),
            "cb",
            "left",
        )
        .select(
            F.coalesce(F.col("sa"), F.col("ca")).alias("ra"),
            F.coalesce(F.col("sb"), F.col("cb")).alias("rb"),
        )
    )
    out = (
        rel.select(
            F.least("ra", "rb").alias("a"), F.greatest("ra", "rb").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
    )
    res.matching.unpersist()
    return out
