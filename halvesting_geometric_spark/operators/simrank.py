"""SimRank structural similarity (Jeh & Widom, KDD 2002).

"Two objects are similar if they are referenced by similar objects" — the
classic citation-graph similarity measure, so it is a natural member of this
engine's link-graph family (BASELINE.json ``north_rule``: citation edge table
citing_paper → cited_paper). Engine-new: beyond the reference's analytics
surface, same relational-superstep substrate as ``operators/centrality.py``.

In-neighbor formulation on the directed graph, iterated ``k`` times:

    s_0(a,b) = 1{a=b}
    s_t(a,a) = 1
    s_t(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s_{t-1}(i,j)

where I(v) is the in-neighbor set; pairs where either side has no
in-neighbor score 0 and are not emitted. The pair-state is kept sparse and
symmetric-canonical (only a < b rows are stored; the diagonal is implicit),
and each superstep is pure relational algebra:

    expand  = state ∪ swap(state) ∪ {(v,v,1) : outdeg(v) > 0}
    raw     = expand ⋈ edges(a=src) ⋈ edges(b=src)   [kept dst_a < dst_b]
              groupBy (dst_a, dst_b) → Σ s
    state'  = C · raw / (indeg(dst_a) · indeg(dst_b))

Execution shape: the deduplicated (src, dst) topology and the in-degree
table are cached once; every iteration's state is a lazy ``localCheckpoint``
(lineage truncation, no per-iteration driver action — the whole recurrence
materializes in one Spark job at the final action, the same driver-floor
amortization measured for pagerank/katz/hits).

Scale notes — exact SimRank's pair state is the known hazard, not the plan:
- the update fans each stored pair (i, j) out to outdeg(i)·outdeg(j)
  successor pairs before the groupBy re-aggregates; hubs therefore dominate
  cost. ``max_out_degree`` drops edges out of vertices above the cap before
  iterating (documented approximation, exact on bounded-degree graphs).
- ``min_score`` is the standard ε-truncation: pairs below the threshold are
  pruned between supersteps, bounding |state| at a small score cost.
- at true web scale the published approach is Monte-Carlo reverse-walk
  meeting (Fogaras & Rácz, WWW 2005) over the same walk substrate as
  ``operators/walks.py``; bounded-k exact mode here is the verification
  anchor (the correctness gate's DuckDB twin unrolls the recurrence).

Deterministic given (k, C) — no RNG anywhere — so an external ANSI-SQL
engine replays it exactly.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["simrank"]


def simrank(
    edges: DataFrame,
    k: int = 2,
    c: float = 0.8,
    min_score: float | None = None,
    max_out_degree: int | None = None,
) -> DataFrame:
    """k-iteration SimRank over the directed (src, dst) edge table.

    Returns (a, b, score) with a < b, one row per pair with score > 0
    after ``k`` iterations (the implicit diagonal s(v,v)=1 is not emitted).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 < c <= 1.0:
        raise ValueError(f"c must be in (0, 1], got {c}")
    spark = edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if max_out_degree is not None:
        keep = (
            e.groupBy("src")
            .agg(F.count("*").alias("od"))
            .where(F.col("od") <= max_out_degree)
            .select("src")
        )
        e = e.join(keep, "src")
    e = e.repartition(n_shuffle, "src").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    ind = (
        e.groupBy("dst")
        .agg(F.count("*").alias("ind"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ind.count()

    diag = (
        e.select(F.col("src").alias("a"))
        .distinct()
        .select("a", F.col("a").alias("b"), F.lit(1.0).alias("s"))
    )
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("da"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("db"))
    ia = ind.select(F.col("dst").alias("da"), F.col("ind").alias("ia"))
    ib = ind.select(F.col("dst").alias("db"), F.col("ind").alias("ib"))

    state: DataFrame | None = None
    for _ in range(k):
        if state is None:
            expand = diag
        else:
            expand = diag.unionByName(state).unionByName(
                state.select(
                    F.col("b").alias("a"), F.col("a").alias("b"), "s"
                )
            )
        raw = (
            expand.join(e1, "a")
            .join(e2, "b")
            .where(F.col("da") < F.col("db"))
            .groupBy("da", "db")
            .agg(F.sum("s").alias("raw"))
        )
        nxt = (
            raw.join(ia, "da")
            .join(ib, "db")
            .select(
                F.col("da").alias("a"),
                F.col("db").alias("b"),
                (F.lit(c) * F.col("raw") / (F.col("ia") * F.col("ib"))).alias(
                    "s"
                ),
            )
        )
        if min_score is not None:
            nxt = nxt.where(F.col("s") >= min_score)
        state = nxt.localCheckpoint(eager=False)

    out = state.select("a", "b", F.col("s").alias("score"))
    out.count()
    e.unpersist()
    ind.unpersist()
    return out
