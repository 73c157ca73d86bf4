"""Bipartite projection: co-engagement / co-citation graphs (engine-new).

``bipartite_project`` folds a bipartite relation (left ↔ right, e.g. user ↔
conversation) onto its RIGHT side: an undirected weighted graph where two
right-nodes are linked iff they share a left-node, weight = the number of
distinct shared left-nodes. This is the standard construction for
co-engagement, co-citation, and co-occurrence graphs over interaction logs.

Scale shape: the wedge self-join keyed on the left-node — identical to the
capped wedge joins in linkpred (BENCH/BASELINE.md measured uncapped wedges
infeasible at 2M power-law edges, caps 64–1024 fine) — so hub LEFT nodes
above ``max_left_degree`` are dropped from wedge generation by default. For
projections that is also the semantically standard choice: a left-node
adjacent to everything carries no co-engagement signal and contributes
O(d²) pairs. Pass ``max_left_degree=None`` to opt into exact-but-quadratic.

Reference analog: none (the reference builds its heterogeneous graph but
never projects it); engine-new per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_project(
    rel: DataFrame,
    left_col: str,
    right_col: str,
    max_left_degree: int | None = 1024,
    min_weight: int = 1,
) -> DataFrame:
    """(a, b, weight, da, db) with a < b over right-nodes: weight = distinct
    shared left-nodes; da/db = the pair's right-node degrees (distinct
    left-neighbors, computed BEFORE the hub cap) so callers can normalize
    (Jaccard = weight / (da + db − weight)) without another pass.
    ``min_weight`` filters weak pairs after aggregation (map-side partials
    still apply); ``max_left_degree`` drops hub left-nodes from wedge
    generation only — degrees stay exact."""
    if min_weight < 1:
        raise ValueError(f"min_weight must be >= 1, got {min_weight}")
    r = (
        rel.select(F.col(left_col).alias("u"), F.col(right_col).alias("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rdeg = r.groupBy("v").agg(F.count("*").alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    kept = r
    if max_left_degree is not None:
        if max_left_degree < 1:
            raise ValueError(
                f"max_left_degree must be >= 1, got {max_left_degree}"
            )
        udeg = r.groupBy("u").agg(F.count("*").alias("ud"))
        kept = r.join(
            udeg.filter(F.col("ud") <= max_left_degree).select("u"), "u"
        )
    left = kept.select("u", F.col("v").alias("a"))
    right = kept.select("u", F.col("v").alias("b"))
    pairs = (
        left.join(right, "u")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
    )
    if min_weight > 1:
        pairs = pairs.filter(F.col("weight") >= min_weight)
    out = (
        pairs.join(
            rdeg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a"
        )
        .join(
            rdeg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b"
        )
        .select("a", "b", "weight", "da", "db")
        .localCheckpoint(eager=True)
    )
    r.unpersist()
    rdeg.unpersist()
    return out
