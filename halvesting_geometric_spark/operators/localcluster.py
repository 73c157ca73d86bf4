"""Local graph clustering: PPR-Nibble sweep cut (Andersen-Chung-Lang,
FOCS 2006 semantics — public algorithm).

Given a seed set, rank vertices by degree-normalized personalized-PageRank
mass and sweep prefixes of that order, reporting each prefix's conductance;
the best prefix is the seed's local community. The expensive part is the PPR
itself (the existing superstep driver); the sweep adds one pass over the
canonical edge set with two BROADCAST joins against the k-row prefix table —
no shuffle grows with k, so the operator's scale shape is exactly PPR's.

Reference scope note: the reference has no local-clustering stage; this
extends the engine's community toolbox (label propagation, Louvain,
conductance) with the standard seed-local method those global methods lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.centrality import (
    personalized_pagerank,
)
from halvesting_geometric_spark.operators.graph import canonical_edges

# sentinel sweep position for vertices outside the top-k prefix table —
# larger than any permitted k, so LEAST/GREATEST classify edges correctly
_OUT = 2_000_000_000


def ppr_sweep(
    edges: DataFrame,
    vertices: DataFrame,
    seeds: DataFrame | list[int],
    damping: float = 0.85,
    fixed_iters: int = 5,
    k: int = 32,
) -> DataFrame:
    """Sweep-cut profile of the PPR-Nibble order around ``seeds``.

    Returns one row per prefix size ``pos`` = 1..k:
    ``(pos, vertex_id, score, vol, cut, phi_e6)`` where ``vertex_id`` is the
    vertex admitted at that position, ``score`` the degree-normalized
    e12 PPR mass it was ranked by, ``vol`` the prefix's degree volume on the
    canonical simple graph, ``cut`` the edges leaving the prefix, and
    ``phi_e6`` the conductance cut/min(vol, 2m-vol) as round-half-up e6
    fixed point (0 when the denominator is 0). ``argmin phi_e6`` is the
    Nibble community; returning the whole profile keeps the operator
    composable (and fully oracle-checkable).

    Determinism: the sweep order is by INTEGER score
    ``floor(rank_e6 * 1e6 / degree)`` (ties: vertex_id) — the same e6
    quantization the PPR gate hash-matches — so engine and oracle order
    identically; every downstream quantity is exact integer arithmetic
    except the final e6 division.

    Scale shape: PPR supersteps dominate; then one canonical-edge pass with
    two broadcast joins against the k-row prefix (k is bounded: ≤4096
    enforced — the prefix table must broadcast), two ≤k-row aggregates, and
    ≤k-row windows. Zero-degree vertices cannot enter the sweep (their
    conductance is undefined); rank mass they hold is simply never admitted.
    """
    if not 1 <= k <= 4096:
        raise ValueError(f"k must be in [1, 4096] (broadcast prefix), got {k}")
    pr = personalized_pagerank(
        edges, vertices, seeds, damping=damping, fixed_iters=fixed_iters
    )
    rq = pr.select(
        "vertex_id",
        F.floor(F.col("rank") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("rank_e6"),
    ).filter(F.col("rank_e6") > 0)
    canon = canonical_edges(edges).persist()
    deg = (
        canon.select(F.col("src").alias("vertex_id"))
        .unionByName(canon.select(F.col("dst").alias("vertex_id")))
        .groupBy("vertex_id")
        .agg(F.count("*").cast("long").alias("d"))
    )
    scored = rq.join(deg, "vertex_id").select(
        "vertex_id",
        "d",
        F.floor(F.col("rank_e6") * F.lit(1_000_000) / F.col("d"))
        .cast("long")
        .alias("score"),
    )
    topk = scored.orderBy(
        F.col("score").desc(), F.col("vertex_id").asc()
    ).limit(k)
    # k-row table: the single-partition window is bounded by the k guard
    w = Window.orderBy(F.col("score").desc(), F.col("vertex_id").asc())
    prefix = topk.select(
        "vertex_id", "d", "score", F.row_number().over(w).alias("pos")
    ).localCheckpoint(eager=True)

    pa = prefix.select(F.col("vertex_id").alias("src"), F.col("pos").alias("pa"))
    pb = prefix.select(F.col("vertex_id").alias("dst"), F.col("pos").alias("pb"))
    epos = (
        canon.join(F.broadcast(pa), "src", "left")
        .join(F.broadcast(pb), "dst", "left")
        .select(
            F.least(
                F.coalesce("pa", F.lit(_OUT)), F.coalesce("pb", F.lit(_OUT))
            ).alias("mn"),
            F.greatest(
                F.coalesce("pa", F.lit(_OUT)), F.coalesce("pb", F.lit(_OUT))
            ).alias("mx"),
        )
    )
    cmin = (
        epos.filter(F.col("mn") <= k)
        .groupBy(F.col("mn").alias("pos"))
        .agg(F.count("*").alias("c_in"))
    )
    cmax = (
        epos.filter(F.col("mx") <= k)
        .groupBy(F.col("mx").alias("pos"))
        .agg(F.count("*").alias("c_done"))
    )
    m = canon.count()
    canon.unpersist()
    wk = Window.orderBy("pos")
    res = (
        prefix.join(F.broadcast(cmin), "pos", "left")
        .join(F.broadcast(cmax), "pos", "left")
        .select(
            "pos",
            "vertex_id",
            "score",
            F.sum("d").over(wk).cast("long").alias("vol"),
            (
                F.sum(F.coalesce("c_in", F.lit(0))).over(wk)
                - F.sum(F.coalesce("c_done", F.lit(0))).over(wk)
            )
            .cast("long")
            .alias("cut"),
        )
    )
    den = F.least(F.col("vol"), F.lit(2 * m) - F.col("vol"))
    phi = (
        F.when(
            den > 0,
            F.floor(F.col("cut") * 1_000_000.0 / den + F.lit(0.5)),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return res.select("pos", "vertex_id", "score", "vol", "cut", phi.alias("phi_e6"))
