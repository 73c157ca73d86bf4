"""Structural-hole analysis (Burt 1992): per-vertex network constraint and
effective size over the simple undirected graph.

Engine-new (the reference computes no ego-network measures; its graph layer
stops at degrees/splits — ``utils/data/link_prediction_datamodule.py``), but
it is the classic social-capital companion to the centrality family already
in this package: LOW constraint marks brokers spanning structural holes,
effective size is the non-redundant slice of the ego network.

Definitions (unweighted, undirected; Burt's p_ij = 1/deg(i)):

    c_ij        = (p_ij + SUM_q p_iq * p_qj)^2   over common neighbors q
    constraint  = SUM_{j in N(i)} c_ij
    eff. size   = deg(i) - 2 * t_i / deg(i)      (Borgatti's simplification;
                  t_i = edges among i's neighbors = triangles through i)

All arithmetic is exact fixed-point integer so the DuckDB gate is
bit-identical (see __spark_entry__ oracle patterns): each proximity term is
quantized to e12 by INTEGER division (10^12 div d_i, 10^12 div (d_i*d_q)),
summed exactly, re-scaled to e6 (div 10^6) before squaring so dyad squares
stay < 2^53, and summed per vertex — no float anywhere.

Scale shape: the wedge enumeration is the audited triangle/link-pred join —
symmetric adjacency self-joined on the wedge CENTER, centers capped at
``max_degree`` (default 1024, the measured-feasible setting from
BENCH/BASELINE.md) so a super-hub never owns a quadratic join group; with
the cap, dropped wedge terms make both the constraint and t_i lower bounds
(documented, opt into ``None`` for exact). One wedge shuffle on the center,
one pair groupBy, one broadcast-sized degree join, one per-vertex groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.linkpred import _undirected_with_deg

__all__ = ["structural_holes"]

_E12 = 1_000_000_000_000


def structural_holes(
    edges: DataFrame, max_degree: int | None = 1024
) -> DataFrame:
    """Per-vertex Burt constraint and effective size.

    Returns (vertex_id, degree, constraint_e12, effsize_e6) for every
    vertex with degree >= 1 in the simple undirected graph induced by
    ``edges`` (src, dst). ``constraint_e12`` is the e12 fixed point of
    Burt's aggregate constraint, ``effsize_e6`` the e6 fixed point of
    effective size; both exact integer arithmetic end-to-end.

    ``max_degree``: wedge centers q with deg(q) > cap are skipped (scale
    guard, see module docstring); ``None`` = exact.
    """
    # adjacency stays UNCAPPED: every dyad (i, j in N(i)) must keep its
    # direct term and every vertex its row — the cap applies to wedge
    # CENTERS only, below (a hub center is what makes the join quadratic)
    adj, deg = _undirected_with_deg(edges, None)
    # wedge (i, q, j): center q = shared `nbr`; i != j. q is adjacent to
    # both endpoints and (simple graph, no self loops) never equals either.
    centers = adj
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        centers = adj.filter(F.col("nbr_deg") <= max_degree)
    left = centers.select(
        F.col("nbr").alias("q"),
        F.col("v").alias("i"),
        F.col("nbr_deg").alias("dq"),
    )
    right = centers.select(F.col("nbr").alias("q"), F.col("v").alias("j"))
    wedges = left.join(right, "q").filter(F.col("i") != F.col("j"))
    # keep only j in N(i): dyadic constraint is defined over i's neighbors
    sym = adj.select(F.col("v").alias("i"), F.col("nbr").alias("j"))
    closed = wedges.join(sym, ["i", "j"], "left_semi")
    ind = (
        closed.join(
            F.broadcast(
                deg.select(F.col("v").alias("i"), F.col("deg").alias("di"))
            ),
            "i",
        )
        .select(
            "i",
            "j",
            F.expr(f"cast({_E12} div (di * dq) as long)").alias("term_e12"),
        )
        .groupBy("i", "j")
        .agg(
            F.sum("term_e12").alias("s_e12"),
            F.count("*").cast("long").alias("n_wedges"),
        )
    )
    dyads = (
        sym.join(
            F.broadcast(
                deg.select(F.col("v").alias("i"), F.col("deg").alias("di"))
            ),
            "i",
        )
        .join(ind, ["i", "j"], "left")
        .select(
            "i",
            "di",
            (
                (
                    F.expr(f"cast({_E12} div di as long)")
                    + F.coalesce(F.col("s_e12"), F.lit(0))
                )
                / F.lit(1)
            ).cast("long").alias("c_e12"),
            F.coalesce(F.col("n_wedges"), F.lit(0)).alias("nw"),
        )
        .select(
            "i",
            "di",
            F.expr("cast(c_e12 div 1000000 as long)").alias("c_e6"),
            "nw",
        )
    )
    out = (
        dyads.groupBy("i", "di")
        .agg(
            F.sum(F.col("c_e6") * F.col("c_e6")).cast("long").alias(
                "constraint_e12"
            ),
            F.sum("nw").cast("long").alias("tri2"),
        )
        .select(
            F.col("i").alias("vertex_id"),
            F.col("di").cast("long").alias("degree"),
            "constraint_e12",
            (
                F.col("di") * F.lit(1_000_000)
                - F.expr("cast((tri2 * 1000000) div di as long)")
            ).cast("long").alias("effsize_e6"),
        )
    )
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return out
