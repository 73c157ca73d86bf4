"""Exact 3/4-node graphlet census via closed-form counting (PGD-style).

Connected ≤4-vertex subgraph counts of the simple undirected graph, the
standard structural profile for comparing link graphs (Ahmed, Neville,
Rossi & Duffield, ICDM 2015 — "Efficient Graphlet Counting for Large
Networks"; public algorithmics, from-scratch implementation). Engine-new:
extends the reference's triangle analytics (SURVEY §2 J9) to the full
4-node census without enumerating anything beyond what the engine already
lists.

Everything reduces to degrees, per-VERTEX triangle counts t_v, per-EDGE
triangle counts sup_e, and the two already-implemented enumerators
(:func:`~halvesting_geometric_spark.operators.linkpred.four_cycles`,
:func:`~halvesting_geometric_spark.operators.triangles.four_clique_total`):

    wedges   = Σ_v C(d_v, 2)
    claws    = Σ_v C(d_v, 3)                      (3-stars)
    paths4   = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·T   (3-edge paths)
    tailed   = Σ_v t_v · (d_v − 2)                (triangle + pendant edge)
    diamonds = Σ_e C(sup_e, 2)                    (two triangles on an edge)

with T the triangle total. These are NON-induced subgraph counts; the
induced counts follow by the (upper-triangular, exactly invertible)
overlap system

    K4ᵢ       = K4
    diamondᵢ  = diamond − 6·K4ᵢ
    cycle4ᵢ   = cycle4 − diamondᵢ − 3·K4ᵢ
    tailedᵢ   = tailed − 4·diamondᵢ − 12·K4ᵢ
    paths4ᵢ   = paths4 − 2·tailedᵢ − 4·cycle4ᵢ − 6·diamondᵢ − 12·K4ᵢ
    clawᵢ     = claw − tailedᵢ − 2·diamondᵢ − 4·K4ᵢ

(each coefficient = how many copies of the sparser graphlet the denser one
contains on the same 4 vertices; pinned by the brute-force twin in
``tests/test_graphlets.py``).

Scale notes: the formula aggregates are one degree table, one triangle
listing reused three ways (total / explode-to-vertices / explode-to-edges),
and map-side-combinable sums — no pair state, no driver loops. Accumulators
run in decimal(38,0): at 10¹²-edge scale Σ d² alone overflows int64 and
Spark 4 ANSI mode makes that a job-killer, not a silent wrap. The only
super-linear pieces are the two reused enumerators, which carry their own
documented degree-orientation / ``max_degree`` bounds.

Deterministic and integer-exact → the correctness gate's DuckDB twin
replays every formula verbatim.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.graph import canonical_edges
from halvesting_geometric_spark.operators.linkpred import four_cycles
from halvesting_geometric_spark.operators.triangles import (
    four_clique_total,
    triangle_listing,
)

__all__ = ["graphlet_census"]

_DEC = "decimal(38,0)"


def graphlet_census(
    edges: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """One-row exact census of the simple undirected graph.

    Returns (wedges, claws, paths4, triangles, tailed_triangles, cycles4,
    diamonds, cliques4, ind_paths4, ind_claws, ind_cycles4,
    ind_tailed_triangles, ind_diamonds) — all long, non-induced then
    induced. ``max_degree`` is forwarded to the 4-cycle wedge join only
    (None = exact, the default; a cap makes cycles4/ind_* lower bounds on
    hub-heavy graphs, same contract as :func:`four_cycles`).
    """
    canon = canonical_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
    canon.count()
    deg = (
        canon.select(F.col("src").alias("v"))
        .unionByName(canon.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg.count()
    tri = triangle_listing(canon).persist(StorageLevel.MEMORY_AND_DISK)

    d = F.col("d").cast(_DEC)
    deg_sums = deg.agg(
        (F.sum(d * (F.col("d") - 1)) / 2).cast("long").alias("wedges"),
        (F.sum(d * (F.col("d") - 1) * (F.col("d") - 2)) / 6)
        .cast("long")
        .alias("claws"),
    )

    tri_total = tri.agg(F.count("*").cast("long").alias("triangles"))

    path_raw = (
        canon.join(deg.select(F.col("v").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("dv")), "dst")
        .agg(
            F.sum(
                (F.col("du").cast(_DEC) - 1) * (F.col("dv") - 1)
            )
            .cast("long")
            .alias("path_raw")
        )
    )

    tv = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("t"))
    )
    tailed = tv.join(deg, "v").agg(
        F.sum(F.col("t").cast(_DEC) * (F.col("d") - 2))
        .cast("long")
        .alias("tailed_triangles")
    )

    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("u"),
                    F.greatest("a", "b").alias("w"),
                ),
                F.struct(
                    F.least("a", "c").alias("u"),
                    F.greatest("a", "c").alias("w"),
                ),
                F.struct(
                    F.least("b", "c").alias("u"),
                    F.greatest("b", "c").alias("w"),
                ),
            )
        ).alias("e")
    )
    diamonds = (
        tri_edges.groupBy("e")
        .agg(F.count("*").alias("sup"))
        .agg(
            (F.sum(F.col("sup").cast(_DEC) * (F.col("sup") - 1)) / 2)
            .cast("long")
            .alias("diamonds")
        )
    )

    c4 = four_cycles(canon, max_degree=max_degree).select(
        F.col("n_four_cycles").alias("cycles4")
    )
    k4 = four_clique_total(canon).select(
        F.col("four_cliques").alias("cliques4")
    )

    row = (
        deg_sums.crossJoin(tri_total)
        .crossJoin(path_raw)
        .crossJoin(tailed)
        .crossJoin(diamonds)
        .crossJoin(c4)
        .crossJoin(k4)
    )
    zero = F.lit(0).cast("long")
    row = row.select(
        F.coalesce("wedges", zero).alias("wedges"),
        F.coalesce("claws", zero).alias("claws"),
        (
            F.coalesce("path_raw", zero)
            - 3 * F.coalesce("triangles", zero)
        ).alias("paths4"),
        F.coalesce("triangles", zero).alias("triangles"),
        F.coalesce("tailed_triangles", zero).alias("tailed_triangles"),
        F.coalesce("cycles4", zero).alias("cycles4"),
        F.coalesce("diamonds", zero).alias("diamonds"),
        F.coalesce("cliques4", zero).alias("cliques4"),
    )
    ind_dia = F.col("diamonds") - 6 * F.col("cliques4")
    ind_c4 = F.col("cycles4") - ind_dia - 3 * F.col("cliques4")
    ind_tail = (
        F.col("tailed_triangles") - 4 * ind_dia - 12 * F.col("cliques4")
    )
    ind_p4 = (
        F.col("paths4")
        - 2 * ind_tail
        - 4 * ind_c4
        - 6 * ind_dia
        - 12 * F.col("cliques4")
    )
    ind_claw = (
        F.col("claws") - ind_tail - 2 * ind_dia - 4 * F.col("cliques4")
    )
    out = row.select(
        "*",
        ind_p4.alias("ind_paths4"),
        ind_claw.alias("ind_claws"),
        ind_c4.alias("ind_cycles4"),
        ind_tail.alias("ind_tailed_triangles"),
        ind_dia.alias("ind_diamonds"),
    )
    out = out.localCheckpoint(eager=True)
    canon.unpersist()
    deg.unpersist()
    tri.unpersist()
    return out
