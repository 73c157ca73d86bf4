"""Density-based embedding clustering (DBSCAN as composed dataflow).

Engine-new: DBSCAN (Ester et al. 1996) re-expressed as a composition of
operators the engine already trusts — a cosine pair join for the eps-
neighborhood graph, the scalable small-star/large-star connected-
components driver (operators/components.py, the north rule's CC) for
cluster formation over core points, and one join for border assignment.
No sequential seed expansion: the classic DBSCAN result is exactly "CC
of the core-core eps-graph, plus borders attached to a core neighbor",
and CC is something this engine does at scale.

Determinism (the classic algorithm is seed-order-dependent for border
points): borders attach to the MINIMUM cluster id among their core
neighbors, and cluster ids are the minimum member id of the core
component — a total order, so the labeling is unique and SQL-replayable.
Similarity is the engine's e4-rounded cosine (knn_cosine convention:
both engines sum the same float arrays left-to-right, so the rounding
is bit-stable) with ``sim_e4 >= eps_e4`` defining neighborhood.

Scale: ``pairs='exact'`` is the validation path (all-pairs join —
correct for gate-scale and small candidate sets). ``pairs='lsh'`` routes
through similarity.embedding_near_dups' bucket-capped LSH candidates
(recall < 1 by construction — documented approximation, same contract
as every ANN path in the engine). Core detection is one count per id;
cluster formation inherits CC's per-round lineage truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import cosine_similarity
from halvesting_geometric_spark.operators.components import (
    connected_components,
)

__all__ = ["dbscan_embeddings", "knn_label_agreement"]


def _exact_pairs(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, eps_e4: int
) -> DataFrame:
    left = emb.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("_va")
    )
    right = emb.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("_vb")
    )
    sim = F.floor(
        cosine_similarity(F.col("_va"), F.col("_vb"), dim=dim) * 10000
        + F.lit(0.5)
    ).cast("long")
    return (
        left.join(right, F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim_e4"))
        .filter(F.col("sim_e4") >= eps_e4)
    )


def dbscan_embeddings(
    emb: DataFrame,
    dim: int,
    eps_e4: int = 9000,
    min_pts: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: str = "exact",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """DBSCAN over an embedding column, cosine-similarity neighborhoods.

    A point is CORE when its eps-neighborhood (cosine ``sim_e4 >=
    eps_e4``, the point itself included) holds at least ``min_pts``
    points. Clusters are connected components of the core-core
    neighborhood graph (id = min core member); BORDER points (non-core
    with a core neighbor) attach to the minimum cluster id among their
    core neighbors; everything else is NOISE.

    Returns ``(id_col, role, cluster)`` — role in {'core', 'border',
    'noise'}, cluster NULL for noise.
    """
    ids = emb.select(F.col(id_col).alias("_id"))
    if pairs == "exact":
        p = _exact_pairs(emb, id_col, vec_col, dim, eps_e4)
    elif pairs == "lsh":
        from halvesting_geometric_spark.operators.similarity import (
            embedding_near_dups,
        )

        p = embedding_near_dups(
            emb,
            dim=dim,
            threshold=eps_e4 / 10000.0,
            n_planes=n_planes,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        ).select(
            "a",
            "b",
            F.floor(F.col("cosine") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("sim_e4"),
        ).filter(F.col("sim_e4") >= eps_e4)
    else:
        raise ValueError(f"unknown pairs strategy {pairs!r}")
    p = p.localCheckpoint(eager=True)
    sym = p.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        p.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("_nbrs"))
    core = (
        ids.join(deg, ids["_id"] == deg["u"], "left")
        .select(
            "_id",
            (F.coalesce("_nbrs", F.lit(0)) + 1 >= min_pts).alias(
                "_core"
            ),
        )
        .localCheckpoint(eager=True)
    )
    core_ids = core.filter("_core").select(F.col("_id"))
    cc_edges = (
        sym.join(
            core.filter("_core").select(F.col("_id").alias("u")), "u"
        )
        .join(core.filter("_core").select(F.col("_id").alias("v")), "v")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    comp = connected_components(
        cc_edges, core_ids.select(F.col("_id").alias("vertex_id"))
    ).components
    core_lab = core.filter("_core").join(
        comp, core["_id"] == comp["vertex_id"]
    ).select(F.col("_id"), F.col("component").alias("_cl"))
    # border: min cluster among core neighbors
    border = (
        sym.join(
            core.filter(~F.col("_core")).select(
                F.col("_id").alias("u")
            ),
            "u",
        )
        .join(
            core_lab.select(
                F.col("_id").alias("v"), F.col("_cl")
            ),
            "v",
        )
        .groupBy("u")
        .agg(F.min("_cl").alias("_cl"))
        .select(F.col("u").alias("_id"), "_cl")
    )
    out = (
        core.join(core_lab.withColumnRenamed("_cl", "_cl_core"), "_id", "left")
        .join(border.withColumnRenamed("_cl", "_cl_border"), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_core"), F.lit("core"))
            .when(F.col("_cl_border").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.when(F.col("_core"), F.col("_cl_core"))
            .otherwise(F.col("_cl_border"))
            .cast("long")
            .alias("cluster"),
        )
    )
    return out


def knn_label_agreement(
    emb: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-item k-NN label agreement — the standard label-noise detector
    (Confident-Learning flavor): for each vector, the fraction of its k
    nearest cosine neighbors that share its label. Items whose
    neighborhood disagrees are mislabeling / boundary candidates.

    Ranking uses the engine's e4-rounded cosine with neighbor-id
    tie-break (knn_cosine convention — bit-stable cross-engine), so the
    neighbor set is deterministic. Exact all-pairs at validation scale;
    at corpus scale feed the candidate pairs from the LSH/IVF paths and
    rank within candidates (same contract as every ANN consumer).

    Returns ``(id_col, label, k_eff, agree_e6)`` — ``k_eff < k`` only
    when the corpus has fewer than ``k`` other items.
    """
    from pyspark.sql import Window

    left = emb.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("_va"),
        F.col(label_col).alias("_la"),
    )
    right = emb.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("_vb"),
        F.col(label_col).alias("_lb"),
    )
    sim = F.floor(
        cosine_similarity(F.col("_va"), F.col("_vb"), dim=dim) * 10000
        + F.lit(0.5)
    ).cast("long")
    pairs = left.join(right, F.col("a") != F.col("b")).select(
        "a", "_la", "b", "_lb", sim.alias("sim_e4")
    )
    w = Window.partitionBy("a").orderBy(
        F.col("sim_e4").desc(), F.col("b").asc()
    )
    top = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = top.groupBy(F.col("a").alias(id_col), F.col("_la")).agg(
        F.count("*").cast("long").alias("k_eff"),
        F.sum(
            F.when(F.col("_lb") == F.col("_la"), 1).otherwise(0)
        )
        .cast("long")
        .alias("_agree"),
    )
    return agg.select(
        id_col,
        F.col("_la").alias(label_col),
        "k_eff",
        F.floor(
            F.col("_agree").cast("double")
            * 1_000_000
            / F.col("k_eff").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("agree_e6"),
    )
