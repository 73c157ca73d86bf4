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


from halvesting_geometric_spark.operators.components import (
    connected_components,
)

__all__ = ["dbscan_embeddings", "knn_label_agreement"]


def _blocked_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_blocks: int = 16,
    extra: tuple[str, ...] = (),
    norm_dim: int | None = None,
) -> DataFrame:
    """All unordered id pairs ``a < b`` with both vectors, via a blocked
    equi-join cross product — NO BroadcastNestedLoopJoin.

    With ``norm_dim`` set, each side's L2 norm is precomputed BEFORE the
    join (n rows instead of n^2 pairs) and emitted as ``_nm1``/``_nm2``
    — both a real win (norms are 2/3 of the cosine arithmetic) and the
    thing that keeps the pairwise projection small enough for a single
    whole-stage-codegen method. ``dot/( _nm1 * _nm2 )`` replays the SQL
    twin's ``dot/(sqrt(naa)*sqrt(nbb))`` op for op.

    A theta-join on ``a < b`` plans as a BNLJ whose generated consume
    method also inlines every downstream projection; with an unrolled
    64-dim cosine that overflows the JVM method-size limit and Janino
    falls back to interpretation (correct but slow, and noisy in sweep
    logs). Instead: assign each row a block ``pmod(xxhash64(id), B)``,
    broadcast the B*(B+1)/2 table of block pairs ``i <= j``, and produce
    the cross product with two hash EQUI-joins (left on ``i``, right on
    ``j``). Each unordered cross-block pair appears exactly once (its
    blocks match exactly one ``(i, j)`` row); same-block pairs appear in
    both orders and are halved by ``a < b``. The blocking only shapes
    the plan — the output pair SET is independent of B and of the hash.

    Ids (and scalar ``extra`` payloads) come out canonically oriented
    (``a < b``); the VECTORS stay in join orientation (``_v1``/``_v2``
    belong to whichever side produced them). Downstream similarity is
    symmetric, so this doesn't matter — and it matters a lot for
    codegen: a CASE-WHEN-of-struct canonicalization would be re-inlined
    into every unrolled per-dimension term, regrowing the method past
    the JVM limit this function exists to avoid.

    O(n^2) work by construction — this is the exact validation path; the
    scale path is LSH candidates (see dbscan_embeddings ``pairs='lsh'``).
    """
    spark = emb.sparkSession
    bp = (
        spark.range(n_blocks * n_blocks)
        .select(
            (F.col("id") / n_blocks).cast("long").alias("_i"),
            F.pmod(F.col("id"), F.lit(n_blocks)).alias("_j"),
        )
        .filter(F.col("_i") <= F.col("_j"))
    )
    norm_fields = ()
    if norm_dim is not None:
        from halvesting_geometric_spark.functions import unrolled_dot

        if 1 <= norm_dim <= 128:
            sq = unrolled_dot(F.col(vec_col), F.col(vec_col), norm_dim)
        else:
            sq = F.aggregate(
                F.col(vec_col),
                F.lit(0.0),
                lambda acc, x: acc
                + x.cast("double") * x.cast("double"),
            )
        norm_fields = (F.sqrt(sq).alias("nm"),)
    pay = F.struct(
        F.col(id_col).alias("i"),
        F.col(vec_col).alias("v"),
        *norm_fields,
        *[F.col(c).alias(c) for c in extra],
    )
    left = emb.select(
        pay.alias("_pa"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_bi"),
    ).join(F.broadcast(bp), F.col("_bi") == F.col("_i"))
    right = emb.select(
        pay.alias("_pb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_bj"),
    )
    fwd = F.col("_pa.i") < F.col("_pb.i")
    return (
        left.join(right, F.col("_j") == F.col("_bj"))
        .filter((F.col("_i") < F.col("_j")) | fwd)
        .select(
            F.least("_pa.i", "_pb.i").alias("a"),
            F.greatest("_pa.i", "_pb.i").alias("b"),
            F.col("_pa.v").alias("_v1"),
            F.col("_pb.v").alias("_v2"),
            *(
                (
                    F.col("_pa.nm").alias("_nm1"),
                    F.col("_pb.nm").alias("_nm2"),
                )
                if norm_dim is not None
                else ()
            ),
            *[
                F.when(fwd, F.col(f"_pa.{c}"))
                .otherwise(F.col(f"_pb.{c}"))
                .alias(f"_a_{c}")
                for c in extra
            ],
            *[
                F.when(fwd, F.col(f"_pb.{c}"))
                .otherwise(F.col(f"_pa.{c}"))
                .alias(f"_b_{c}")
                for c in extra
            ],
        )
    )


def _pair_sim_e4(dim: int):
    """e4-rounded cosine over a _blocked_pairs(norm_dim=dim) row —
    pairwise dot only; norms were precomputed per side pre-join."""
    from halvesting_geometric_spark.functions import unrolled_dot

    if 1 <= dim <= 128:
        dot = unrolled_dot(F.col("_v1"), F.col("_v2"), dim)
    else:  # compact fold form past the unroll boundary (F9 convention)
        dot = F.aggregate(
            F.zip_with(
                F.col("_v1"),
                F.col("_v2"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    cos = F.when(
        (F.col("_nm1") == 0) | (F.col("_nm2") == 0), F.lit(0.0)
    ).otherwise(dot / (F.col("_nm1") * F.col("_nm2")))
    return F.floor(cos * 10000 + F.lit(0.5)).cast("long")


def _exact_pairs(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, eps_e4: int
) -> DataFrame:
    return (
        _blocked_pairs(emb, id_col, vec_col, norm_dim=dim)
        .select("a", "b", _pair_sim_e4(dim).alias("sim_e4"))
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

    # blocked equi-join cross product (no BNLJ — see _blocked_pairs);
    # cosine is symmetric, so compute it once per unordered pair and
    # symmetrize afterwards to recover both directed (a, b) orientations
    half = _blocked_pairs(
        emb, id_col, vec_col, extra=(label_col,), norm_dim=dim
    ).select(
        "a",
        F.col(f"_a_{label_col}").alias("_la"),
        "b",
        F.col(f"_b_{label_col}").alias("_lb"),
        _pair_sim_e4(dim).alias("sim_e4"),
    )
    pairs = half.unionByName(
        half.select(
            F.col("b").alias("a"),
            F.col("_lb").alias("_la"),
            F.col("a").alias("b"),
            F.col("_la").alias("_lb"),
            "sim_e4",
        )
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
