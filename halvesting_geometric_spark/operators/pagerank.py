"""PageRank as a skew-aware, checkpointed gather-scatter superstep loop.

Substrate parity with the reference: each superstep has exactly the shape of
one SAGE message-passing layer — gather = embedding lookup join
(``/root/reference/halvesting_geometric/modules/link_classifier.py:33-34``),
scatter = per-destination aggregate (``.../modules/sage.py:53-54,78-82``) — but
re-expressed as DataFrame joins + hash aggregates that Catalyst/AQE plan, with
explicit skew handling (salting / Arrow bincount partials / hot-vertex
broadcast) and per-iteration Iceberg/parquet checkpoints so any iteration is
resumable (north_rule).

Semantics: classic damped PageRank with dangling-mass redistribution —

    rank'(v) = (1-d)/n + d * ( Σ_{u→v} rank(u)/outdeg(u) + dangling_mass/n )

so Σ rank = 1 at every iteration. Convergence: L1 delta < tol (1e-6 per
BASELINE.json north_star).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.skew import partial_sum_arrow, salted_sum
from halvesting_geometric_spark.plans.checkpoint import CheckpointManager


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex_id, rank)
    iterations: int
    converged: bool
    num_vertices: int
    num_edges: int
    metrics: list[dict] = field(default_factory=list)


def _scatter(msgs: DataFrame, agg_mode: str, n_salts: int) -> DataFrame:
    """groupBy(dst).sum(contrib) under the selected skew strategy."""
    if agg_mode == "groupby":
        return msgs.groupBy("dst").agg(F.sum("contrib").alias("msg_sum"))
    if agg_mode == "salted":
        return salted_sum(
            msgs, key="dst", value="contrib", n_salts=n_salts, salt_from="src",
            out="msg_sum",
        )
    if agg_mode == "arrow":
        return partial_sum_arrow(msgs, key="dst", value="contrib", out="msg_sum")
    raise ValueError(f"unknown agg_mode {agg_mode!r}")


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    agg_mode: str = "groupby",
    n_salts: int = 16,
    hot_src_threshold: int | None = None,
    broadcast_state_threshold: int = 0,
    checkpoint: CheckpointManager | None = None,
    checkpoint_interval: int = 1,
    resume: bool = False,
    weight_col: str | None = None,
    initial_ranks: DataFrame | None = None,
    delta_check_every: int = 1,
) -> PageRankResult:
    """Run PageRank to ``tol`` convergence (or exactly ``fixed_iters`` steps).

    ``initial_ranks``: optional (vertex_id, rank) warm start — e.g. the
    converged ranks of a slightly older graph snapshot; the vector is
    L1-normalized over the CURRENT vertex set (missing vertices start at 0,
    disappeared vertices' mass rescales away), so convergence semantics are
    unchanged and re-convergence after a small graph delta takes far fewer
    supersteps than a cold start. Ignored when ``resume`` finds a checkpoint.

    ``weight_col``: optional edge-weight column (non-negative, finite) —
    contributions become rank(u)·w(u,v)/W(u) with W(u) = Σ out-weights; a
    vertex whose out-weights sum to zero is dangling. The per-vertex divide
    (rank/W) still happens once per vertex; only the w(u,v) multiply is
    per-edge.

    ``vertices``: DataFrame with a ``vertex_id`` column; defaults to the
    vertex set induced by ``edges`` (but pass the real vertex table so
    isolated vertices get rank mass). Precondition: ``vertices`` must be a
    superset of all edge endpoints — contributions to a dst missing from
    ``vertices`` are silently dropped and total rank mass leaks below 1
    (``build_vertices`` guarantees the superset).

    ``hot_src_threshold``: out-degree above which a source vertex's rank is
    *broadcast* to its (many) edge rows instead of shuffled — the hot-vertex
    broadcast path of the north_star. The edge table is split once
    (loop-invariant) into hot/cold blocks; per iteration the hot block joins a
    broadcast of the few hot ranks while the cold block takes the normal
    shuffle join.

    ``delta_check_every``: supersteps batched into ONE Spark job (1-8). The
    per-job driver floor (scheduling + AQE replanning, measured ~0.5s at
    bench scale) is paid once per batch instead of once per iteration.
    Intermediate steps keep exact semantics by computing the dangling mass
    as an in-plan 1-row broadcast aggregate instead of the carried driver
    scalar; the scatter shuffles shared by a step's two consumers dedupe
    via ReusedExchange inside the job. The L1 delta is observed only on the
    batch's LAST step, so tol-convergence can overshoot by up to k−1
    supersteps (all counted in ``iterations``); final ranks are the same
    fixpoint. Forced to 1 when a checkpoint manager is attached (per-
    iteration durability is the point of checkpointing).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
    if fixed_iters is not None and fixed_iters < 0:
        raise ValueError(f"fixed_iters must be >= 0, got {fixed_iters}")
    if not 1 <= delta_check_every <= 8:
        raise ValueError(
            f"delta_check_every must be in [1, 8], got {delta_check_every}"
        )
    spark = edges.sparkSession
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vertex_id"))
            .unionByName(edges.select(F.col("dst").alias("vertex_id")))
            .distinct()
        )
    weighted = weight_col is not None
    if weighted:
        out_deg = edges.groupBy("src").agg(
            F.sum(F.col(weight_col).cast("double")).alias("out_deg")
        )
    else:
        out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Loop-invariant vertex table carries the out-degree (or out-weight sum).
    # The rank state then rides (vertex_id, rank, out_deg), so each superstep
    # divides rank/out_deg ONCE PER VERTEX (not once per edge), tests dangling
    # as out_deg == 0, and the cached edge table is pure (src, dst) topology
    # (plus the weight column when weighted) — minimum bytes through the
    # cache and the gather join.
    vertices = (
        vertices.select("vertex_id")
        .join(
            out_deg.select(F.col("src").alias("vertex_id"), "out_deg"),
            "vertex_id",
            "left",
        )
        .select(
            "vertex_id",
            F.coalesce("out_deg", F.lit(0))
            .cast("double" if weighted else "long")
            .alias("out_deg"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vstats = vertices.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("out_deg") == 0, 1).otherwise(0)).alias("n_dangling"),
        F.min("vertex_id").alias("vmin"),
        F.max("vertex_id").alias("vmax"),
    ).first()
    n, n_dangling = int(vstats["n"]), int(vstats["n_dangling"])
    # id compaction: when every vertex id fits int32 (always true for the
    # dense-id pipeline below ~2B vertices), carry ids as int through the
    # cached edge table, the gather join and the scatter shuffle — half the
    # bytes on the superstep's hottest data paths. Ids are keys only; the
    # returned ranks are cast back to long so the API schema is unchanged.
    _vid_type = dict(vertices.dtypes)["vertex_id"]
    compact = (
        _vid_type in ("bigint", "int", "smallint", "tinyint")
        and vstats["vmin"] is not None
        and -(2**31) <= int(vstats["vmin"])
        and int(vstats["vmax"]) < 2**31
    )
    idt = "int" if compact else "long"
    if compact:
        vertices2 = vertices.select(
            F.col("vertex_id").cast("int").alias("vertex_id"), "out_deg"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        vertices.unpersist()
        vertices = vertices2
    # loop-invariant edge table, hash-partitioned on the gather key once: when
    # the shuffle-join path is taken (big vertex state), each iteration only
    # shuffles the small rank table — the cached edge partitioning is reused
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    _ecols = (
        [
            F.col("src").cast(idt).alias("src"),
            F.col("dst").cast(idt).alias("dst"),
        ]
        if compact
        else [F.col("src"), F.col("dst")]
    )
    if weighted:
        _ecols.append(F.col(weight_col).cast("double").alias("_w"))
    contrib_edges = (
        edges.select(*_ecols)
        .repartition(n_shuffle, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = contrib_edges.count()  # materialize the loop-invariant once

    hot_edges = cold_edges = None
    hot_src: set[int] | None = None
    if hot_src_threshold is not None:
        # the hot set becomes a literal isin() predicate and a per-superstep
        # broadcast — cap it so a mis-set threshold can't build a huge plan;
        # the truncated tail still has the highest degrees below the cap
        max_hot = 4096
        hot_rows = (
            out_deg.filter(F.col("out_deg") >= hot_src_threshold)
            .orderBy(F.col("out_deg").desc(), F.col("src").asc())
            .limit(max_hot + 1)
            .collect()
        )
        if len(hot_rows) > max_hot:
            import logging

            logging.getLogger(__name__).warning(
                "pagerank: hot_src_threshold=%s selects >%d vertices; "
                "keeping only the %d hottest (raise the threshold)",
                hot_src_threshold, max_hot, max_hot,
            )
            hot_rows = hot_rows[:max_hot]
        hot_src = {r["src"] for r in hot_rows}
        hot_edges = contrib_edges.filter(
            F.col("src").isin(list(hot_src) or [-1])
        ).persist(StorageLevel.MEMORY_AND_DISK)
        cold_edges = contrib_edges.filter(
            ~F.col("src").isin(list(hot_src) or [-1])
        ).persist(StorageLevel.MEMORY_AND_DISK)
        hot_edges.count(), cold_edges.count()

    start_iter = 0
    if resume and checkpoint is not None and checkpoint.latest_iteration() is not None:
        start_iter = checkpoint.latest_iteration() + 1
        # saved state is (vertex_id, rank); re-attach the loop-invariant
        # out_deg from the cached vertex table
        ranks = checkpoint.load_state(start_iter - 1).join(vertices, "vertex_id")
        dangling = float(
            ranks.filter(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
    elif initial_ranks is not None:
        base0 = vertices.join(
            initial_ranks.select(
                F.col("vertex_id").cast(idt).alias("vertex_id"),
                F.col("rank").cast("double").alias("_r0"),
            ),
            "vertex_id",
            "left",
        ).select(
            "vertex_id", F.coalesce("_r0", F.lit(0.0)).alias("_r0"), "out_deg"
        )
        st0 = base0.agg(
            F.sum("_r0").alias("total"),
            F.sum(
                F.when(F.col("out_deg") == 0, F.col("_r0")).otherwise(F.lit(0.0))
            ).alias("dang"),
        ).first()
        total = float(st0["total"] or 0.0)
        if total <= 0.0:
            ranks = vertices.select(
                "vertex_id",
                (F.lit(1.0) / F.lit(float(n))).alias("rank"),
                "out_deg",
            )
            dangling = n_dangling / float(n)
        else:
            ranks = base0.select(
                "vertex_id", (F.col("_r0") / total).alias("rank"), "out_deg"
            ).localCheckpoint(eager=False)
            dangling = float(st0["dang"] or 0.0) / total
    else:
        # a lazy projection of the cached vertex table — no extra job/cache
        ranks = vertices.select(
            "vertex_id", (F.lit(1.0) / F.lit(float(n))).alias("rank"), "out_deg"
        )
        dangling = n_dangling / float(n)

    # Vertex-state join strategy. The default is the shuffle-hash path at
    # EVERY scale (threshold 0): the cached edge table is pre-partitioned on
    # the gather key, so a shuffle join moves only the V-row state, while a
    # broadcast build serializes V rows through the driver once per
    # superstep — measured SLOWER at both bench scales (sf0.1: 9.9 vs 8.2 s
    # to 1e-6; sf1.0: 29.2 vs 16.4 s) and it caps multi-executor scaling
    # (the round-5 _b() note). A positive threshold re-enables per-superstep
    # state broadcast for callers that want it (e.g. few-iteration runs on
    # broadcast-friendly clusters).
    bcast_state = 0 < n <= broadcast_state_threshold

    def _b(df: DataFrame) -> DataFrame:
        # Above the threshold the hint matters as much as the absence of
        # broadcast: without it AQE auto-broadcasts any state table under
        # spark.sql.autoBroadcastJoinThreshold, and the per-superstep
        # driver-side hashmap build is serial — it caps scaling. shuffle_hash
        # keeps the state side a parallel shuffled build against the cached,
        # pre-partitioned edge table (no sort, no edge re-shuffle).
        return F.broadcast(df) if bcast_state else df.hint("shuffle_hash")

    def _advance(state_df: DataFrame, dang_scalar: float | None):
        """One lazy superstep over ``state_df`` (vertex_id, rank, out_deg).

        Returns (joined, rank_expr): ``joined`` pairs the previous state
        with the scatter sums (old_rank and out_deg ride along) and
        ``rank_expr`` computes the new rank over it. ``dang_scalar`` is the
        carried driver value for the batch's first step; None switches the
        dangling mass to an in-plan 1-row broadcast aggregate of
        ``state_df`` so intermediate steps stay inside one job with exact
        semantics.
        """
        # per-VERTEX divide: each edge row then just carries the precomputed
        # contribution through the gather join (no per-edge arithmetic)
        rank_w = state_df.filter(F.col("out_deg") > 0).select(
            F.col("vertex_id").alias("src"),
            (F.col("rank") / F.col("out_deg")).alias("contrib"),
        )
        # weighted: the per-edge multiply happens here in the gather select;
        # the divide stayed per-vertex above
        _c = (
            (F.col("contrib") * F.col("_w")).alias("contrib")
            if weighted
            else F.col("contrib")
        )
        # salted scatter derives its salt from src; other modes don't need it
        mcols = (
            [F.col("src"), F.col("dst"), _c]
            if agg_mode == "salted"
            else [F.col("dst"), _c]
        )
        if hot_src is not None and hot_edges is not None:
            hot_w = rank_w.filter(F.col("src").isin(list(hot_src) or [-1]))
            msgs = (
                cold_edges.join(_b(rank_w), "src")
                .select(*mcols)
                .unionByName(
                    hot_edges.join(F.broadcast(hot_w), "src").select(*mcols)
                )
            )
        else:
            msgs = contrib_edges.join(_b(rank_w), "src").select(*mcols)
        sums = _scatter(msgs, agg_mode, n_salts)
        joined = state_df.select(
            "vertex_id", F.col("rank").alias("old_rank"), "out_deg"
        ).join(
            _b(sums.select(F.col("dst").alias("vertex_id"), "msg_sum")),
            "vertex_id",
            "left",
        )
        if dang_scalar is not None:
            base = F.lit((1.0 - damping) / n + damping * dang_scalar / n)
        else:
            dang_df = state_df.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(
                            F.lit(0.0)
                        )
                    ),
                    F.lit(0.0),
                ).alias("_dang")
            )
            joined = joined.crossJoin(F.broadcast(dang_df))
            base = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("_dang") / F.lit(float(n))
            )
        rank_expr = (
            base + F.lit(damping) * F.coalesce(F.col("msg_sum"), F.lit(0.0))
        ).alias("rank")
        return joined, rank_expr

    target = fixed_iters if fixed_iters is not None else max_iter
    batch = delta_check_every if checkpoint is None else 1
    converged = False
    all_metrics: list[dict] = []
    prev_paired: DataFrame | None = None
    it = start_iter
    while it < target:
        t0 = time.monotonic()
        k_eff = min(batch, target - it)
        # ONE Spark job per BATCH of supersteps: intermediate steps chain
        # lazily (dangling via in-plan aggregates, shared scatter shuffles
        # deduped by ReusedExchange); the final step's pair table is cached,
        # and one aggregate over it yields the convergence delta (L1/L∞ of
        # the LAST step) AND the next batch's dangling mass. The first
        # step's dangling mass is the driver scalar carried from the
        # previous aggregate (analytically Σ rank = 1 every iteration; fp
        # drift O(1e-16·iters) ≪ tol).
        state_df = ranks
        for j in range(k_eff - 1):
            joined_j, expr_j = _advance(state_df, dangling if j == 0 else None)
            # lazy localCheckpoint: the three consumers of each intermediate
            # state (gather, dangling aggregate, next pairing) share ONE RDD
            # materialized inside the batch job — without it the plan tree
            # grows 3^k and the batch runs each step's join up to 3× (k=6
            # measured 3.5× SLOWER than k=1; with RDD sharing it scales)
            state_df = joined_j.select(
                "vertex_id", expr_j, "out_deg"
            ).localCheckpoint(eager=False)
        paired, rank_expr = _advance(
            state_df, dangling if k_eff == 1 else None
        )
        paired = paired.persist(StorageLevel.MEMORY_AND_DISK)
        _d = F.abs(rank_expr.cast("double") - F.col("old_rank"))
        agg = paired.agg(
            F.sum(_d).alias("l1"),
            F.max(_d).alias("linf"),
            F.sum(
                F.when(F.col("out_deg") == 0, rank_expr).otherwise(F.lit(0.0))
            ).alias("next_dangling"),
        ).first()
        delta_l1 = float(agg["l1"])
        delta_linf = float(agg["linf"])
        dangling = float(agg["next_dangling"] or 0.0)
        state = paired.select("vertex_id", rank_expr, "out_deg")
        it += k_eff
        # superstep wall excludes the (optional) checkpoint write below, and
        # the saved metrics row carries it — same contract as round 1
        wall = time.monotonic() - t0
        row = {
            "iteration": it - 1,
            "batched_steps": k_eff,
            "delta_l1": delta_l1,
            "delta_linf": delta_linf,
            "wall_sec": wall,
        }

        if checkpoint is not None and (
            (it - 1) % checkpoint_interval == 0 or it == target
        ):
            ranks = checkpoint.save_state(
                it - 1,
                state.select("vertex_id", "rank"),
                metrics=row,
            ).join(vertices, "vertex_id")  # re-attach loop-invariant out_deg
            if prev_paired is not None:
                prev_paired.unpersist()
            paired.unpersist()
            prev_paired = None
        else:
            # Lineage MUST truncate every iteration (the state is referenced
            # twice per superstep, so an un-truncated logical plan doubles per
            # iteration). The LAZY localCheckpoint truncates the plan with NO
            # extra job: it materializes inside the next iteration's single
            # job as a cheap map over this iteration's cached pair table. That
            # cache must outlive the materialization, so unpersist the
            # PREVIOUS pair table (just consumed by this aggregate) instead.
            ranks = state.localCheckpoint(eager=False)
            if prev_paired is not None:
                prev_paired.unpersist()
            prev_paired = paired
        all_metrics.append(row)

        if fixed_iters is None and delta_l1 < tol:
            converged = True
            break
    else:  # while exhausted without tol-break: it == target already
        converged = fixed_iters is not None

    # materialize the (possibly lazy-checkpointed) final state BEFORE
    # dropping the caches it reads from — one job total, not one per superstep.
    # Compacted int ids are widened back so the API schema is input-stable.
    out_id = (
        F.col("vertex_id").cast("long").alias("vertex_id")
        if compact and _vid_type == "bigint"
        else F.col("vertex_id")
    )
    ranks = ranks.select(out_id, "rank")
    ranks.count()
    if prev_paired is not None:
        prev_paired.unpersist()
    contrib_edges.unpersist()
    vertices.unpersist()
    return PageRankResult(
        ranks=ranks,
        iterations=it,
        converged=converged,
        num_vertices=n,
        num_edges=m,
        metrics=all_metrics,
    )
