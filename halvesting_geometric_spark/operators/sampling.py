"""Deterministic edge splitting, negative sampling, neighbor sampling.

Reference analog: ``RandomLinkSplit`` + ``LinkNeighborLoader``
(``/root/reference/halvesting_geometric/utils/data/link_prediction_datamodule.py:127-134,150-161``;
split ratios ``configs/train_sage_config.yml:2-4``, fanout
``experiments/tune_link_prediction.py:30``). The reference uses torch RNG
state; here every random choice is a pure function of ``(seed, edge)`` via a
64-bit hash — reproducible across partitionings, cluster sizes, and reruns
(SURVEY.md §2.10 R1/R2).

``hash_method`` on every operator selects the hash family:

- ``"xxhash64"`` (default): Spark-native, fastest — the 100TB path.
- ``"portable"``: md5-derived 60-bit hash bit-identical in ANSI SQL engines
  (see functions.portable_hash64) — the externally-verifiable path used by the
  correctness gate. Same algorithms either way.

Scale notes: nothing here materializes per-vertex adjacency or funnels through
a single-partition global sort — neighbor sampling is a windowed row_number
(sort-based, spillable, no array buffers even for 10^8-degree hubs), and the
exact quota cut in ``negative_edges`` is a two-phase bucket count + one-bucket
window (``take_smallest_exact``), not a global ORDER BY ... LIMIT.
"""

from __future__ import annotations

import logging

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import portable_hash64

log = logging.getLogger(__name__)


def hash64(method: str, *cols: Column | str, seed: int = 0) -> Column:
    """The operator-selectable 64-bit hash (see module docstring)."""
    if method == "xxhash64":
        return F.xxhash64(*cols, F.lit(seed))
    if method == "portable":
        return portable_hash64(*cols, seed=seed)
    raise ValueError(f"unknown hash_method {method!r}")


def take_smallest_exact(
    df: DataFrame,
    n: int,
    hash_col: str = "_h",
    tie_cols: tuple[str, ...] = (),
    n_bucket_bits: int = 10,
) -> DataFrame:
    """Exactly the ``n`` smallest rows by ``(hash_col, *tie_cols)`` — without
    a single-partition global sort.

    Phase 1 buckets rows by the hash's high bits (monotone in the hash value,
    signed-shift safe) and counts per bucket (≤ 2^n_bucket_bits longs to the
    driver). Phase 2 takes every row in buckets strictly below the cutoff and
    row_numbers ONLY the cutoff bucket (one partition holding ~n/2^bits rows).
    A LIMIT of billions never funnels through one task.
    """
    if n <= 0:
        return df.limit(0)
    shift = 64 - n_bucket_bits
    bucketed = df.withColumn("_bkt", F.shiftright(F.col(hash_col), shift))
    counts = sorted(
        (r["_bkt"], r["cnt"])
        for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    )
    cum = 0
    cutoff_bucket = None
    take_in_cutoff = 0
    taken_whole: list[int] = []
    for bkt, cnt in counts:
        if cum + cnt <= n:
            taken_whole.append(bkt)
            cum += cnt
            if cum == n:
                break
        else:
            cutoff_bucket = bkt
            take_in_cutoff = n - cum
            break
    whole = bucketed.filter(F.col("_bkt").isin(taken_whole or [-(1 << 62)]))
    if cutoff_bucket is None:
        return whole.drop("_bkt")
    w = Window.partitionBy("_bkt").orderBy(
        F.col(hash_col).asc(), *[F.col(c).asc() for c in tie_cols]
    )
    edge = (
        bucketed.filter(F.col("_bkt") == cutoff_bucket)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= take_in_cutoff)
        .drop("_rn")
    )
    return whole.unionByName(edge).drop("_bkt")


def split_edges(
    edges: DataFrame,
    val_ratio: float = 0.1,
    test_ratio: float = 0.2,
    seed: int = 42,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Add a ``split`` column ∈ {train, val, test} by hashing the edge.

    ``pmod(hash64(src, dst, seed), 1000)`` buckets the edge space; ratio
    boundaries carve it. Deterministic, partition-invariant, no RNG state.
    """
    if val_ratio < 0 or test_ratio < 0 or val_ratio + test_ratio >= 1:
        raise ValueError(
            f"ratios must satisfy 0 <= val+test < 1, got {val_ratio}+{test_ratio}"
        )
    bucket = F.pmod(hash64(hash_method, "src", "dst", seed=seed), F.lit(1000))
    val_hi = int(val_ratio * 1000)
    test_hi = val_hi + int(test_ratio * 1000)
    return edges.withColumn(
        "split",
        F.when(bucket < val_hi, F.lit("val"))
        .when(bucket < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def negative_edges(
    edges: DataFrame,
    vertices: DataFrame,
    ratio: float = 2.0,
    seed: int = 42,
    max_rounds: int = 4,
    hash_method: str = "xxhash64",
    id_col: str = "vertex_id",
    early_stop: bool = True,
) -> DataFrame:
    """Sample ``ratio × |E|`` non-edges (negative examples).

    Candidates pair each positive edge's src with hash-derived destinations,
    then a ``left_anti`` join against the real edge set removes accidental
    positives (the reference relies on PyG's rejection loop; here rejection is
    the anti-join, repeated over fresh seeds until the quota fills).
    Deterministic in ``seed``.

    Precondition (checked): vertex ids are dense in ``[0, n_vertices)`` —
    candidate destinations are ``pmod(hash, n_vertices)``, so sparse ids would
    produce phantom endpoints (``dense_ids_*`` guarantees density). The final
    quota cut keeps exactly the ``need`` candidates with the smallest
    ``(hash, src, dst)`` via :func:`take_smallest_exact` — no global
    ORDER BY + LIMIT single-partition funnel. If ``max_rounds`` exhausts the
    candidate space before the quota fills, the shortfall is logged and the
    available negatives are returned.

    ``early_stop=False`` always runs all ``max_rounds`` rounds (skipping the
    per-round count job): the result is then a pure function of
    ``(edges, seed, max_rounds)`` regardless of when the quota would have
    filled — the externally-verifiable mode, and cheaper when the quota is
    known not to fill early.
    """
    lo, hi, n_vertices = vertices.agg(
        F.min(id_col), F.max(id_col), F.count("*")
    ).first()
    if n_vertices == 0:
        return edges.select("src", "dst").limit(0)
    if lo != 0 or hi != n_vertices - 1:
        raise ValueError(
            f"negative_edges requires dense vertex ids in [0, n); got "
            f"min={lo}, max={hi}, count={n_vertices} (use dense_ids_*)"
        )
    need = int(edges.count() * ratio)
    out: DataFrame | None = None
    have = 0
    for r in range(max_rounds):
        k = max(int(ratio) + 1, 1)
        cands = (
            edges.select("src")
            .withColumn(
                "dst",
                F.explode(
                    F.array(
                        *[
                            F.pmod(
                                hash64(hash_method, "src", seed=seed + r * 97 + i),
                                F.lit(n_vertices),
                            )
                            for i in range(k)
                        ]
                    )
                ),
            )
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        negs = cands.join(edges.select("src", "dst"), ["src", "dst"], "left_anti")
        out = negs if out is None else out.unionByName(negs).dropDuplicates(
            ["src", "dst"]
        )
        if early_stop:
            have = out.count()
            if have >= need:
                break
    # cache the full candidate chain once: without it the quota cut would
    # recompute the k*rounds explode + anti-join + dedup pipeline 2-3 times
    # (bucket-count pass, final filter, downstream consumption)
    ranked = out.withColumn(
        "_h", hash64(hash_method, "src", "dst", seed=seed)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if not early_stop:
        have = ranked.count()  # also materializes the cache
    if have < need:
        log.warning(
            "negative_edges: only %d of the requested %d negatives exist "
            "after %d rounds (candidate space exhausted); returning %d",
            have, need, max_rounds, have,
        )
    result = take_smallest_exact(
        ranked, min(need, have), hash_col="_h", tie_cols=("src", "dst")
    ).select("src", "dst")
    # hand the caller a cache-independent result before releasing the chain
    result = result.localCheckpoint(eager=True)
    ranked.unpersist()
    return result


def sample_neighbors(
    edges: DataFrame,
    fanout: int = 32,
    seed: int = 42,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Per-source neighbor sampling with fanout cap (LinkNeighborLoader
    analog): deterministic pseudo-shuffle by neighbor hash, keep the first
    ``fanout`` per src.

    Implemented as ``row_number()`` over ``Window.partitionBy(src)`` — the
    sort is external/spillable, so a 10^8-degree hub streams through one
    sorter without ever materializing its adjacency in an aggregation buffer
    (the collect_list formulation OOMs exactly there).
    """
    if fanout <= 0:
        raise ValueError(f"fanout must be positive, got {fanout}")
    w = Window.partitionBy("src").orderBy(F.col("_h").asc(), F.col("dst").asc())
    return (
        edges.select("src", "dst")
        .withColumn("_h", hash64(hash_method, "src", "dst", seed=seed))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= fanout)
        .select("src", "dst")
    )


def sample_neighbors_layered(
    edges: DataFrame,
    fanouts: tuple[int, ...] = (32, 16),
    seeds: DataFrame | None = None,
    seed: int = 42,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Multi-hop layered neighbor sampling — the reference loader's
    ``LinkNeighborLoader(num_neighbors=[32, 16])`` semantics
    (``/root/reference/halvesting_geometric/utils/data/link_prediction_datamodule.py:150-161``,
    fanout list ``experiments/tune_link_prediction.py:30``).

    Layer ``l`` (1-based) samples up to ``fanouts[l-1]`` out-neighbors per
    frontier vertex with the same windowed ``row_number`` kernel as
    :func:`sample_neighbors` (sort-based, spillable — hub-safe); the next
    frontier is the distinct set of sampled destinations (the loader's
    deduplicated-frontier semantics: each vertex is expanded once per
    layer, not once per root). ``seeds`` optionally restricts layer 1 to a
    set of root vertices (first column used); default is every source.
    Per-layer hash seeds are derived from ``seed`` so layers sample
    independently. Returns (src, dst, hop).
    """
    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    e = edges.select("src", "dst")
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("src")).distinct()
        if seeds is not None
        else None
    )
    out: DataFrame | None = None
    w = Window.partitionBy("src").orderBy(F.col("_h").asc(), F.col("dst").asc())
    for layer, fan in enumerate(fanouts, start=1):
        if fan <= 0:
            raise ValueError(f"fanouts must be positive, got {fanouts}")
        el = e if frontier is None else e.join(frontier, "src", "left_semi")
        sampled = (
            el.withColumn(
                "_h",
                hash64(hash_method, "src", "dst", seed=seed + 131 * (layer - 1)),
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= fan)
            .select("src", "dst", F.lit(layer).alias("hop"))
        )
        out = sampled if out is None else out.unionByName(sampled)
        frontier = sampled.select(F.col("dst").alias("src")).distinct()
    return out


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: Column | str,
    id_cols: tuple[str, ...],
    group_cols: tuple[str, ...] = (),
    seed: int = 0,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, ``n`` rows per group
    (global when ``group_cols`` is empty): Efraimidis–Spirakis A-ES via
    the exponential race — priority = −ln(u)/w with u a pure function of
    (seed, id_cols), so the sample is reproducible across partitionings,
    cluster sizes, and reruns (the same determinism contract as
    ``split_edges``). Rows with weight ≤ 0 or NULL are excluded (they
    can never win a weighted race). Ranking uses the e6-rounded priority
    with id tie-breaks, replayable exactly in an external SQL engine via
    ``hash_method="portable"``.

    Scale shape: one windowed row_number per group — sort-based,
    spillable, no per-group buffers; the global case (no group cols)
    funnels a single partition, so for huge global samples prefer the
    two-phase ``take_smallest_exact`` on the priority column.

    The corpus-downsampling primitive for training-data pipelines
    (sample documents ∝ quality score, per language/source)."""
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    # u in (0,1): 60-bit non-negative hash (pmod folds xxhash64's sign)
    span = 1 << 60
    h = F.pmod(hash64(hash_method, *id_cols, seed=seed), F.lit(span))
    u = (h + F.lit(1.0)) / F.lit(float(span + 2))
    pri = -F.log(u) / w
    pri_e6 = F.floor(pri * 1_000_000 + F.lit(0.5)).cast("long")
    win = Window.partitionBy(
        *[F.col(c) for c in group_cols] if group_cols else [F.lit(1)]
    ).orderBy(F.col("_pri").asc(), *[F.col(c).asc() for c in id_cols])
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_pri", pri_e6)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
        .withColumnRenamed("_pri", "priority_e6")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    tie_cols: tuple[str, ...],
    hash_method: str = "portable",
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sample: exactly ``min(n, |group|)`` rows per
    group, chosen as the n smallest by a seeded hash of ``tie_cols`` — a
    uniform-without-replacement draw that is reproducible across engines
    (``hash_method='portable'`` has a DuckDB twin) and across runs.

    Scale shape: groups small enough to keep whole are passed through with no
    sort at all (an aggregate count + broadcastable join decides); only
    oversized groups enter the row_number window, and their sort key is the
    hash — Spark's window sort is spillable, and the emitted quota is bounded
    at ``n`` per group, so no hub group can blow up an output partition.
    Returns the input columns (hash/rank columns dropped).
    """
    if n_per_group <= 0:
        return df.limit(0)
    h = hash64(hash_method, *tie_cols, seed=seed)
    sized = df.join(
        F.broadcast(
            df.groupBy(group_col).agg(F.count("*").alias("_gn"))
        ),
        group_col,
    )
    small = sized.filter(F.col("_gn") <= n_per_group).drop("_gn")
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in tie_cols]
    )
    big = (
        sized.filter(F.col("_gn") > n_per_group)
        .drop("_gn")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )
    return small.unionByName(big)


def pps_sample(
    df: DataFrame,
    n_expected: int,
    size_col: str,
    id_cols: tuple[str, ...] = ("doc_id",),
    seed: int = 42,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Poisson PPS (probability-proportional-to-size) sample.

    The standard weighted subsample for corpus curation: row i survives
    independently with probability ``min(1, n_expected·size_i / Σsize)``,
    so the expected sample holds ``n_expected`` rows and the expected
    TOKEN mass is spread evenly over the kept documents (big documents
    are not under-represented the way uniform row sampling leaves them).
    Rows with ``size ≥ Σsize / n_expected`` are always kept (the
    certainty stratum of classical PPS).

    Deterministic: the Bernoulli draw is ``h < n·size·D / total`` with
    ``h = hash(id_cols, seed) mod D`` (D = 2^60) evaluated in exact
    decimal(38,0) integer arithmetic — no float threshold, so the kept
    set is bit-identical across engines, partitionings and retries, and
    the DuckDB gate twin replays it verbatim (``hash_method="portable"``).
    ``Σsize`` is one scalar aggregate (driver-side, bounded state).

    Returns the surviving rows of ``df`` unchanged.
    """
    if n_expected < 1:
        raise ValueError(f"n_expected must be >= 1, got {n_expected}")
    total = df.agg(F.sum(F.col(size_col)).cast("long")).first()[0]
    if total is None or total <= 0:
        raise ValueError(f"sum({size_col}) must be positive, got {total}")
    D = 1 << 60
    h = F.pmod(hash64(hash_method, *id_cols, seed=seed), F.lit(D))
    lhs = h.cast("decimal(38,0)") * F.lit(int(total)).cast("decimal(38,0)")
    # cap n·size at total BEFORE multiplying by D: min(1, p) semantics is
    # unchanged (n·size ≥ total ⟺ h·total < total·D, always true) and the
    # product stays ≤ total·D ≈ 1e32 — inside decimal(38,0) even at
    # 100 TB token totals, where an uncapped n·size·D could overflow
    rhs = (
        F.least(
            F.col(size_col).cast("decimal(38,0)")
            * F.lit(int(n_expected)).cast("decimal(38,0)"),
            F.lit(int(total)).cast("decimal(38,0)"),
        )
        * F.lit(D).cast("decimal(38,0)")
    )
    return df.filter(lhs < rhs)
