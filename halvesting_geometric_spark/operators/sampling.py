"""Deterministic edge splitting, negative sampling, neighbor sampling.

Reference analog: ``RandomLinkSplit`` + ``LinkNeighborLoader``
(``/root/reference/halvesting_geometric/utils/data/link_prediction_datamodule.py:127-134,150-161``;
split ratios ``configs/train_sage_config.yml:2-4``, fanout
``experiments/tune_link_prediction.py:30``). The reference uses torch RNG
state; here every random choice is a pure function of ``(seed, edge)`` via
xxhash64 — reproducible across partitionings, cluster sizes, and reruns
(SURVEY.md §2.10 R1/R2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_edges(
    edges: DataFrame,
    val_ratio: float = 0.1,
    test_ratio: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Add a ``split`` column ∈ {train, val, test} by hashing the edge.

    ``pmod(xxhash64(src, dst, seed), 1000)`` buckets the edge space; ratio
    boundaries carve it. Deterministic, partition-invariant, no RNG state.
    """
    if val_ratio < 0 or test_ratio < 0 or val_ratio + test_ratio >= 1:
        raise ValueError(
            f"ratios must satisfy 0 <= val+test < 1, got {val_ratio}+{test_ratio}"
        )
    bucket = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1000))
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
) -> DataFrame:
    """Sample ``ratio × |E|`` non-edges (negative examples).

    Candidates pair each positive edge's src with hash-derived destinations,
    then a ``left_anti`` join against the real edge set removes accidental
    positives (the reference relies on PyG's rejection loop; here rejection is
    the anti-join, repeated over fresh seeds until the quota fills).
    Deterministic in ``seed``.
    """
    n_vertices = vertices.count()
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
                                F.xxhash64("src", F.lit(seed + r * 97 + i)),
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
        have = out.count()
        if have >= need:
            break
    # deterministic truncation to the quota: smallest hash first
    return (
        out.withColumn("_h", F.xxhash64("src", "dst", F.lit(seed)))
        .orderBy("_h")
        .limit(need)
        .select("src", "dst")
    )


def sample_neighbors(
    edges: DataFrame, fanout: int = 32, seed: int = 42
) -> DataFrame:
    """Per-source neighbor sampling with fanout cap (LinkNeighborLoader
    analog): deterministic pseudo-shuffle by neighbor hash, keep first
    ``fanout`` per src. One aggregate + one slice — no Python."""
    if fanout <= 0:
        raise ValueError(f"fanout must be positive, got {fanout}")
    ranked = edges.select(
        "src",
        "dst",
        F.xxhash64("src", "dst", F.lit(seed)).alias("_h"),
    )
    grouped = ranked.groupBy("src").agg(
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_h"), F.col("dst")))
                ),
                lambda s: s["dst"],
            ),
            1,
            fanout,
        ).alias("sampled")
    )
    return grouped.select("src", F.explode("sampled").alias("dst"))
