"""Targeted-attack robustness curve of the link graph.

Classic percolation analysis (Albert-Jeong-Barabási attack tolerance): knock
out the highest-degree vertices and measure how the giant component decays.
The attack is parameterized by the SURVIVING degree cap (keep vertices of
simple-graph degree <= d) rather than a removal fraction, so the rule is
deterministic, scale-free, and expressible in the DuckDB oracle without a
ranked top-k tie-break.

For each cap the subgraph is two joins (degree filter on both endpoints) and
one run of the scalable connected-components driver, followed by a constant
size aggregate — everything inherits CC's per-round lineage truncation and
bounded state. Caps are evaluated largest-first so each run could reuse the
previous (shrinking) subgraph; at gate scale each run just refilters the
cached canonical edges.

Engine-new (the reference builds the graph but computes no robustness
metrics); part of the link-graph analytics surface next to rich-club and
conductance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.components import (
    connected_components,
)
from halvesting_geometric_spark.operators.graph import canonical_edges

__all__ = ["bond_percolation", "degree_attack_robustness"]


def degree_attack_robustness(
    edges: DataFrame,
    vertices: DataFrame,
    degree_caps: Sequence[int] = (8, 16, 32),
) -> DataFrame:
    """One row per cap d: the graph after removing every vertex of
    undirected simple-graph degree > d.

    Returns (degree_cap, kept_vertices, kept_edges, n_components,
    giant_size): kept_vertices counts all surviving vertices (isolated ones
    included — they become singleton components), kept_edges the canonical
    edges with both endpoints surviving, giant_size the largest component.
    """
    if not degree_caps:
        raise ValueError("degree_caps must be non-empty")
    spark = edges.sparkSession
    canon = canonical_edges(edges).persist()
    deg = (
        canon.select(F.col("src").alias("vertex_id"))
        .unionByName(canon.select(F.col("dst").alias("vertex_id")))
        .groupBy("vertex_id")
        .agg(F.count("*").alias("_deg"))
    )
    degv = (
        vertices.select("vertex_id")
        .join(deg, "vertex_id", "left")
        .select("vertex_id", F.coalesce("_deg", F.lit(0)).alias("_deg"))
        .persist()
    )
    rows = []
    for cap in sorted(degree_caps, reverse=True):
        kept = degv.filter(F.col("_deg") <= cap).select("vertex_id")
        ke = (
            canon.join(
                kept.select(F.col("vertex_id").alias("src")), "src", "left_semi"
            ).join(
                kept.select(F.col("vertex_id").alias("dst")), "dst", "left_semi"
            )
        )
        res = connected_components(ke, kept)
        stats = (
            res.components.groupBy("component")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.count("*").alias("n_components"),
                F.coalesce(F.max("sz"), F.lit(0)).alias("giant_size"),
                F.coalesce(F.sum("sz"), F.lit(0)).alias("kept_vertices"),
            )
            .first()
        )
        n_ke = ke.count()
        rows.append(
            (
                int(cap),
                int(stats["kept_vertices"]),
                int(n_ke),
                int(stats["n_components"]),
                int(stats["giant_size"]),
            )
        )
    canon.unpersist()
    degv.unpersist()
    return spark.createDataFrame(
        rows,
        "degree_cap long, kept_vertices long, kept_edges long, "
        "n_components long, giant_size long",
    )


def bond_percolation(
    edges: DataFrame,
    vertices: DataFrame,
    retain_permille: Sequence[int] = (250, 500, 750),
    seed: int = 42,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Random-failure (bond-percolation) robustness curve.

    The complement of :func:`degree_attack_robustness`: instead of
    targeted vertex removal, every canonical edge independently survives
    with probability ``p`` — the classic random-failure model whose giant
    component persists on power-law graphs long after targeted attack has
    shattered them (Albert-Jeong-Barabási).  Retention is a deterministic
    seeded-hash Bernoulli (``hash(src, dst, seed) mod 1000 < p_mill``), so
    the curve is reproducible and, under ``hash_method="portable"``,
    replayable by the DuckDB gate twin.

    One scalable-CC run per retention level over the filtered canonical
    edges (all vertices survive — bond percolation removes edges only);
    returns (retain_permille, kept_edges, n_components, giant_size) with
    isolated vertices counted as singleton components.
    """
    from halvesting_geometric_spark.operators.sampling import hash64

    if not retain_permille:
        raise ValueError("retain_permille must be non-empty")
    if any(not 0 < p <= 1000 for p in retain_permille):
        raise ValueError(
            f"retain_permille entries must be in (0, 1000], got {retain_permille}"
        )
    spark = edges.sparkSession
    canon = canonical_edges(edges).withColumn(
        "_h", F.pmod(hash64(hash_method, "src", "dst", seed=seed), F.lit(1000))
    ).persist()
    verts = vertices.select("vertex_id").persist()
    rows = []
    for p in sorted(retain_permille, reverse=True):
        ke = canon.filter(F.col("_h") < p).select("src", "dst")
        res = connected_components(ke, verts)
        stats = (
            res.components.groupBy("component")
            .agg(F.count("*").alias("sz"))
            .agg(
                F.count("*").alias("n_components"),
                F.coalesce(F.max("sz"), F.lit(0)).alias("giant_size"),
            )
            .first()
        )
        rows.append(
            (int(p), int(ke.count()), int(stats["n_components"]),
             int(stats["giant_size"]))
        )
    canon.unpersist()
    verts.unpersist()
    return spark.createDataFrame(
        rows,
        "retain_permille long, kept_edges long, n_components long, "
        "giant_size long",
    )
