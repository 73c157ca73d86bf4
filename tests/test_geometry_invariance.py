"""Partitioning invariance for the round-4 geometry/null-model wave.

Every operator's output must be independent of the input DataFrame's
physical partitioning (the salting/shuffle-partitions invariance the
engine asserts for its older families).
"""

from __future__ import annotations

import itertools
import random

from halvesting_geometric_spark.operators.curvature import forman_curvature
from halvesting_geometric_spark.operators.labelprop import (
    seeded_label_propagation,
)
from halvesting_geometric_spark.operators.partition import balanced_partition
from halvesting_geometric_spark.operators.scan import scan_clusters
from halvesting_geometric_spark.operators.sparsify import local_jaccard_sparsify


def _graph(spark, seed, n=35, m=140, parts=None):
    rng = random.Random(seed)
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    pairs = [(a, b) for a, b in pairs if a != b]
    pairs += list(itertools.combinations(range(5), 2))  # planted K5
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return df.repartition(parts) if parts else df


def _verts(spark, n=35):
    return spark.createDataFrame([(int(v),) for v in range(n)], "vertex_id long")


def test_geometry_partitioning_invariance(spark):
    v = _verts(spark)
    seeds = spark.createDataFrame(
        [(0, 0), (7, 1), (20, 2)], "vertex_id long, label long"
    )
    for op in (
        lambda e: {(r.src, r.dst, r.curvature) for r in forman_curvature(e).collect()},
        lambda e: {
            (r.src, r.dst, r.jaccard_e6)
            for r in local_jaccard_sparsify(e).collect()
        },
        lambda e: {
            (r.vertex_id, r.cluster, r.role)
            for r in scan_clusters(e, v, eps_e6=500_000, mu=3).collect()
        },
        lambda e: {
            (r.vertex_id, r.label)
            for r in balanced_partition(e, v, k=3, rounds=3).collect()
        },
        lambda e: {
            (r.vertex_id, r.label)
            for r in seeded_label_propagation(e, seeds, v, rounds=3).collect()
        },
    ):
        base = op(_graph(spark, 51))
        for parts in (1, 7):
            assert op(_graph(spark, 51, parts=parts)) == base
