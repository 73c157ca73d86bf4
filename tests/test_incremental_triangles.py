"""Incremental triangle counting equals the batch counter on the cumulative
graph, for every prefix of a batch stream."""

import random

import pytest

from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.triangles import triangle_count
from halvesting_geometric_spark.streaming.triangles import (
    IncrementalTriangles,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _batch_counts(spark, pairs):
    edges = _df(spark, pairs)
    verts = (
        edges.select(F.col("src").alias("vertex_id"))
        .unionByName(edges.select(F.col("dst").alias("vertex_id")))
        .distinct()
    )
    r = triangle_count(edges, verts)
    pv = {
        row["vertex_id"]: row["triangles"]
        for row in r.per_vertex.filter(F.col("triangles") > 0).collect()
    }
    return r.total, pv


def test_incremental_matches_batch_on_random_stream(spark):
    rng = random.Random(11)
    all_edges = set()
    while len(all_edges) < 60:
        a, b = rng.randrange(12), rng.randrange(12)
        if a != b:
            all_edges.add((min(a, b), max(a, b)))
    stream = sorted(all_edges)
    rng.shuffle(stream)
    inc = IncrementalTriangles()
    seen = []
    for lo in range(0, len(stream), 15):
        batch = stream[lo:lo + 15]
        seen.extend(batch)
        inc.update(_df(spark, batch))
        want_total, want_pv = _batch_counts(spark, seen)
        assert inc.total == want_total
        got_pv = {
            r["vertex_id"]: r["triangles"]
            for r in inc.per_vertex().filter(F.col("triangles") > 0).collect()
        }
        assert got_pv == want_pv
    assert inc.updates == 4


def test_incremental_triangle_split_across_batches(spark):
    inc = IncrementalTriangles()
    # one edge per batch; the third closes the triangle
    assert inc.update(_df(spark, [(0, 1)])) == 0
    assert inc.update(_df(spark, [(1, 2)])) == 0
    assert inc.update(_df(spark, [(0, 2)])) == 1
    assert inc.total == 1


def test_incremental_whole_triangle_in_one_batch_counts_once(spark):
    inc = IncrementalTriangles()
    # all three edges new in the same batch: charged to the smallest edge
    assert inc.update(_df(spark, [(0, 1), (1, 2), (0, 2)])) == 1
    # two new edges + one old edge close exactly one new triangle {1,2,3}
    assert inc.update(_df(spark, [(2, 3), (1, 3)])) == 1
    # one new edge (0,3) closes two triangles at once: {0,1,3} and {0,2,3}
    assert inc.update(_df(spark, [(0, 3)])) == 2
    assert inc.total == 4


def test_incremental_ignores_duplicates_selfloops_and_reversals(spark):
    inc = IncrementalTriangles()
    inc.update(_df(spark, [(0, 1), (1, 2), (0, 2), (3, 3)]))
    # re-sent (also reversed) edges create nothing
    assert inc.update(_df(spark, [(1, 0), (2, 1), (0, 2), (0, 2)])) == 0
    assert inc.total == 1


def test_per_vertex_before_update_raises(spark):
    with pytest.raises(ValueError, match="no updates"):
        IncrementalTriangles().per_vertex()
