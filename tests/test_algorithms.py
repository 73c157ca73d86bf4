"""Connected components, label propagation, triangle counting vs oracles
(FIXTURES.md §3 golden graphs + §4 randomized-fixture oracles)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.components import connected_components
from halvesting_geometric_spark.operators.graph import build_graph
from halvesting_geometric_spark.operators.labelprop import label_propagation
from halvesting_geometric_spark.operators.triangles import triangle_count
from tests.oracles import (
    components_oracle,
    label_propagation_oracle,
    triangles_oracle,
)

# two 4-cliques joined by one bridge edge (FIXTURES.md §3)
CLIQUES = (
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    + [(3, 4)]
)
BOWTIE = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]  # two triangles sharing 2


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src long, dst long"
    )


def _verts_df(spark, n):
    return spark.range(n).select(F.col("id").alias("vertex_id"))


def _to_array(df, col, n, default=-1):
    pdf = df.toPandas().sort_values("vertex_id")
    arr = np.full(n, default, dtype=np.int64)
    arr[pdf["vertex_id"].to_numpy()] = pdf[col].to_numpy()
    return arr


# ---------------- connected components ----------------


def test_cc_two_cliques_bridge(spark):
    res = connected_components(_edges_df(spark, CLIQUES), _verts_df(spark, 8))
    arr = _to_array(res.components, "component", 8)
    assert (arr == 0).all()  # bridge merges everything into component 0
    assert res.num_components == 1


def test_cc_isolated_vertices_and_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    res = connected_components(empty, _verts_df(spark, 10))
    arr = _to_array(res.components, "component", 10)
    assert (arr == np.arange(10)).all()
    assert res.num_components == 10


def test_cc_extracted_graph_vs_union_find(spark):
    tr = generate_transcripts(spark, 120, seed=9)
    g = build_graph(tr)
    n = g.num_vertices()
    edges = g.edges.toPandas().to_numpy()
    res = connected_components(g.edges, g.vertices)
    got = _to_array(res.components, "component", n)
    exp = components_oracle(edges, n)
    assert (got == exp).all()
    assert res.num_components == len(np.unique(exp))


def test_cc_long_path_converges(spark):
    # path graph stresses the O(log n) contraction rounds
    n = 64
    path = [(i, i + 1) for i in range(n - 1)]
    res = connected_components(_edges_df(spark, path), _verts_df(spark, n))
    arr = _to_array(res.components, "component", n)
    assert (arr == 0).all()


# ---------------- label propagation ----------------


def test_lp_two_cliques_bridge_communities(spark):
    res = label_propagation(
        _edges_df(spark, CLIQUES), _verts_df(spark, 8), fixed_iters=4
    )
    got = _to_array(res.labels, "label", 8)
    exp = label_propagation_oracle(np.array(CLIQUES), 8, iters=4)
    assert (got == exp).all()


def test_lp_extracted_graph_vs_oracle(spark):
    tr = generate_transcripts(spark, 100, seed=21)
    g = build_graph(tr)
    n = g.num_vertices()
    edges = g.edges.toPandas().to_numpy()
    for iters in (1, 3):
        res = label_propagation(g.edges, g.vertices, fixed_iters=iters)
        got = _to_array(res.labels, "label", n)
        exp = label_propagation_oracle(edges, n, iters=iters)
        assert (got == exp).all(), f"iters={iters}"


def test_lp_isolated_keep_own_label(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    res = label_propagation(empty, _verts_df(spark, 5), max_iter=3)
    got = _to_array(res.labels, "label", 5)
    assert (got == np.arange(5)).all()
    assert res.converged


# ---------------- triangle counting ----------------


def test_triangles_bowtie(spark):
    res = triangle_count(_edges_df(spark, BOWTIE), _verts_df(spark, 5))
    assert res.total == 2
    arr = _to_array(res.per_vertex, "triangles", 5)
    assert arr.tolist() == [1, 1, 2, 1, 1]  # shared vertex 2 in both triangles


def test_triangles_two_cliques(spark):
    res = triangle_count(_edges_df(spark, CLIQUES), _verts_df(spark, 8))
    assert res.total == 8  # 2 * C(4,3)


def test_triangles_ring_and_directed_input(spark):
    ring = [(i, (i + 1) % 5) for i in range(5)]
    assert triangle_count(_edges_df(spark, ring)).total == 0
    # direction + duplicates + self-loops must not affect counts
    noisy = [(1, 0), (1, 2), (0, 2), (2, 0), (3, 3), (0, 1)]
    assert triangle_count(_edges_df(spark, noisy)).total == 1


def test_triangles_extracted_graph_vs_oracle(spark):
    tr = generate_transcripts(spark, 150, seed=13)
    g = build_graph(tr)
    n = g.num_vertices()
    edges = g.edges.toPandas().to_numpy()
    exp_total, exp_per_vertex = triangles_oracle(edges, n)
    for kernel in ("join", "csr"):
        res = triangle_count(g.edges, g.vertices, kernel=kernel)
        assert res.total == exp_total, kernel
        got = _to_array(res.per_vertex, "triangles", n)
        assert (got == exp_per_vertex).all(), kernel


def test_triangles_csr_kernel_bowtie(spark):
    res = triangle_count(_edges_df(spark, BOWTIE), _verts_df(spark, 5), kernel="csr")
    assert res.total == 2
    arr = _to_array(res.per_vertex, "triangles", 5)
    assert arr.tolist() == [1, 1, 2, 1, 1]
