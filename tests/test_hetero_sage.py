"""hetero_aggregate: per-relation typed message passing + fan-in
(the data side of PyG to_hetero dispatch, reference
modeling_link_prediction.py:129)."""

import pytest

from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.hetero import (
    HeteroGraph,
    hetero_aggregate,
)


def _graph(spark):
    g = HeteroGraph()
    g.add_vertices("A", spark.createDataFrame([(1,), (2,)], "id long"))
    g.add_vertices("B", spark.createDataFrame([(10,), (11,)], "id long"))
    g.add_edges(
        "A", "r1", "B",
        spark.createDataFrame([(1, 10), (2, 10), (1, 11)], "src long, dst long"),
    )
    g.add_edges(
        "B", "r2", "B", spark.createDataFrame([(10, 11)], "src long, dst long")
    )
    return g


def _feats(spark, rows):
    return spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in rows.items()],
        "id long, features array<double>",
    )


def test_hetero_aggregate_mean_sum_fanin(spark):
    g = _graph(spark)
    feats = {
        "A": _feats(spark, {1: (1, 2), 2: (3, 4)}),
        "B": _feats(spark, {10: (10, 20), 11: (30, 40)}),
    }
    out = hetero_aggregate(g, feats, dim=2)
    assert set(out) == {"B"}
    got = {
        r["id"]: (r["n_rels"], r["nbr_total"], tuple(r["vec"]))
        for r in out["B"].collect()
    }
    # B=10: r1 mean of (1,2),(3,4) = (2,3); no r2 in-edges
    # B=11: r1 mean (1,2) + r2 mean (10,20) = (11,22)
    assert got == {10: (1, 2, (2.0, 3.0)), 11: (2, 2, (11.0, 22.0))}


def test_hetero_aggregate_combine_mean(spark):
    g = _graph(spark)
    feats = {
        "A": _feats(spark, {1: (1, 2), 2: (3, 4)}),
        "B": _feats(spark, {10: (10, 20), 11: (30, 40)}),
    }
    out = hetero_aggregate(g, feats, dim=2, combine="mean")
    got = {r["id"]: tuple(r["vec"]) for r in out["B"].collect()}
    assert got == {10: (2.0, 3.0), 11: (5.5, 11.0)}


def test_hetero_aggregate_relation_filter_and_unfeatured_skip(spark):
    g = _graph(spark)
    a_only = {"A": _feats(spark, {1: (1, 2), 2: (3, 4)})}
    # r2's source type B has no features -> relation skipped entirely
    out = hetero_aggregate(g, a_only, dim=2)
    got = {r["id"]: (r["n_rels"], tuple(r["vec"])) for r in out["B"].collect()}
    assert got == {10: (1, (2.0, 3.0)), 11: (1, (1.0, 2.0))}
    # explicit relation list resolves by bare name
    feats = {
        "A": _feats(spark, {1: (1, 2), 2: (3, 4)}),
        "B": _feats(spark, {10: (10, 20), 11: (30, 40)}),
    }
    out2 = hetero_aggregate(g, feats, dim=2, relations=["r2"])
    got2 = {r["id"]: tuple(r["vec"]) for r in out2["B"].collect()}
    assert got2 == {11: (10.0, 20.0)}


def test_hetero_aggregate_validates_combine(spark):
    g = _graph(spark)
    with pytest.raises(ValueError, match="combine"):
        hetero_aggregate(g, {}, dim=2, combine="median")


def test_hetero_aggregate_max_agg(spark):
    g = _graph(spark)
    feats = {"A": _feats(spark, {1: (1, 9), 2: (3, 4)})}
    out = hetero_aggregate(g, feats, dim=2, relations=["r1"], agg="max")
    got = {r["id"]: tuple(r["vec"]) for r in out["B"].collect()}
    assert got == {10: (3.0, 9.0), 11: (1.0, 9.0)}
