from __future__ import annotations

import pytest

from halvesting_geometric_spark.operators.bipartite import bipartite_project


def _rel(spark, rows):
    return spark.createDataFrame(rows, "u long, v long")


def test_bipartite_project_basic(spark):
    # users 0..2 over convs 10..12: u0→{10,11}, u1→{10,11,12}, u2→{11,12}
    rel = _rel(
        spark,
        [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12), (2, 11), (2, 12)],
    )
    got = {
        (r["a"], r["b"]): (r["weight"], r["da"], r["db"])
        for r in bipartite_project(rel, "u", "v").collect()
    }
    assert got == {
        (10, 11): (2, 2, 3),  # shared: u0, u1
        (10, 12): (1, 2, 2),  # shared: u1
        (11, 12): (2, 3, 2),  # shared: u1, u2
    }


def test_bipartite_project_dedups_multi_edges(spark):
    # duplicate interactions must not inflate weights
    rel = _rel(spark, [(0, 10), (0, 10), (0, 11), (0, 11)])
    got = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(rel, "u", "v").collect()
    }
    assert got == {(10, 11): 1}


def test_bipartite_project_hub_cap_drops_wedges_not_degrees(spark):
    # u9 touches every conv (hub): capped out of wedge generation, but
    # right-node degrees still count it
    rows = [(0, 10), (0, 11)] + [(9, v) for v in (10, 11, 12)]
    rel = _rel(spark, rows)
    got = {
        (r["a"], r["b"]): (r["weight"], r["da"], r["db"])
        for r in bipartite_project(
            rel, "u", "v", max_left_degree=2
        ).collect()
    }
    # only u0's wedge survives; degrees include u9
    assert got == {(10, 11): (1, 2, 2)}


def test_bipartite_project_min_weight(spark):
    rel = _rel(
        spark,
        [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 12)],
    )
    got = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(rel, "u", "v", min_weight=2).collect()
    }
    assert got == {(10, 11): 2}


def test_bipartite_project_rejects_bad_params(spark):
    rel = _rel(spark, [(0, 10)])
    with pytest.raises(ValueError, match="min_weight"):
        bipartite_project(rel, "u", "v", min_weight=0)
    with pytest.raises(ValueError, match="max_left_degree"):
        bipartite_project(rel, "u", "v", max_left_degree=0)
