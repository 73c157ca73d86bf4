from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.dag import (
    dag_longest_paths,
    kahn_levels,
)
from halvesting_geometric_spark.operators.scc import topological_levels


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _verts(spark, n):
    return spark.range(n).select(F.col("id").alias("vertex_id"))


# diamond + tail: 0→1, 0→2, 1→3, 2→3, 3→4; 5 isolated
_DAG = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
_LEVELS = {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 0}


def test_kahn_levels_diamond(spark):
    e = _df(spark, _DAG, "src long, dst long")
    got = {
        r["vertex_id"]: r["level"]
        for r in kahn_levels(e, _verts(spark, 6)).collect()
    }
    assert got == _LEVELS


def test_kahn_matches_max_propagation_twin(spark):
    """Kahn peeling (shrinking state) == scc.topological_levels (full-V
    max-propagation) on any DAG — two independent algorithms, one answer."""
    e = _df(spark, _DAG, "src long, dst long")
    v = _verts(spark, 6)
    a = {r["vertex_id"]: r["level"] for r in kahn_levels(e, v).collect()}
    b = {
        r["vertex_id"]: r["level"]
        for r in topological_levels(e, v).collect()
    }
    assert a == b


def test_kahn_raises_on_cycle(spark):
    e = _df(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="not a DAG"):
        kahn_levels(e, _verts(spark, 4))


def test_kahn_raises_on_self_loop(spark):
    e = _df(spark, [(0, 1), (1, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="not a DAG"):
        kahn_levels(e, _verts(spark, 2))


def test_dag_longest_unit_weights_equal_kahn(spark):
    e = _df(spark, _DAG, "src long, dst long")
    v = _verts(spark, 6)
    lev = {r["vertex_id"]: r["level"] for r in kahn_levels(e, v).collect()}
    dist = {
        r["vertex_id"]: int(r["dist"])
        for r in dag_longest_paths(e, v, fixed_iters=10).collect()
    }
    assert dist == lev


def test_dag_longest_weighted_critical_path(spark):
    # 0→1 (w5), 0→2 (w1), 1→3 (w1), 2→3 (w10): longest to 3 is 0→2→3 = 11
    e = _df(
        spark,
        [(0, 1, 5.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 10.0)],
        "src long, dst long, w double",
    )
    got = {
        r["vertex_id"]: r["dist"]
        for r in dag_longest_paths(
            e, _verts(spark, 4), weight_col="w", fixed_iters=10
        ).collect()
    }
    assert got == {0: 0.0, 1: 5.0, 2: 1.0, 3: 11.0}


def test_dag_longest_explicit_sources_and_bounded_walk(spark):
    # cycle 0→1→2→0 with unit weights: k-relaxation = longest walk ≤ k edges
    e = _df(spark, [(0, 1), (1, 2), (2, 0)], "src long, dst long")
    v = _verts(spark, 3)
    got = {
        r["vertex_id"]: int(r["dist"])
        for r in dag_longest_paths(
            e, v, sources=[0], fixed_iters=4
        ).collect()
    }
    # python twin: 4 max-relaxations from dist={0:0}
    dist = {0: 0.0}
    for _ in range(4):
        nxt = dict(dist)
        for s, d in [(0, 1), (1, 2), (2, 0)]:
            if s in dist:
                nxt[d] = max(nxt.get(d, float("-inf")), dist[s] + 1.0)
        dist = nxt
    assert got == {k: int(x) for k, x in dist.items()}


def test_dag_longest_rejects_empty_sources(spark):
    # every vertex has an in-edge → default source set is empty
    e = _df(spark, [(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError, match="source set is empty"):
        dag_longest_paths(e, _verts(spark, 2))
