"""Incremental connected components: warm star-edge updates equal batch CC
on the cumulative edge set, converge in fewer rounds, keep singletons, and
the AvailableNow wrapper folds file batches durably."""

from __future__ import annotations

from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.components import (
    connected_components,
)
from halvesting_geometric_spark.streaming.components import (
    IncrementalComponents,
    incremental_components_available_now,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _labels(df):
    return {r["vertex_id"]: r["component"] for r in df.collect()}


def test_incremental_matches_batch_on_cumulative_graph(spark):
    b1 = [(0, 1), (2, 3), (4, 5), (7, 7)]
    b2 = [(1, 2), (8, 9)]
    b3 = [(5, 8), (3, 4)]  # merges {4,5,8,9} and {0..3} ∪ {4,5}
    inc = IncrementalComponents()
    cold_rounds = None
    for b in (b1, b2, b3):
        inc.update(_edges(spark, b))
        if cold_rounds is None:
            cold_rounds = inc.rounds_last
    cumulative = _edges(spark, b1 + b2 + b3)
    verts = (
        cumulative.select(F.col("src").alias("vertex_id"))
        .unionByName(cumulative.select(F.col("dst").alias("vertex_id")))
        .distinct()
    )
    batch = connected_components(cumulative, vertices=verts)
    assert _labels(inc.labels) == _labels(batch.components)
    assert inc.updates == 3


def test_incremental_keeps_singletons(spark):
    inc = IncrementalComponents()
    inc.update(_edges(spark, [(0, 0), (1, 2)]))  # 0 is a singleton
    first = _labels(inc.labels)
    assert first[0] == 0 and first[1] == first[2] == 1
    inc.update(_edges(spark, [(3, 4)]))
    second = _labels(inc.labels)
    assert second[0] == 0, "singleton lost across an update"
    assert second[3] == second[4] == 3


def test_incremental_warm_update_takes_fewer_rounds(spark):
    # a long path is the worst case for star contraction: cold CC needs
    # several rounds; folding ONE extra edge into the star state does not
    n = 64
    path = [(i, i + 1) for i in range(n)]
    inc = IncrementalComponents()
    inc.update(_edges(spark, path))
    cold = inc.rounds_last
    inc.update(_edges(spark, [(n, n + 1)]))
    warm = inc.rounds_last
    assert cold >= 3
    assert warm < cold
    batch = connected_components(_edges(spark, path + [(n, n + 1)]))
    assert _labels(inc.labels) == _labels(batch.components)


def test_available_now_wrapper_is_durable_and_resumable(spark, tmp_path):
    edges_dir = str(tmp_path / "edges")
    labels_root = str(tmp_path / "labels")
    ckpt = str(tmp_path / "ckpt")

    _edges(spark, [(0, 1), (2, 3)]).write.mode("append").parquet(edges_dir)
    incremental_components_available_now(spark, edges_dir, labels_root, ckpt)
    got1 = _labels(_latest(spark, labels_root))
    assert got1[0] == got1[1] and got1[2] == got1[3] and got1[0] != got1[2]

    # new file lands; re-run processes only it and merges the components
    _edges(spark, [(1, 2)]).write.mode("append").parquet(edges_dir)
    incremental_components_available_now(spark, edges_dir, labels_root, ckpt)
    got2 = _labels(_latest(spark, labels_root))
    assert got2[0] == got2[1] == got2[2] == got2[3] == 0


def _latest(spark, labels_root):
    from halvesting_geometric_spark.streaming.degrees import _read_manifest

    gen, _ = _read_manifest(spark, labels_root)
    assert gen is not None
    return spark.read.parquet(f"{labels_root}/gen={gen}")
