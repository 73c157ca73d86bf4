"""Incremental PageRank: streaming ingest + warm-start re-convergence
composition — fewer supersteps after a small delta, same fixpoint as a
cold start on the same snapshot."""

from __future__ import annotations

import numpy as np

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.plans.incremental import IncrementalPageRank


def test_incremental_pagerank_warm_start_converges_faster(spark, tmp_path):
    tr_dir = str(tmp_path / "tr")
    work = str(tmp_path / "work")

    generate_transcripts(spark, 120, seed=11).write.mode("append").parquet(tr_dir)
    inc = IncrementalPageRank(spark, tr_dir, work)

    s1 = inc.refresh(tol=1e-8)
    assert s1["converged"] and not s1["warm_started"]
    cold_iters = s1["iterations"]
    assert cold_iters > 3
    top1 = inc.top_conversations(5).toPandas()
    assert len(top1) == 5

    # small delta lands: a handful of NEW conversations
    generate_transcripts(spark, 132, seed=11).filter(
        "conv_id >= 'c00000120'"
    ).write.mode("append").parquet(tr_dir)

    s2 = inc.refresh(tol=1e-8)
    assert s2["converged"] and s2["warm_started"]
    assert s2["num_vertices"] >= s1["num_vertices"]
    # the whole point: re-convergence from the previous fixpoint takes
    # far fewer supersteps than the cold start did
    assert s2["iterations"] < cold_iters

    # and the warm-started fixpoint equals a cold start on the SAME snapshot
    from halvesting_geometric_spark.operators.extract import extract_conv_edges
    from halvesting_geometric_spark.operators.ids import (
        build_vertices,
        edges_to_ids,
    )
    from halvesting_geometric_spark.operators.pagerank import pagerank

    ce = extract_conv_edges(spark.read.parquet(tr_dir))
    verts = build_vertices(ce, scalable=True)
    edges = edges_to_ids(ce, verts)
    cold = pagerank(edges, verts.select("vertex_id"), tol=1e-8)
    cold_conv = (
        cold.ranks.join(verts, "vertex_id")
        .select("conv_id", "rank")
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    warm_conv = (
        spark.read.parquet(str(tmp_path / "work" / "ranks"))
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert list(cold_conv.index) == list(warm_conv.index)
    np.testing.assert_allclose(
        warm_conv["rank"].to_numpy(), cold_conv["rank"].to_numpy(), atol=1e-6
    )

    # refresh with nothing new: warm start from the fixpoint is immediate
    s3 = inc.refresh(tol=1e-8)
    assert s3["converged"] and s3["iterations"] <= 2
