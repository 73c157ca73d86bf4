"""Incremental edge ingestion (Trigger.AvailableNow) — exactly-once per file,
resumable, equal to batch extraction."""

from __future__ import annotations

import pandas as pd

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.extract import extract_conv_edges
from halvesting_geometric_spark.streaming.ingest import (
    compact_edges,
    ingest_available_now,
)


def test_streaming_ingest_matches_batch_and_resumes(spark, tmp_path):
    tr_dir = str(tmp_path / "transcripts")
    edges_dir = str(tmp_path / "edges")
    ckpt_dir = str(tmp_path / "ckpt")

    batch1 = generate_transcripts(spark, 30, seed=4)
    batch1.write.mode("append").parquet(tr_dir)
    ingest_available_now(spark, tr_dir, edges_dir, ckpt_dir)
    got1 = compact_edges(spark, edges_dir).toPandas()
    exp1 = extract_conv_edges(spark.read.parquet(tr_dir)).toPandas()
    assert set(map(tuple, got1.to_numpy())) == set(map(tuple, exp1.to_numpy()))

    # second batch of NEW conversations lands; re-run drains only the delta
    batch2 = generate_transcripts(spark, 60, seed=4).filter(
        "conv_id >= 'c00000030'"
    )
    batch2.write.mode("append").parquet(tr_dir)
    ingest_available_now(spark, tr_dir, edges_dir, ckpt_dir)
    got2 = compact_edges(spark, edges_dir).toPandas()
    exp2 = extract_conv_edges(spark.read.parquet(tr_dir)).toPandas()
    assert set(map(tuple, got2.to_numpy())) == set(map(tuple, exp2.to_numpy()))

    # re-running with no new files must not duplicate anything (raw log stable)
    raw_before = spark.read.parquet(edges_dir).count()
    ingest_available_now(spark, tr_dir, edges_dir, ckpt_dir)
    assert spark.read.parquet(edges_dir).count() == raw_before
