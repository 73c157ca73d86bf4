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


def test_running_degrees_match_batch_and_compact(spark, tmp_path):
    from pyspark.sql import functions as F

    from halvesting_geometric_spark.streaming.degrees import (
        compact_degree_deltas,
        degree_deltas_available_now,
        read_running_degrees,
    )

    tr_dir = str(tmp_path / "tr")
    root = str(tmp_path / "deg_log")
    ckpt = str(tmp_path / "deg_ckpt")

    # empty log reads as empty, not an error
    assert read_running_degrees(spark, root).count() == 0
    assert compact_degree_deltas(spark, root) == 0  # nothing to fold

    generate_transcripts(spark, 30, seed=8).write.mode("append").parquet(tr_dir)
    degree_deltas_available_now(spark, tr_dir, root, ckpt)

    def batch_degrees():
        # batch twin over everything ingested so far (pre-dedup edge stream)
        from halvesting_geometric_spark.operators.extract import (
            extract_conv_edges,
        )

        return (
            extract_conv_edges(spark.read.parquet(tr_dir), dedupe=False)
            .groupBy("src_conv")
            .agg(F.count("*").alias("out_deg"))
            .toPandas()
            .set_index("src_conv")["out_deg"]
            .to_dict()
        )

    got1 = read_running_degrees(spark, root).toPandas().set_index("src_conv")
    assert got1["out_deg"].to_dict() == batch_degrees()

    # compaction folds live into base; the merged view is unchanged
    assert compact_degree_deltas(spark, root) > 0
    got_c = read_running_degrees(spark, root).toPandas().set_index("src_conv")
    assert got_c["out_deg"].to_dict() == batch_degrees()
    # double-compaction is a no-op fold of base only — still unchanged
    compact_degree_deltas(spark, root)
    got_c2 = read_running_degrees(spark, root).toPandas().set_index("src_conv")
    assert got_c2["out_deg"].to_dict() == batch_degrees()

    # a second drop lands AFTER compaction and accumulates on top of base
    generate_transcripts(spark, 60, seed=8).filter(
        "conv_id >= 'c00000030'"
    ).write.mode("append").parquet(tr_dir)
    degree_deltas_available_now(spark, tr_dir, root, ckpt)
    got2 = read_running_degrees(spark, root).toPandas().set_index("src_conv")
    assert got2["out_deg"].to_dict() == batch_degrees()

    # draining with no new files changes nothing
    degree_deltas_available_now(spark, tr_dir, root, ckpt)
    got3 = read_running_degrees(spark, root).toPandas().set_index("src_conv")
    assert got3["out_deg"].to_dict() == batch_degrees()

    # final compaction after the post-compaction appends: still exact
    compact_degree_deltas(spark, root)
    got4 = read_running_degrees(spark, root).toPandas().set_index("src_conv")
    assert got4["out_deg"].to_dict() == batch_degrees()


def test_degree_manifest_crash_safety(spark, tmp_path):
    """Versioned manifests: a lost manifest must never cascade into GC of
    base history, readers pick the highest-numbered manifest, and the legacy
    unversioned MANIFEST.json is still readable."""
    import glob
    import json
    import os

    from halvesting_geometric_spark.streaming.degrees import (
        _read_manifest,
        compact_degree_deltas,
        degree_deltas_available_now,
        read_running_degrees,
    )

    tr_dir = str(tmp_path / "tr")
    root = str(tmp_path / "deg_log")
    ckpt = str(tmp_path / "deg_ckpt")
    generate_transcripts(spark, 30, seed=8).write.mode("append").parquet(tr_dir)
    degree_deltas_available_now(spark, tr_dir, root, ckpt)
    assert compact_degree_deltas(spark, root) > 0
    # exactly one versioned manifest, no legacy file
    assert glob.glob(f"{root}/MANIFEST-*.json") == [f"{root}/MANIFEST-0.json"]
    assert not os.path.exists(f"{root}/MANIFEST.json")
    expected = read_running_degrees(spark, root).toPandas()
    expected = expected.set_index("src_conv")["out_deg"].to_dict()
    assert expected  # non-trivial

    # crash scenario: every manifest lost, base + GC'd live partitions remain
    os.remove(f"{root}/MANIFEST-0.json")
    assert _read_manifest(spark, root) == (None, -1)
    # GC must refuse to delete base generations on the no-manifest signal
    compact_degree_deltas(spark, root)
    assert os.path.isdir(f"{root}/base/gen=0")

    # a stale lower-numbered manifest beside a newer one: readers pick max
    with open(f"{root}/MANIFEST-0.json", "w") as fh:
        json.dump({"gen": 0, "folded_upto": -1}, fh)  # stale: nothing folded
    with open(f"{root}/MANIFEST-1.json", "w") as fh:
        json.dump({"gen": 0, "folded_upto": 10**9}, fh)  # current state
    assert _read_manifest(spark, root) == (0, 10**9)
    got = read_running_degrees(spark, root).toPandas()
    assert got.set_index("src_conv")["out_deg"].to_dict() == expected

    # legacy unversioned manifest alone still reads (upgrade path)
    os.remove(f"{root}/MANIFEST-0.json")
    os.remove(f"{root}/MANIFEST-1.json")
    with open(f"{root}/MANIFEST.json", "w") as fh:
        json.dump({"gen": 0, "folded_upto": 10**9}, fh)
    assert _read_manifest(spark, root) == (0, 10**9)
    # next compaction is a no-op fold (nothing live) but must GC the legacy
    # file only after writing a versioned replacement — here nothing fresh
    # exists, so the legacy file simply keeps working
    got2 = read_running_degrees(spark, root).toPandas()
    assert got2.set_index("src_conv")["out_deg"].to_dict() == expected
