"""Running vertex degrees over a growing transcripts table (engine-new).

The batch engine recomputes degrees from the full edge table; when
transcripts stream in at 10¹²-turn scale that rescan is the bottleneck, so
this maintains degree counts *incrementally* with the log-structured
merge-on-read pattern. Log layout under one root:

    <root>/live/batch_id=<N>/   per-micro-batch degree DELTAS (appended by
                                the stream; overwrite-per-batch → a retried
                                micro-batch replaces itself, so the
                                checkpointed file-source offsets give
                                exactly-once end to end)
    <root>/base/                the folded absolute counts from the last
                                compaction (absent until one runs)

Readers merge-on-read: one groupBy-sum over base ∪ live. Compaction folds
base + the live partitions present at its start into a new base and removes
exactly those folded partitions, so the stream can keep appending new batch
ids to live/ across compactions — batch ids never collide with base. On an
Iceberg catalog the same dataflow lands as MERGE INTO; the swap here uses
local-filesystem renames (same constraint as plans/checkpoint.py — the
manifest/swap layer is the part an object-store deployment replaces).

The reference is batch-only (SURVEY §2.10); no parity requirement.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from halvesting_geometric_spark.streaming.ingest import stream_conv_edges

_DELTA_SCHEMA = "src_conv string, out_deg_delta long"


def degree_deltas_available_now(
    spark: SparkSession,
    transcripts_path: str,
    log_root: str,
    checkpoint_dir: str,
) -> None:
    """Drain currently-available transcript files into the degree-delta log
    and stop (Trigger.AvailableNow). Re-running after new files land
    processes only the new files."""
    edges = stream_conv_edges(spark, transcripts_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy("src_conv").agg(
            F.count("*").alias("out_deg_delta")
        )
        # per-batch directory + overwrite = idempotent on micro-batch retry
        delta.write.mode("overwrite").parquet(
            f"{log_root}/live/batch_id={batch_id}"
        )

    q = (
        edges.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_log_part(spark: SparkSession, path: str) -> DataFrame | None:
    """One log directory as (src_conv, out_deg_delta); None if absent/empty.
    Only genuinely-missing paths read as None — other read failures raise."""
    if not os.path.isdir(path) or not os.listdir(path):
        return None
    # project away the discovered batch_id partition column so base (flat)
    # and live (partitioned) parts union cleanly
    return spark.read.schema(_DELTA_SCHEMA).parquet(path).select(
        "src_conv", "out_deg_delta"
    )


def read_running_degrees(spark: SparkSession, log_root: str) -> DataFrame:
    """Merge-on-read view of the delta log: (src_conv, out_deg). An absent
    or empty log reads as zero rows."""
    parts = [
        p
        for p in (
            _read_log_part(spark, f"{log_root}/base"),
            _read_log_part(spark, f"{log_root}/live"),
        )
        if p is not None
    ]
    if not parts:
        return spark.createDataFrame([], "src_conv string, out_deg long")
    log = parts[0]
    for p in parts[1:]:
        log = log.unionByName(p)
    return log.groupBy("src_conv").agg(
        F.sum("out_deg_delta").cast("long").alias("out_deg")
    )


def compact_degree_deltas(spark: SparkSession, log_root: str) -> int:
    """Fold base + the live partitions currently present into a new base and
    delete exactly those folded partitions. Returns the number of live
    partitions folded. Safe between drains (the AvailableNow pattern is
    caller-sequenced); a concurrent drain appending NEW batch ids is also
    safe — only partitions snapshotted here are removed.
    """
    live_dir = f"{log_root}/live"
    folded = sorted(
        d
        for d in (os.listdir(live_dir) if os.path.isdir(live_dir) else [])
        if d.startswith("batch_id=")
    )
    base = _read_log_part(spark, f"{log_root}/base")
    live_parts = [
        p
        for d in folded
        if (p := _read_log_part(spark, f"{live_dir}/{d}")) is not None
    ]
    merged = None
    for p in ([base] if base is not None else []) + live_parts:
        merged = p if merged is None else merged.unionByName(p)
    if merged is None:
        return 0
    folded_abs = merged.groupBy("src_conv").agg(
        F.sum("out_deg_delta").alias("out_deg_delta")
    )
    tmp = f"{log_root}/_base_tmp"
    folded_abs.write.mode("overwrite").parquet(tmp)
    # swap: tmp becomes base, then drop exactly the folded live partitions
    old = f"{log_root}/_base_old"
    if os.path.isdir(f"{log_root}/base"):
        os.replace(f"{log_root}/base", old)
    os.replace(tmp, f"{log_root}/base")
    if os.path.isdir(old):
        shutil.rmtree(old)
    for d in folded:
        shutil.rmtree(f"{live_dir}/{d}", ignore_errors=True)
    return len(folded)
