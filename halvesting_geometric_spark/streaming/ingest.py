"""Incremental edge ingestion via Structured Streaming.

The reference is batch-only (SURVEY.md §2.10) — no parity requirement here.
This is the idiom the engine uses when the transcripts table grows
continuously: ``readStream`` over the transcripts directory/Iceberg table →
the same extraction expressions as batch (stateless, so watermarks aren't
needed) → append to the conv-edge table with ``Trigger.AvailableNow`` (drain
everything currently available, then stop — the resumable micro-batch pattern;
checkpointLocation makes re-runs exactly-once per file).

Graph algorithms stay batch over snapshots of the accumulated edge table —
iterative fixpoints don't stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import extract_refs
from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA


def stream_conv_edges(
    spark: SparkSession,
    transcripts_path: str,
    drop_self: bool = False,
) -> DataFrame:
    """Streaming DataFrame of (src_conv, dst_conv, ts) from a growing
    transcripts directory. Dedupe is deferred to the batch consumer
    (`dropDuplicates` over an unbounded stream needs state + watermark;
    the edge table is compacted at algorithm time instead)."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(transcripts_path)
    )
    edges = (
        stream.filter(F.col("text").isNotNull() & F.col("text").contains("[[ref:"))
        .select(
            F.col("conv_id").alias("src_conv"),
            F.explode(extract_refs(F.col("text"))).alias("dst_conv"),
            F.col("ts"),
        )
    )
    if drop_self:
        edges = edges.filter(F.col("src_conv") != F.col("dst_conv"))
    return edges


def ingest_available_now(
    spark: SparkSession,
    transcripts_path: str,
    edges_out: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available transcript files into the edge table and
    stop. Re-running after new files land appends only the new extractions
    (file-source offsets live in the checkpoint)."""
    edges = stream_conv_edges(spark, transcripts_path)
    q = (
        edges.writeStream.format("parquet")
        .option("path", edges_out)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_edges(spark: SparkSession, edges_path: str) -> DataFrame:
    """Batch-side dedupe of the streamed edge log → algorithm-ready edges."""
    return (
        spark.read.parquet(edges_path)
        .select("src_conv", "dst_conv")
        .dropDuplicates(["src_conv", "dst_conv"])
    )
