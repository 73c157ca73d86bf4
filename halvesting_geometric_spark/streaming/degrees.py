"""Running vertex degrees over a growing transcripts table (engine-new).

The batch engine recomputes degrees from the full edge table; when
transcripts stream in at 10¹²-turn scale that rescan is the bottleneck, so
this maintains degree counts *incrementally* with the log-structured
merge-on-read pattern:

- each micro-batch reduces to per-conversation degree DELTAS (a map-side
  combinable count — tiny compared to the batch);
- deltas append as a new parquet partition keyed by the micro-batch id,
  written with per-batch overwrite so a retried batch replaces itself
  instead of double-counting (idempotent ⇒ exactly-once end to end with the
  checkpointed file-source offsets);
- readers merge-on-read: one groupBy-sum over the delta log. Periodic
  compaction (`compact_degree_deltas`) folds the log back to one row per
  conversation — on an Iceberg catalog the same dataflow lands as a MERGE
  INTO, which is why deltas (not absolute counts) are what's persisted.

The reference is batch-only (SURVEY §2.10); no parity requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from halvesting_geometric_spark.streaming.ingest import stream_conv_edges

_DELTA_SCHEMA = "src_conv string, out_deg_delta long"


def degree_deltas_available_now(
    spark: SparkSession,
    transcripts_path: str,
    deltas_out: str,
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
            f"{deltas_out}/batch_id={batch_id}"
        )

    q = (
        edges.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_running_degrees(spark: SparkSession, deltas_path: str) -> DataFrame:
    """Merge-on-read view of the delta log: (src_conv, out_deg). An absent
    or empty log reads as zero rows rather than erroring."""
    try:
        log = spark.read.schema(_DELTA_SCHEMA).parquet(deltas_path)
    except AnalysisException:
        return spark.createDataFrame([], "src_conv string, out_deg long")
    return log.groupBy("src_conv").agg(
        F.sum("out_deg_delta").cast("long").alias("out_deg")
    )


def compact_degree_deltas(
    spark: SparkSession, deltas_path: str, compacted_out: str
) -> DataFrame:
    """Fold the delta log into one absolute row per conversation and write
    it as a fresh log generation (a single batch_id=compacted partition that
    later deltas keep appending after). Returns the compacted frame."""
    merged = read_running_degrees(spark, deltas_path).select(
        "src_conv", F.col("out_deg").alias("out_deg_delta")
    )
    merged.write.mode("overwrite").parquet(compacted_out)
    return spark.read.schema(_DELTA_SCHEMA).parquet(compacted_out)
