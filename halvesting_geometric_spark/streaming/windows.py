"""Watermarked event-time window aggregation over streaming transcripts.

Completes the streaming triad (ingest → stateful dedup → windowed rollup):
the batch ``hourly_rollup`` re-expressed for unbounded input. Late turns are
absorbed up to the watermark; rows later than that are dropped by the engine
— state for a window is finalized (and, in ``append`` mode, emitted exactly
once) when the watermark passes its end.

Scale notes (100 TB story):
- State is per (window, conv) group key, bounded by the watermark horizon —
  Spark evicts finalized windows, so state size is O(active windows ×
  active conversations), not O(history).
- The aggregate is a plain hash aggregate under the hood (partial map-side
  combine applies); no Python in the path.
- ``Trigger.AvailableNow`` + checkpointLocation gives resumable,
  exactly-once-per-file drains, same as the ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA


def windowed_turn_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(event-time window, conv_id) turn counts + distinct-role count
    over a streaming transcripts DataFrame. Returns
    (window_start, window_end, conv_id, n_turns, n_roles).
    """
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("role").alias("n_roles"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "conv_id",
        "n_turns",
        "n_roles",
    )


def rollup_available_now(
    spark: SparkSession,
    transcripts_path: str,
    out_path: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain currently-available transcript files into the windowed rollup
    table and stop. ``append`` mode: a window's row is written only once the
    watermark has passed its end — re-running after new files land continues
    from the checkpointed offsets and state."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(transcripts_path)
    )
    counts = windowed_turn_counts(stream, window_duration, watermark)
    q = (
        counts.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
