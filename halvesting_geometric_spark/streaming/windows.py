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


def session_turn_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based conversation sessions over the turn stream: a session is a
    maximal run of a conversation's turns with < ``gap`` between
    consecutive event times (``F.session_window`` — Spark's native dynamic
    session state, merged incrementally as turns arrive, finalized when
    the watermark passes the session end + gap). The streaming upgrade of
    the batch ``sessionize`` gate. Returns
    (session_start, session_end, conv_id, n_turns).

    Scale: state is one open session per active conversation (merged
    in-place; closed sessions evicted at the watermark) — O(active convs),
    not O(turns)."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
    )
    return agg.select(
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        "conv_id",
        "n_turns",
    )


def sessions_available_now(
    spark: SparkSession,
    transcripts_path: str,
    out_path: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    """Drain available transcript files into the session table and stop —
    same exactly-once AvailableNow contract as ``rollup_available_now``."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(transcripts_path)
    )
    sessions = session_turn_counts(stream, gap, watermark)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
