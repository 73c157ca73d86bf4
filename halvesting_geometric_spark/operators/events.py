"""Event-stream analytics: sessionization, time-window aggregation, top-k.

General analytic operators a transcript/event corpus needs (SURVEY.md §2.5
notes the reference has no window functions — these are the engine's window
surface, used by the correctness gate with ANSI-SQL oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Classic lag + running-sum
    windows; deterministic order key (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ANSI mode forbids a direct ntz→long cast; ntz→timestamp is shift-free
    # under the pinned UTC session timezone
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Per-hour, per-type counts and value sums."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
    )


def top_k_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events per user by value (deterministic tie-break on event_id)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("user_id", "event_id", "value", F.col("rn").cast("long").alias("rn"))
    )
