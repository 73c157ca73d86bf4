"""Temporal graph analytics: how the citation graph evolves over time.

Engine-new (the reference is a static snapshot pipeline): every extracted
reference carries the turn's event time, so the edge stream is a timeline.
These operators bucket it and answer the monitoring questions a growing
10^12-turn corpus raises — is the reference graph densifying, which
conversations are gaining citations, what does a conversation's
out-degree look like week over week.

All pure DataFrame expressions (``date_trunc`` buckets, one groupBy, one
running-sum window partitioned per source — sort-based, spillable), so
the plans are the same shape as any rollup: partial aggregation map-side,
shuffle once on (vertex, bucket). Deterministic, fully SQL-twinnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import extract_refs


def edge_events(transcripts: DataFrame) -> DataFrame:
    """(src_conv, dst_conv, ts) per reference OCCURRENCE (not deduped) —
    the timestamped edge stream under every temporal rollup."""
    return (
        transcripts.filter(
            F.col("text").isNotNull() & F.col("text").contains("[[ref:")
        ).select(
            F.col("conv_id").alias("src_conv"),
            F.explode(extract_refs(F.col("text"))).alias("dst_conv"),
            F.col("ts"),
        )
    )


def degree_evolution(
    transcripts: DataFrame, bucket: str = "day"
) -> DataFrame:
    """Per (src_conv, time bucket): reference activity and its running total.

    Returns (src_conv, bucket_start, n_refs, n_distinct_dst, cum_refs)
    where ``cum_refs`` is the running sum of ``n_refs`` over the
    conversation's buckets in time order — the conversation's citation
    out-activity curve. ``bucket`` is any ``date_trunc`` unit.
    """
    ev = edge_events(transcripts)
    per_bucket = (
        ev.withColumn("bucket_start", F.date_trunc(bucket, F.col("ts")))
        .groupBy("src_conv", "bucket_start")
        .agg(
            F.count("*").cast("long").alias("n_refs"),
            F.count_distinct("dst_conv").cast("long").alias("n_distinct_dst"),
        )
    )
    w = (
        Window.partitionBy("src_conv")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_bucket.withColumn(
        "cum_refs", F.sum("n_refs").over(w).cast("long")
    )


def graph_growth(transcripts: DataFrame, bucket: str = "day") -> DataFrame:
    """Whole-graph densification curve: per bucket, new edge occurrences,
    distinct active sources, and the running total of occurrences.
    Returns (bucket_start, n_refs, n_active_src, cum_refs)."""
    ev = edge_events(transcripts)
    per_bucket = (
        ev.withColumn("bucket_start", F.date_trunc(bucket, F.col("ts")))
        .groupBy("bucket_start")
        .agg(
            F.count("*").cast("long").alias("n_refs"),
            F.count_distinct("src_conv").cast("long").alias("n_active_src"),
        )
    )
    w = (
        Window.orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_bucket.withColumn(
        "cum_refs", F.sum("n_refs").over(w).cast("long")
    )
