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

from pyspark.sql import Column, DataFrame, Window
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


def snapshot_diff(
    transcripts: DataFrame,
    t_old,
    t_new,
) -> DataFrame:
    """Edge-set delta between two time cutoffs of the reference graph.

    The graph at time ``t`` is the DISTINCT (src_conv, dst_conv) set over
    edge events with ``ts <= t``. Returns one row per edge that differs:
    (src_conv, dst_conv, status) with status ``'added'`` (present at
    ``t_new``, absent at ``t_old``) or ``'removed'`` (the reverse — empty on
    an append-only stream, kept for generality so the operator also serves
    retraction-bearing sources).

    ``t_old`` / ``t_new``: timestamp literals or Columns (e.g. a computed
    ``min(ts) + INTERVAL`` cutoff). Anti-joins on the two distinct edge
    sets — two shuffles on (src, dst), no window, no collect.
    """
    ev = edge_events(transcripts)
    t_old = F.lit(t_old) if not isinstance(t_old, Column) else t_old
    t_new = F.lit(t_new) if not isinstance(t_new, Column) else t_new
    old = ev.filter(F.col("ts") <= t_old).select("src_conv", "dst_conv").distinct()
    new = ev.filter(F.col("ts") <= t_new).select("src_conv", "dst_conv").distinct()
    added = new.join(old, ["src_conv", "dst_conv"], "left_anti").select(
        "src_conv", "dst_conv", F.lit("added").alias("status")
    )
    removed = old.join(new, ["src_conv", "dst_conv"], "left_anti").select(
        "src_conv", "dst_conv", F.lit("removed").alias("status")
    )
    return added.unionByName(removed)
