"""Distribution-drift monitoring over streaming events.

Engine-new: the streaming counterpart of operators/stats.two_sample_ks.
A pipeline ingesting transcripts/events continuously needs to know when
a feature's distribution walks away from the training-time baseline
(scrape source changed, a bot cohort arrived, an upstream schema bug
truncated values). Two stages, each with a bounded-state story:

1. **Streaming histogram** (:func:`windowed_value_hist`): watermarked
   per-(event-time window, distinct value) counts in append mode —
   state is O(active windows x value cardinality), finalized exactly
   once when the watermark passes the window end (same contract as
   streaming/windows.py).
2. **Batch KS scoring** (:func:`ks_vs_reference`): finalized window
   histograms against a small reference histogram (broadcast), with the
   same exact cross-multiplied integer ECDF max as the batch operator —
   ``D = max |cum_w * n_ref - cum_ref * n_w| / (n_w * n_ref)`` in e6.

The split is deliberate: KS needs the window's complete histogram, so
scoring belongs after watermark finalization, not inside the streaming
aggregate — the stream does the unbounded-input reduction, the scorer is
a cheap per-window window-function pass (per-window cardinality-bounded
partitions, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

E6 = 1_000_000

__all__ = [
    "windowed_value_hist",
    "windowed_category_hist",
    "hist_available_now",
    "ks_vs_reference",
    "chi2_vs_reference",
]


def windowed_value_hist(
    stream: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(event-time window, distinct value) counts over a stream.

    Values are binned to BIGINT with ``floor(value + 0.5)`` (callers
    pre-scale floats to fixed point, as everywhere in the engine).
    Returns (window_start, window_end, v, c) — append-mode compatible:
    a window's rows emit exactly once, after the watermark passes.
    """
    agg = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.floor(F.col(value_col) + F.lit(0.5))
            .cast("long")
            .alias("v"),
        )
        .groupBy(F.window(ts_col, window_duration).alias("w"), "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "v",
        "c",
    )


def hist_available_now(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    value_col: str = "value",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain ``src_dir`` parquet through the windowed histogram with
    ``Trigger.AvailableNow`` into ``out_dir`` (append mode, resumable
    via ``checkpoint_dir`` — same drain contract as streaming ingest)."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    hist = windowed_value_hist(
        stream, value_col, ts_col, window_duration, watermark
    )
    (
        hist.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def ks_vs_reference(
    win_hist: DataFrame, ref_hist: DataFrame
) -> DataFrame:
    """Exact KS distance of each finalized window vs a reference
    histogram.

    ``win_hist``: (window_start, window_end, v, c) from
    :func:`windowed_value_hist`. ``ref_hist``: (v, c) — the baseline
    distribution, small enough to broadcast (it is a histogram of a
    feature, not a row table).

    Exactness matches stats.two_sample_ks: per-window inclusive prefix
    counts over the UNION of observed and reference values, cross-
    multiplied integer max, one scalar division to e6. Per-window
    partitioned windows — state bounded by per-window value cardinality.

    Returns (window_start, window_end, d_e6, n_win, n_ref).
    """
    ref = ref_hist.select(
        F.col("v").cast("long").alias("v"),
        F.col("c").cast("long").alias("cr"),
    )
    n_ref = ref.agg(F.sum("cr").cast("long")).first()[0] or 0
    wins = win_hist.select("window_start", "window_end").distinct()
    # reference support replicated per window (broadcast: histogram-sized)
    ref_per_win = wins.crossJoin(F.broadcast(ref))
    joined = ref_per_win.join(
        win_hist.withColumnRenamed("c", "cw"),
        ["window_start", "window_end", "v"],
        "full_outer",
    ).select(
        "window_start",
        "window_end",
        "v",
        F.coalesce("cw", F.lit(0)).alias("cw"),
        F.coalesce("cr", F.lit(0)).alias("cr"),
    )
    w = (
        Window.partitionBy("window_start", "window_end")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("window_start", "window_end")
    cum = joined.select(
        "window_start",
        "window_end",
        F.sum("cw").over(w).alias("cum_w"),
        F.sum("cr").over(w).alias("cum_r"),
        F.sum("cw").over(w_all).alias("tot_w"),
        "cw",
    )
    agg = cum.groupBy("window_start", "window_end").agg(
        F.max(
            F.abs(
                F.col("cum_w").cast("decimal(38,0)") * F.lit(int(n_ref))
                - F.col("cum_r").cast("decimal(38,0)") * F.col("tot_w")
            )
        ).alias("_num"),
        F.sum("cw").cast("long").alias("n_win"),
    )
    return agg.select(
        "window_start",
        "window_end",
        F.when(
            (F.col("n_win") > 0) & (F.lit(int(n_ref)) > 0),
            F.floor(
                F.col("_num").cast("double")
                * F.lit(float(E6))
                / (
                    F.col("n_win").cast("double")
                    * F.lit(float(n_ref))
                )
                + F.lit(0.5)
            ).cast("long"),
        ).alias("d_e6"),
        "n_win",
        F.lit(int(n_ref)).cast("long").alias("n_ref"),
    )


def windowed_category_hist(
    stream: DataFrame,
    cat_col: str = "event_type",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Categorical counterpart of :func:`windowed_value_hist`: per-
    (event-time window, category) counts, append-once after watermark.
    Returns (window_start, window_end, k, c)."""
    agg = (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.col(cat_col).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(F.window(ts_col, window_duration).alias("w"), "k")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "k",
        "c",
    )


def chi2_vs_reference(
    win_hist: DataFrame, ref_hist: DataFrame
) -> DataFrame:
    """Chi-square drift of each finalized window's categorical
    distribution vs a reference histogram — the categorical counterpart
    of :func:`ks_vs_reference` (language mix shifted? role balance
    moved? a bot's event types arrived?).

    Treats (window, reference) as a 2 x K contingency table over the
    UNION of categories and computes the independence statistic with the
    engine's per-cell e6 quantization (stats.chi2_independence math:
    ``floor(dbl(o*N - r*c)^2 / dbl(N*r*c) * 1e6 + 0.5)`` per cell,
    summed as longs). dof = K - 1.

    Returns (window_start, window_end, chi2_e6, dof, n_win, n_ref).
    """
    ref = ref_hist.select(
        F.col("k"), F.col("c").cast("long").alias("cr")
    )
    n_ref = ref.agg(F.sum("cr").cast("long")).first()[0] or 0
    wins = win_hist.select("window_start", "window_end").distinct()
    grid = (
        wins.crossJoin(F.broadcast(ref))
        .join(
            win_hist.withColumnRenamed("c", "cw"),
            ["window_start", "window_end", "k"],
            "full_outer",
        )
        .select(
            "window_start",
            "window_end",
            "k",
            F.coalesce("cw", F.lit(0)).alias("cw"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    w_all = Window.partitionBy("window_start", "window_end")
    g = grid.select(
        "window_start",
        "window_end",
        "cw",
        "cr",
        F.sum("cw").over(w_all).alias("n_win"),
    ).withColumn("n_ref", F.lit(int(n_ref)))

    def cell(o, row_tot):
        col_tot = F.col("cw") + F.col("cr")
        n_tot = F.col("n_win") + F.col("n_ref")
        num = (
            o.cast("decimal(38,0)") * n_tot
            - row_tot.cast("decimal(38,0)") * col_tot
        ).cast("double")
        den = (
            n_tot.cast("decimal(38,0)") * row_tot * col_tot
        ).cast("double")
        return F.when(
            (row_tot > 0) & (col_tot > 0),
            F.floor(num * num / den * E6 + F.lit(0.5)).cast("long"),
        ).otherwise(F.lit(0))

    per_cell = g.select(
        "window_start",
        "window_end",
        (
            cell(F.col("cw"), F.col("n_win"))
            + cell(F.col("cr"), F.col("n_ref"))
        ).alias("c6"),
        "n_win",
    )
    return per_cell.groupBy("window_start", "window_end").agg(
        F.sum("c6").alias("chi2_e6"),
        (F.count("*") - 1).cast("long").alias("dof"),
        F.max("n_win").cast("long").alias("n_win"),
        F.lit(int(n_ref)).cast("long").alias("n_ref"),
    )
