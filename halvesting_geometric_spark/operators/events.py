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


def burst_windows(
    events: DataFrame,
    trailing: int = 24,
    min_history: int = 6,
) -> DataFrame:
    """Event-rate burst detection: per (event_type, hour) z-score of the
    hourly count against the trailing ``trailing`` observed hours.

    The trailing window is ROW-based over *observed* hour buckets (hours with
    zero events are absent from the stream rollup, so they neither dilute the
    baseline nor emit rows) and EXCLUDES the current hour — the classic
    self-exclusive rolling baseline. Rows with fewer than ``min_history``
    trailing buckets, or a zero/undefined sample stddev, carry a null
    ``z`` (insufficient evidence), not a zero.

    Scale shape: one shuffle to (event_type, hour) for the rollup, then a
    per-type sort window whose partition size is bounded by the number of
    distinct hours (time, not data volume) — safe at any event count.
    Returns (event_type, hour, n, mean_prev, std_prev, z).
    """
    hourly = events.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-trailing, -1)
    )
    mean_prev = F.avg("n").over(w)
    std_prev = F.stddev_samp("n").over(w)
    hist = F.count("n").over(w)
    z = F.when(
        (hist >= min_history) & std_prev.isNotNull() & (std_prev > 0),
        (F.col("n") - mean_prev) / std_prev,
    )
    return hourly.select(
        "event_type",
        "hour",
        "n",
        mean_prev.alias("mean_prev"),
        std_prev.alias("std_prev"),
        z.alias("z"),
    )


def burstiness(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Goh–Barabási burstiness coefficient per group: B = (σ−μ)/(σ+μ)
    over inter-event gaps ("Burstiness and memory in complex systems",
    EPL 2008). B → −1 for periodic streams, 0 for Poisson, → +1 for
    extreme bursts — the signal that says whether a group's event stream
    needs burst-aware rate limits or watermarks.

    Gaps are exact integer milliseconds from one ordered window lag per
    group; μ and σ derive from three long sums (n, Σg, Σg²), so the only
    float arithmetic is the final single expression both engines evaluate
    identically (sqrt precedent: the bursts gate's stddev). Overflow
    bound: Σ(gap_ms²) must stay below 2^63 — gaps beyond ~30 days or
    billions of same-group events need coarser units.

    Returns (group, n_gaps, mean_ms, b_e6); b_e6 null when fewer than 2
    gaps or σ + μ == 0.
    """
    t_ms = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / 1000
    ).cast("long")
    g = (
        events.select(group_col, t_ms.alias("t"), order_tiebreak)
        .withColumn("gap", F.col("t") - F.lag("t").over(
            Window.partitionBy(group_col).orderBy("t", order_tiebreak)
        ))
        .filter(F.col("gap").isNotNull())
    )
    sums = g.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sg2"),
    )
    mu = F.col("sg").cast("double") / F.col("n_gaps")
    var = F.col("sg2").cast("double") / F.col("n_gaps") - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = (sigma - mu) / (sigma + mu)
    return sums.select(
        group_col,
        "n_gaps",
        F.expr("sg div n_gaps").cast("long").alias("mean_ms"),
        F.when(
            (F.col("n_gaps") >= 2) & (sigma + mu > 0),
            F.floor(b * 1_000_000 + F.lit(0.5)),
        ).cast("long").alias("b_e6"),
    )


def gap_memory(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Goh–Barabási memory coefficient per group: the Pearson correlation
    of consecutive inter-event gaps (g_i, g_{i+1}) — burstiness' companion
    statistic. M > 0 means long gaps follow long gaps (sessions, outages);
    M < 0 means alternation (retry storms); 0 is memoryless.

    Same exactness scheme as :func:`burstiness` and
    ``relational.grouped_linregress``, but over integer-SECOND gaps: the
    six moment products here carry an extra factor of n versus
    burstiness' sums, so ms granularity overflows long at realistic
    spans, while seconds keep ``n·Σab`` far inside range — and Pearson is
    unit-free, so the coarser unit only quantizes, never rescales.
    Returns (group, n_pairs, m_e6); null with fewer than 2 gap pairs or a
    constant gap sequence.
    """
    t_s = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy("t", order_tiebreak)
    g = (
        events.select(group_col, t_s.alias("t"), order_tiebreak)
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .filter(F.col("gap").isNotNull())
    )
    w2 = Window.partitionBy(group_col).orderBy("t", order_tiebreak)
    pairs = (
        g.withColumn("nxt", F.lead("gap").over(w2))
        .filter(F.col("nxt").isNotNull())
        .select(group_col, F.col("gap").alias("a"), F.col("nxt").alias("b"))
    )
    sums = pairs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast(
        "double"
    )
    da = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast(
        "double"
    )
    db = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast(
        "double"
    )
    m = num / (F.sqrt(da) * F.sqrt(db))
    return sums.select(
        group_col,
        F.col("n").alias("n_pairs"),
        F.when(
            (F.col("n") >= 2) & (da > 0) & (db > 0),
            F.floor(m * 1_000_000 + F.lit(0.5)),
        ).cast("long").alias("m_e6"),
    )


def decayed_counts(
    events: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    halflife_hours: float = 168.0,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Exponential time-decay activity score per group — the standard
    "hotness" aggregate (an event ``halflife_hours`` old counts half):
    ``score = sum_e 2^(-age_e / halflife)`` with ages bucketed to
    ``bucket_seconds`` so the decay weight is computed once PER DISTINCT
    AGE BUCKET (bounded by the time span) and quantized to an e9 BIGINT —
    the per-group score is then an exact decimal sum of
    ``count * weight``, order-free across engines (the
    evalmetrics.dcg_discounts precedent).

    The reference epoch is ``max(ts)`` over the input (deterministic, no
    wall clock). Scale: one groupBy to (group, age-bucket) counts, one
    map-side-combined sum per group; the weight is a scalar expression,
    no join against a weight table needed.

    Returns ``(group_col, score_e9, n_events)``.
    """
    tmax = events.agg(
        F.max(F.unix_timestamp(F.col(ts_col)).cast("long"))
    ).first()[0]
    if tmax is None:
        # empty input (or all-NULL timestamps): no reference epoch —
        # return an empty result with the documented schema, like the
        # sibling empty-safe operators, instead of TypeError on lit(None)
        return (
            events.select(F.col(group_col))
            .limit(0)
            .select(
                group_col,
                F.lit(None).cast("long").alias("score_e9"),
                F.lit(None).cast("long").alias("n_events"),
            )
        )
    per = (
        events.select(
            F.col(group_col),
            F.floor(
                (
                    F.lit(int(tmax))
                    - F.unix_timestamp(F.col(ts_col)).cast("long")
                )
                / F.lit(int(bucket_seconds))
            )
            .cast("long")
            .alias("_age"),
        )
        .groupBy(group_col, "_age")
        .agg(F.count("*").cast("long").alias("c"))
    )
    hl_buckets = halflife_hours * 3600.0 / float(bucket_seconds)
    w9 = F.floor(
        F.pow(
            F.lit(2.0),
            -(F.col("_age").cast("double") / F.lit(hl_buckets)),
        )
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    agg = per.groupBy(group_col).agg(
        F.sum(F.col("c").cast("decimal(38,0)") * w9).alias("_s"),
        F.sum("c").cast("long").alias("n_events"),
    )
    return agg.select(
        group_col,
        F.col("_s").cast("long").alias("score_e9"),
        "n_events",
    )
