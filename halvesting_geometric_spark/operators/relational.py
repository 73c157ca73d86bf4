"""Relational OLAP surface: pivot, cube, exact percentiles, as-of join,
bucketized range join.

The reference has none of these (SURVEY.md §2.4: "no grouping sets / cube /
rollup"); they round out the engine into a general analytics surface over the
same tables, each with an ANSI-SQL oracle in the correctness gate. The two
join operators Spark lacks natively are built per the preferred order
(composition of built-in ops, no Python):

- **as-of join**: union both sides tagged, one ordered window per key,
  ``last(value, ignorenulls)`` carries the most recent right-side state to
  each left row — O(n log n) per key, one shuffle, no per-row Python and no
  cross product.
- **range join**: bucketize the range key to the window width, equi-join on
  (key, bucket±1), re-filter exactly — turns an inequality join into an
  equi-join with 3× candidate fan-out, which is the scalable shape (a naive
  theta join is a cross product per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Per-user event-type counts as fixed pivot columns."""
    out = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside Pivot
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def cube_value_sums(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, weekday): all grouping-set combinations.

    Grouping columns are coalesced to sentinels so the result is
    sentinel-stable across engines (NULL-vs-NaN comparison pitfalls avoided);
    weekday is numeric (1=Sunday..7) — locale-proof.
    """
    base = events.select(
        F.col("event_type"),
        F.dayofweek("ts").cast("long").alias("weekday"),
        F.col("value"),
    )
    cube = base.cube("event_type", "weekday").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("value_sum"),
    )
    return cube.select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce("weekday", F.lit(-1)).cast("long").alias("weekday"),
        F.col("n_events").cast("long").alias("n_events"),
        F.floor(F.col("value_sum") * 10_000 + F.lit(0.5)).cast("long").alias(
            "value_sum_e4"
        ),
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact linear-interpolated percentiles per event type (p50/p90/p99)."""
    return events.groupBy("event_type").agg(
        *[
            F.floor(
                F.expr(f"percentile(value, {q})") * 1_000_000 + F.lit(0.5)
            ).cast("long").alias(f"p{int(q * 100)}_e6")
            for q in (0.5, 0.9, 0.99)
        ]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "rate",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within ``key``. Right rows at the exact same
    timestamp DO match (tag ordering puts them first in the window)."""
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        value_col, F.lit(None).cast(right.schema[value_col].dataType)
    )
    r_tag = (
        right.select(key, ts_col, value_col)
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        value_col, F.last(value_col, ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_pair_counts(
    events: DataFrame, window_sec: int = 60
) -> DataFrame:
    """Per-user count of event pairs within ``window_sec`` of each other
    (a < b by event_id). Bucketized equi-join, exact re-filter."""
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    e = events.select(
        "user_id", F.col("event_id"), epoch.alias("sec")
    ).withColumn("bucket", F.floor(F.col("sec") / window_sec))
    l = e.select(
        "user_id",
        F.col("event_id").alias("a"),
        F.col("sec").alias("sa"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("bucket"),
    )
    r = e.select(
        "user_id",
        F.col("event_id").alias("b"),
        F.col("sec").alias("sb"),
        "bucket",
    )
    pairs = (
        l.join(r, ["user_id", "bucket"])
        .filter(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window_sec)
        )
        .select("user_id", "a", "b")
        .distinct()
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


def grouped_linregress(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS regression of y on x from exact integer sufficient
    statistics — one aggregation pass, engine-exact results.

    Engine-new analytic (the reference computes no regressions). Inputs
    must be integer-valued columns (cast upstream; e.g. turn index vs
    text length — "is this conversation's turn length trending up?").
    The five sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²) are long sums —
    order-free — and every output is either an integer division of longs
    or a single-expression IEEE ratio of exact integers, so Spark and a
    SQL oracle agree bit-for-bit:

    - ``slope_e6  = (num * 1e6) div denx`` where ``num = nΣxy − ΣxΣy``,
      ``denx = nΣx² − (Σx)²``; null when x is constant (denx == 0).
    - ``intercept_e6 ≡ (Σy·1e6 − slope_e6·Σx) div n`` — defined via the
      already-quantized slope so the arithmetic stays in long range.
    - ``r2_e6 = floor(double(num)²/(double(denx)·double(deny))·1e6+0.5)``;
      null when x or y is constant.

    Scale: a single groupBy shuffle with constant per-group state (six
    longs) — the same map-side-combine shape as any counting rollup.
    Overflow bound: |num| ≤ n·max|x|·max|y| must stay under 2^63/1e6 ≈
    9.2e12 — comfortably true for per-conversation or per-session series.
    """
    g = F.col(group_col)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    sums = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
        .withColumn("num", F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .withColumn("denx", F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .withColumn("deny", F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    slope = F.when(
        F.col("denx") > 0, F.expr("(num * 1000000) div denx")
    ).cast("long")
    return (
        sums.withColumn("slope_e6", slope)
        .withColumn(
            "intercept_e6",
            F.expr("(sy * 1000000 - slope_e6 * sx) div n").cast("long"),
        )
        .withColumn(
            "r2_e6",
            F.when(
                (F.col("denx") > 0) & (F.col("deny") > 0),
                F.floor(
                    F.col("num").cast("double")
                    * F.col("num").cast("double")
                    / (
                        F.col("denx").cast("double")
                        * F.col("deny").cast("double")
                    )
                    * 1_000_000
                    + F.lit(0.5)
                ),
            ).cast("long"),
        )
        .select(group_col, "n", "slope_e6", "intercept_e6", "r2_e6")
    )


def rank_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group rank normalization (quantile transform) to [0, 1] in e6
    fixed point — the scale-free feature-engineering primitive that makes
    heterogeneous metrics comparable before mixing or thresholding.

    ``pct_e6 = (rank − 1)·1e6 div (n − 1)`` with ``rank`` = SQL RANK()
    (ties share the min rank, deterministic in any engine), 0 for
    single-row groups. One rank window per group + a broadcastable
    per-group count join; exact integers end to end. Null values are
    dropped (they have no rank).
    """
    rows = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(value_col)
    n = rows.groupBy(group_col).agg(F.count("*").cast("long").alias("_n"))
    return (
        rows.withColumn("_rank", F.rank().over(w).cast("long"))
        .join(F.broadcast(n), group_col)
        .withColumn(
            "pct_e6",
            F.when(F.col("_n") > 1,
                   F.expr("((_rank - 1) * 1000000) div (_n - 1)"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("_rank", "_n")
    )
