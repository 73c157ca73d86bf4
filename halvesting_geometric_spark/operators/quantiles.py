"""Exact per-group quantiles without a per-row sort.

Engine-new analytic surface (the reference computes no distribution
statistics; its closest shape is the per-domain counting in
``/root/reference/halvesting_geometric/utils/data/link_prediction_metadata.py``'s
metadata rollups). A 100 TB corpus question — "what is the p99 token count
per language?" — must not sort every row: this operator aggregates to
(group, value) counts first, so the window that locates the quantile rank
runs over DISTINCT VALUES per group (bounded by value cardinality, e.g.
document lengths), not over rows.

Quantile definition: type-1 / lower empirical quantile — the value at rank
``floor((n - 1) * p) + 1`` in ascending order (1-based). No interpolation,
so results are exact, engine-portable (the DuckDB oracle reproduces it with
the same rank arithmetic), and hash-stable for integer inputs.

Two phases, both plain shuffles Catalyst plans freely:
1. groupBy (group, value) -> count   (map-side partial agg does the heavy lift)
2. running sum over values within each group locates each requested rank.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact type-1 quantiles of ``value_col`` per ``group_col``.

    Returns one row per group: (group_col, n, q_<p> ...) where column
    ``q_50`` is the p=0.5 quantile etc. (p is rendered as an integer
    percent — callers needing finer ps get ``q_<p*100 rounded>``).
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    vc = (
        df.select(group_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    cum = vc.select(
        group_col,
        value_col,
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for p in ps:
        rank = F.floor((F.col("n") - F.lit(1)) * F.lit(float(p))) + F.lit(1)
        label = f"q_{int(round(p * 100))}"
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col(value_col))).alias(label)
        )
    return cum.groupBy(group_col).agg(*aggs)


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact weighted type-1 quantiles per group: the smallest value
    whose cumulative INTEGER weight reaches ``ceil(p * W)`` — the
    token-weighted percentile a data-mixing pipeline needs ("the median
    document BY TOKEN MASS", not by document count).

    Weights must be non-negative integers (cast enforced; pre-scale
    fractional weights to fixed point). Same cardinality-bounded shape
    as :func:`group_quantiles`: one shuffle to (group, value) weight
    sums, per-group windows over distinct values. Rank arithmetic is
    exact decimal/BIGINT; the only float is the ``p * W`` product,
    identical cross-engine.

    Returns one row per group: ``(group_col, w_total, q_<p> ...)``.
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    vc = (
        df.select(
            group_col,
            value_col,
            F.col(weight_col).cast("long").alias("_w"),
        )
        .filter(F.col(value_col).isNotNull() & (F.col("_w") > 0))
        .groupBy(group_col, value_col)
        .agg(F.sum("_w").alias("c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    cum = vc.select(
        group_col,
        value_col,
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wall).alias("w_total"),
    )
    aggs = [F.max("w_total").alias("w_total")]
    for p in ps:
        rank = F.ceil(
            F.col("w_total").cast("double") * F.lit(float(p))
        ).cast("long")
        label = f"q_{int(round(p * 100))}"
        aggs.append(
            F.min(
                F.when(F.col("cum") >= rank, F.col(value_col))
            ).alias(label)
        )
    return cum.groupBy(group_col).agg(*aggs)
