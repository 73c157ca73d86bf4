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
