"""Distributed 2-D skyline (Pareto frontier) over a DataFrame.

A row p survives iff no other row q dominates it:
``q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y)`` (maximize both).
Identical duplicate points do not dominate each other — all copies survive.

Scale shape (no all-pairs join, no global sort):

1. ``repartitionByRange`` on x — Spark's RangePartitioner puts equal keys in
   one partition and orders partitions by key range, so for partitions
   i < j every x in j is strictly greater than every x in i;
2. ``sortWithinPartitions(x DESC, y DESC)`` + one Arrow ``mapInPandas``
   streaming pass computes each partition's LOCAL skyline with O(1) carry
   state (group-max y per x tie-group, running strict max y) — the classic
   sorted-scan skyline, vectorized per batch;
3. the cross-partition fix-up needs only each partition's max y (provably
   present among its local survivors): a bounded ``#partitions``-row
   aggregate becomes a suffix-max table that is broadcast-joined back, and
   a survivor of partition i is global iff ``y > max(y of partitions > i)``.

Local-skyline output is a tiny fraction of the input for non-adversarial
data, so steps 2-3 touch the full table exactly once. At 100 TB the only
shuffle is the range partition; everything after is map-side plus a
broadcast of one row per partition.

Reference parity note: the reference engine has no skyline operator; this is
part of the training-data-pipeline surface (dominance-based corpus pruning,
e.g. keep documents not dominated on (length, quality)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["skyline2"]


def skyline2(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows on the 2-D maximize-both Pareto frontier of (x_col, y_col).

    All other columns are carried through unchanged. Rows with a null in
    either coordinate are excluded (null never dominates and is never on
    the frontier). Output schema == input schema; order unspecified.
    """
    if x_col not in df.columns or y_col not in df.columns:
        raise ValueError(f"columns {x_col!r}/{y_col!r} not in {df.columns}")
    pts = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        pts.repartitionByRange(n_parts, F.col(x_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .sortWithinPartitions(F.col(x_col).desc(), F.col(y_col).desc())
    )
    out_schema = ranged.schema

    def local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # O(1) carry across batches: the open x tie-group's value and max y
        # (its first row under the DESC,DESC sort), and the strict max y over
        # all closed (greater-x) groups. Whole-batch numpy in the column's
        # native dtype — no per-row Python, no lossy float casts of int64.
        cur_x = None
        cur_max_y = None
        best_strict = None
        for pdf in batches:
            if pdf.empty:
                continue
            xs = pdf[x_col].to_numpy()
            ys = pdf[y_col].to_numpy()
            n = len(ys)
            lowest = (
                np.iinfo(ys.dtype).min
                if np.issubdtype(ys.dtype, np.integer)
                else -np.inf
            )
            is_new = np.ones(n, dtype=bool)
            if cur_x is not None:
                is_new[0] = xs[0] != cur_x
            is_new[1:] = xs[1:] != xs[:-1]
            g = np.cumsum(is_new)  # 0 = carried-over group, 1..K new groups
            k_groups = int(g[-1])
            gmax = np.empty(k_groups + 1, dtype=ys.dtype)
            gmax[0] = cur_max_y if cur_max_y is not None else lowest
            gmax[1:] = ys[is_new]  # first row of each group == its max
            pre = np.empty(k_groups + 1, dtype=ys.dtype)
            base = best_strict if best_strict is not None else lowest
            acc = np.maximum.accumulate(gmax)
            pre[0] = base
            if k_groups:
                pre[1:] = np.maximum(base, acc[:-1])
            # which groups actually have a strict upper bound to beat (guards
            # the `lowest` sentinel: a real y == sentinel must still survive)
            pre_valid = np.empty(k_groups + 1, dtype=bool)
            pre_valid[0] = best_strict is not None
            if k_groups:
                pre_valid[1] = best_strict is not None or cur_x is not None
            if k_groups > 1:
                pre_valid[2:] = True
            keep = (ys == gmax[g]) & (~pre_valid[g] | (ys > pre[g]))
            last = int(g[-1])
            cur_x = xs[-1]
            cur_max_y = gmax[last]
            if pre_valid[last]:
                best_strict = pre[last]
            out = pdf[keep]
            if not out.empty:
                yield out

    surv = ranged.mapInPandas(local_skyline, out_schema).persist()
    # bounded driver-side metadata: one (pid, max_y) row per partition —
    # the partition max y is always among its local survivors (the
    # highest-x point attaining it is undominated within the partition)
    pmax = {
        r["_pid"]: r["m"]
        for r in surv.groupBy("_pid").agg(F.max(y_col).alias("m")).collect()
    }
    spark = df.sparkSession
    rows, suffix = [], None
    for pid in sorted(pmax, reverse=True):
        if suffix is not None:
            rows.append((pid, suffix))
        suffix = max(suffix, pmax[pid]) if suffix is not None else pmax[pid]
    if rows:
        y_type = surv.schema[y_col].dataType
        bounds = spark.createDataFrame(
            [(int(p), b) for p, b in rows], f"_pid int, _bound {y_type.simpleString()}"
        )
        out = (
            surv.join(F.broadcast(bounds), "_pid", "left")
            .filter(F.col("_bound").isNull() | (F.col(y_col) > F.col("_bound")))
            .drop("_pid", "_bound")
        )
    else:
        out = surv.drop("_pid")
    # Pin the result, then drop the local-survivor cache so repeated calls
    # don't accumulate persisted tables in long sessions.
    out = out.localCheckpoint(eager=True)
    surv.unpersist()
    return out
