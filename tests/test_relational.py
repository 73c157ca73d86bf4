"""Relational OLAP operators vs pandas oracles (as-of semantics, range join,
pivot/cube consistency)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.relational import (
    asof_join,
    cube_value_sums,
    pivot_event_counts,
    range_join_pair_counts,
)


def _events(spark, sf="0.001"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/events.parquet")


def test_asof_join_matches_merge_asof(spark):
    ev = _events(spark)
    rates = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("value").alias("rate")
    )
    left = ev.select("event_id", "user_id", "ts")
    got = (
        asof_join(left, rates, key="user_id")
        .select("event_id", "rate")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = rates.toPandas().sort_values("ts")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward"
    ).sort_values("event_id").reset_index(drop=True)
    assert (got["event_id"] == exp["event_id"]).all()
    np.testing.assert_allclose(
        got["rate"].to_numpy(), exp["rate"].to_numpy(), equal_nan=True
    )


def test_range_pairs_matches_bruteforce(spark):
    ev = _events(spark)
    got = range_join_pair_counts(ev, 60).toPandas().set_index("user_id")["n_pairs"]
    pdf = ev.select("user_id", "event_id", "ts").toPandas()
    pdf["sec"] = (pdf["ts"].astype("int64") // 10**9)
    exp: dict[int, int] = {}
    for uid, grp in pdf.groupby("user_id"):
        s = grp.sort_values("event_id")
        sec = s["sec"].to_numpy()
        n = 0
        for i in range(len(sec)):
            n += int((np.abs(sec[i + 1 :] - sec[i]) <= 60).sum())
        if n:
            exp[uid] = n
    assert got.to_dict() == exp


def test_pivot_row_sums_equal_totals(spark):
    ev = _events(spark)
    piv = pivot_event_counts(ev).toPandas()
    total = piv[[c for c in piv.columns if c.startswith("n_")]].to_numpy().sum()
    assert total == ev.count()


def test_cube_grand_total_row(spark):
    ev = _events(spark)
    cube = cube_value_sums(ev).toPandas()
    grand = cube[(cube.event_type == "ALL") & (cube.weekday == -1)]
    assert len(grand) == 1
    assert grand.iloc[0]["n_events"] == ev.count()


def test_rank_normalize_exact_with_ties(spark):
    from halvesting_geometric_spark.operators.relational import rank_normalize

    rows = [("g", 0, 10.0), ("g", 1, 20.0), ("g", 2, 20.0), ("g", 3, 40.0),
            ("g", 4, None), ("solo", 9, 5.0)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = {r.id: r.pct_e6 for r in rank_normalize(df, "grp", "v").collect()}
    # ranks: 10->1, 20->2 (both), 40->4; n=4 -> pct = (r-1)*1e6 // 3
    assert out[0] == 0
    assert out[1] == out[2] == 1_000_000 // 3
    assert out[3] == 1_000_000
    assert 4 not in out  # null dropped
    assert out[9] == 0  # single-row group
