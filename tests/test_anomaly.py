from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.anomaly import (
    E6,
    cusum_changepoints,
    robust_anomalies,
)


def _type1_median(vals: np.ndarray) -> float:
    s = np.sort(vals)
    return float(s[int(np.floor((len(s) - 1) * 0.5))])


def test_robust_anomalies_matches_numpy_twin(spark):
    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.normal(10, 1, 200), [50.0, -40.0]])
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = robust_anomalies(df, "grp", "v", threshold=3.5).toPandas()

    med = _type1_median(vals)
    mad = _type1_median(np.abs(vals - med))
    rz = 0.6745 * (vals - med) / mad
    expect_flags = {i for i, z in enumerate(rz) if abs(np.floor(z * E6 + 0.5)) > 3.5 * E6}
    got_flags = set(out[out.is_anomaly].id)
    assert got_flags == expect_flags
    assert {200, 201} <= got_flags  # the injected outliers
    by_id = out.set_index("id")
    for i in (0, 100, 200, 201):
        assert by_id.loc[i, "rz_e6"] == int(np.floor(rz[i] * E6 + 0.5))
    assert (out.med == med).all()


def test_robust_anomalies_degenerate_mad_zero(spark):
    # >half the group ties at one value -> MAD == 0 -> rz null, never flagged
    rows = [("g", i, 5.0) for i in range(10)] + [("g", 10, 500.0)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = robust_anomalies(df, "grp", "v").toPandas()
    assert out.rz_e6.isna().all()
    assert (~out.is_anomaly).all()


def test_robust_anomalies_null_values_dropped(spark):
    rows = [("g", 0, 1.0), ("g", 1, None), ("g", 2, 2.0), ("g", 3, 3.0)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = robust_anomalies(df, "grp", "v").toPandas()
    assert set(out.id) == {0, 2, 3}


def _cusum_recursion(ns: list[int], ref_e6: int, slack_e6: int) -> list[int]:
    s, out = 0, []
    for n in ns:
        s = max(0, s + n * E6 - ref_e6 - slack_e6)
        out.append(s)
    return out


@pytest.mark.parametrize("slack", [0.0, 1.0])
def test_cusum_closed_form_equals_recursion(spark, slack):
    # two groups, a level shift in group a halfway through
    base = dt.datetime(2026, 1, 1)
    rows = []
    counts_a = [3, 2, 3, 4, 2, 9, 8, 10, 9, 11]
    counts_b = [5, 5, 4, 6, 5, 5, 6, 4, 5, 5]
    for g, counts in (("a", counts_a), ("b", counts_b)):
        for h, c in enumerate(counts):
            ts = base + dt.timedelta(hours=h)
            rows += [(g, ts, j) for j in range(c)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, j long")
    out = (
        cusum_changepoints(df, slack=slack, threshold=6.0)
        .orderBy("event_type", "bucket_ts")
        .toPandas()
    )
    slack_e6 = int(round(slack * E6))
    for g, counts in (("a", counts_a), ("b", counts_b)):
        ref_e6 = sum(counts) * E6 // len(counts)
        expect = _cusum_recursion(counts, ref_e6, slack_e6)
        got = list(out[out.event_type == g].cusum_e6)
        assert got == expect, g
        alarms = list(out[out.event_type == g].alarm)
        assert alarms == [s > 6 * E6 for s in expect]
    # the level shift in a must alarm; the stationary b must not
    assert out[out.event_type == "a"].alarm.any()
    assert not out[out.event_type == "b"].alarm.any()


def test_cusum_is_exact_integer(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [("g", base + dt.timedelta(hours=h), 0) for h in range(5)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, j long")
    out = cusum_changepoints(df).toPandas()
    assert str(out.cusum_e6.dtype) == "int64"
    assert (out.cusum_e6 == 0).all()  # constant-rate series never accumulates
