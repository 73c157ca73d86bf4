"""Streaming drift monitor: windowed histograms finalize once, and the
KS-vs-reference scorer agrees exactly with the batch two_sample_ks."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from halvesting_geometric_spark.operators.stats import two_sample_ks
from halvesting_geometric_spark.streaming.drift import (
    hist_available_now,
    ks_vs_reference,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(spark, items):
    data = [
        (datetime(2026, 1, 1, int(h), int((h % 1) * 60)), float(v))
        for h, v in items
    ]
    return spark.createDataFrame(data, EVENTS_SCHEMA)


def _ref(spark, counts):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in counts.items()], "v long, c long"
    )


def test_drift_matches_batch_ks(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / d) for d in ("src", "out", "ckpt")
    )
    # hour-0 window data, plus an hour-9 row to push the watermark past it
    win_vals = [3, 3, 5, 7, 7, 7, 9]
    _rows(
        spark, [(0.2, v) for v in win_vals] + [(9.0, 1)]
    ).write.mode("append").parquet(src)
    hist_available_now(spark, src, out, ckpt, EVENTS_SCHEMA)

    ref_counts = {3: 2, 4: 1, 7: 1, 11: 2}
    got = ks_vs_reference(
        spark.read.parquet(out), _ref(spark, ref_counts)
    ).collect()
    finalized = [r for r in got if r.window_start.hour == 0]
    assert len(finalized) == 1
    r = finalized[0]

    # same comparison through the batch operator
    rows = [(v, "W") for v in win_vals] + [
        (v, "R") for v, c in ref_counts.items() for _ in range(c)
    ]
    batch = two_sample_ks(
        spark.createDataFrame(rows, "v int, g string"), "v", "g", "W", "R"
    ).first()
    assert (r.d_e6, r.n_win, r.n_ref) == (
        batch.d_e6,
        batch.n_a,
        batch.n_b,
    )


def test_drift_window_emits_once_and_drops_late(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / d) for d in ("src", "out", "ckpt")
    )
    _rows(spark, [(0.2, 5), (0.4, 5), (9.0, 1)]).write.mode(
        "append"
    ).parquet(src)
    hist_available_now(spark, src, out, ckpt, EVENTS_SCHEMA)

    # late hour-0 row (watermark is 9h - 2h = 7h) must be dropped; fresh
    # hour-20 row finalizes the hour-9 window
    _rows(spark, [(0.5, 5), (20.0, 2)]).write.mode("append").parquet(src)
    hist_available_now(spark, src, out, ckpt, EVENTS_SCHEMA)

    hist = spark.read.parquet(out)
    h0 = [r for r in hist.collect() if r.window_start.hour == 0]
    assert len(h0) == 1 and (h0[0].v, h0[0].c) == (5, 2)

    scored = {
        r.window_start.hour: r
        for r in ks_vs_reference(hist, _ref(spark, {5: 1})).collect()
    }
    # identical distribution -> zero drift; disjoint support -> max drift
    assert scored[0].d_e6 == 0
    assert scored[9].d_e6 == 1_000_000


def test_chi2_drift_matches_batch_chi2(spark):
    from halvesting_geometric_spark.operators.stats import chi2_independence
    from halvesting_geometric_spark.streaming.drift import chi2_vs_reference

    win_counts = {"click": 30, "view": 10, "error": 5}
    ref_counts = {"click": 20, "view": 25, "purchase": 3}
    win = spark.createDataFrame(
        [
            (datetime(2026, 1, 1), datetime(2026, 1, 1, 1), k, c)
            for k, c in win_counts.items()
        ],
        "window_start timestamp, window_end timestamp, k string, c long",
    )
    ref = spark.createDataFrame(
        list(ref_counts.items()), "k string, c long"
    )
    r = chi2_vs_reference(win, ref).first()

    # same 2xK table through the batch operator on exploded rows
    rows = [(k, "W") for k, c in win_counts.items() for _ in range(c)] + [
        (k, "R") for k, c in ref_counts.items() for _ in range(c)
    ]
    batch = chi2_independence(
        spark.createDataFrame(rows, "k string, g string"), "k", "g"
    ).first()
    assert r.chi2_e6 == batch.chi2_e6
    assert r.dof == batch.dof
    assert (r.n_win, r.n_ref) == (45, 48)


def test_chi2_drift_identical_distribution_is_zero(spark):
    from halvesting_geometric_spark.streaming.drift import chi2_vs_reference

    counts = {"a": 10, "b": 20}
    win = spark.createDataFrame(
        [
            (datetime(2026, 1, 1), datetime(2026, 1, 1, 1), k, c)
            for k, c in counts.items()
        ],
        "window_start timestamp, window_end timestamp, k string, c long",
    )
    ref = spark.createDataFrame(list(counts.items()), "k string, c long")
    assert chi2_vs_reference(win, ref).first().chi2_e6 == 0
