"""Watermarked event-time window rollups: late-data drop, append-mode
finalization, resume across drains, equality with batch aggregation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA
from halvesting_geometric_spark.streaming.windows import rollup_available_now


def _rows(spark, items):
    """items: (conv_id, hour_float) → transcripts-schema rows."""
    data = [
        (
            conv,
            i,
            "user",
            f"turn {i}",
            None,
            datetime(2026, 1, 1, int(h), int((h % 1) * 60)),
        )
        for i, (conv, h) in enumerate(items)
    ]
    return spark.createDataFrame(data, TRANSCRIPTS_SCHEMA)


def test_windowed_rollup_drops_late_and_matches_batch(spark, tmp_path):
    tr_dir = str(tmp_path / "tr")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: hours 0..3 → watermark after the run = 3h - 2h = 1h
    _rows(
        spark,
        [("a", 0.2), ("a", 0.5), ("b", 0.7), ("a", 2.0), ("b", 3.0)],
    ).write.mode("append").parquet(tr_dir)
    rollup_available_now(spark, tr_dir, out_dir, ckpt)

    # drain 2: a LATE row in hour 0 (behind the 1h watermark → dropped) plus
    # fresh data at hour 10 that advances the watermark to 8h
    _rows(spark, [("a", 0.9), ("c", 10.0)]).write.mode("append").parquet(tr_dir)
    rollup_available_now(spark, tr_dir, out_dir, ckpt)

    # drain 3: hour 20 → watermark 18h, finalizing every earlier window
    _rows(spark, [("c", 20.0)]).write.mode("append").parquet(tr_dir)
    rollup_available_now(spark, tr_dir, out_dir, ckpt)

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values(["window_start", "conv_id"])
        .reset_index(drop=True)
    )
    # the late ("a", 0.9) row must NOT be counted: hour-0 window for conv a
    # keeps exactly its 2 on-time turns
    h0a = got[
        (got["window_start"] == datetime(2026, 1, 1, 0)) & (got["conv_id"] == "a")
    ]
    assert len(h0a) == 1 and int(h0a["n_turns"].iloc[0]) == 2

    # every emitted (window, conv) row equals the batch aggregate over the
    # on-time rows, restricted to windows the final watermark (18h) finalized
    accepted = _rows(
        spark,
        [("a", 0.2), ("a", 0.5), ("b", 0.7), ("a", 2.0), ("b", 3.0), ("c", 10.0)],
    )
    exp = (
        accepted.groupBy(F.window("ts", "1 hour").alias("w"), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("role").alias("n_roles"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id",
            "n_turns",
            "n_roles",
        )
        .filter(F.col("window_end") <= F.lit(datetime(2026, 1, 1, 18)))
        .toPandas()
        .sort_values(["window_start", "conv_id"])
        .reset_index(drop=True)
    )
    assert got.equals(exp), f"\ngot:\n{got}\nexp:\n{exp}"


def test_session_windows_merge_and_finalize(spark, tmp_path):
    from halvesting_geometric_spark.streaming.windows import (
        sessions_available_now,
    )

    tr_dir = str(tmp_path / "str")
    out_dir = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    # conv a: turns at 0.0h, 0.25h (same session, gap 30m), then 2.0h (new
    # session); conv b: one turn. Hour-20 row advances the watermark far
    # enough to finalize everything.
    _rows(
        spark,
        [("a", 0.0), ("a", 0.25), ("a", 2.0), ("b", 1.0)],
    ).write.mode("append").parquet(tr_dir)
    sessions_available_now(spark, tr_dir, out_dir, ckpt)
    _rows(spark, [("c", 20.0)]).write.mode("append").parquet(tr_dir)
    sessions_available_now(spark, tr_dir, out_dir, ckpt)
    _rows(spark, [("c", 23.5)]).write.mode("append").parquet(tr_dir)
    sessions_available_now(spark, tr_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir).toPandas()
    a = got[got["conv_id"] == "a"].sort_values("session_start")
    assert list(a["n_turns"]) == [2, 1]
    # session end = last event + gap (session_window semantics)
    first = a.iloc[0]
    assert (first["session_end"] - first["session_start"]).total_seconds() == (
        15 * 60 + 30 * 60
    )
    assert list(got[got["conv_id"] == "b"]["n_turns"]) == [1]
