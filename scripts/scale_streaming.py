"""Streaming drift-monitor scale run.

10M synthetic events drain through the watermarked per-window value
histogram (Trigger.AvailableNow, append-once), then an incremental 2M
drain measures the marginal batch cost, and the finalized windows are
KS-scored against a reference histogram. Evidence for the streaming
contract at volume: state is (window x distinct value)-bounded, the
second drain's cost tracks its delta, and the scorer touches only the
finalized histogram rows (never raw events).

Usage: python scripts/scale_streaming.py
Writes BENCH/raw/scale_streaming_10m.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.streaming.drift import (
    hist_available_now,
    ks_vs_reference,
)

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_streaming")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

base = tempfile.mkdtemp(prefix="scale_stream_")
src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
results: dict = {}


def gen(n: int, t0: int, span_s: int, seed: int):
    return spark.range(n).select(
        F.col("id"),
        (
            F.lit(t0) + F.pmod(F.xxhash64("id", F.lit(seed)), span_s)
        )
        .cast("timestamp")
        .alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), 10_000)
        .cast("double")
        .alias("value"),
    ).drop("id")


T0 = 1_780_000_000
# 10M events across ~28 hours of event time
gen(10_000_000, T0, 100_000, 1).write.mode("append").parquet(src)
t = time.monotonic()
hist_available_now(spark, src, out, ckpt, SCHEMA)
w1 = round(time.monotonic() - t, 2)
rows1 = spark.read.parquet(out).count()
results["drain_10m"] = {
    "wall_s": w1,
    "hist_rows": rows1,
    "events_per_s": int(10_000_000 / w1),
}
print("drain_10m", results["drain_10m"], flush=True)

# incremental 2M drain, later event time (advances the watermark)
gen(2_000_000, T0 + 100_000, 30_000, 7).write.mode("append").parquet(src)
t = time.monotonic()
hist_available_now(spark, src, out, ckpt, SCHEMA)
w2 = round(time.monotonic() - t, 2)
rows2 = spark.read.parquet(out).count()
results["drain_2m_incremental"] = {
    "wall_s": w2,
    "hist_rows_total": rows2,
    "events_per_s": int(2_000_000 / w2),
}
print("drain_2m_incremental", results["drain_2m_incremental"], flush=True)

# KS-score every finalized window against a uniform reference histogram
ref = spark.range(10_000).select(
    F.col("id").alias("v"), F.lit(100).alias("c")
)
t = time.monotonic()
scored = ks_vs_reference(spark.read.parquet(out), ref)
n_windows = scored.count()
w3 = round(time.monotonic() - t, 2)
results["ks_score_windows"] = {
    "wall_s": w3,
    "windows": n_windows,
    "max_d_e6": scored.agg(F.max("d_e6")).first()[0],
}
print("ks_score_windows", results["ks_score_windows"], flush=True)

with open("BENCH/raw/scale_streaming_10m.json", "w") as f:
    json.dump(results, f, indent=1)
print("WROTE BENCH/raw/scale_streaming_10m.json")
shutil.rmtree(base, ignore_errors=True)
spark.stop()
