"""Z-order layout: Morton interleave correctness + the data-skipping payoff
(per-file min/max boxes bounded on EVERY clustered column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.layout import (
    cluster_by_zorder,
    zorder_sql,
    zorder_value,
)


def _py_morton(vals: tuple[int, ...], bits: int) -> int:
    d = len(vals)
    z = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * d + i)
    return z


def test_zorder_matches_python_interleave(spark):
    rows = [(x, y, w) for x in (0, 1, 5, 14, 15) for y in (0, 3, 15)
            for w in (0, 7)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    got = {
        (r["x"], r["y"], r["w"]): r["z"]
        for r in df.select(
            "x", "y", "w", zorder_value("x", "y", "w", bits=4).alias("z")
        ).collect()
    }
    for (x, y, w), z in got.items():
        assert z == _py_morton((x, y, w), 4)


def test_zorder_sql_twin_matches(spark):
    import duckdb

    df = spark.range(0, 500).select(
        (F.col("id") % 64).alias("x"), ((F.col("id") * 11) % 64).alias("y")
    )
    got = sorted(
        r["z"] for r in df.select(zorder_value("x", "y", bits=6).alias("z")).collect()
    )
    want = sorted(
        int(v)
        for v in duckdb.sql(
            "SELECT " + zorder_sql("x", "y", bits=6) + " AS z FROM "
            "(SELECT i % 64 AS x, (i*11) % 64 AS y FROM range(500) t(i))"
        ).df()["z"]
    )
    assert got == want


def test_zorder_validates_range(spark):
    df = spark.createDataFrame([(40, 1)], "x long, y long")
    with pytest.raises(Exception):
        df.select(zorder_value("x", "y", bits=5)).collect()
    with pytest.raises(ValueError):
        zorder_value("x", "y", bits=32)  # 64 bits > 62


def test_zorder_monotone_in_high_bits(spark):
    # quadrant ordering: all points with both coords < 2^(bits-1) sort
    # before any point with both coords >= 2^(bits-1)
    lo = _py_morton((3, 7), 4)
    hi = _py_morton((8, 9), 4)
    assert lo < hi


def test_cluster_by_zorder_bounds_every_dimension(spark, tmp_path):
    # 64x64 grid, one row per cell, shuffled input order
    n = 64
    df = (
        spark.range(0, n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.xxhash64("id").alias("noise"),
        )
        .orderBy("noise")
    )
    out = str(tmp_path / "z")
    cluster_by_zorder(df, ("x", "y"), bits=6, num_partitions=16).write.parquet(out)
    back = spark.read.parquet(out).select(
        "x", "y", F.input_file_name().alias("f")
    )
    spans = back.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
    ).collect()
    assert len(spans) >= 8
    avg_sx = sum(r["sx"] for r in spans) / len(spans)
    avg_sy = sum(r["sy"] for r in spans) / len(spans)
    # random/linear layouts give ~63 on at least one axis; z-order bounds both
    assert avg_sx < 0.45 * (n - 1), avg_sx
    assert avg_sy < 0.45 * (n - 1), avg_sy


def test_cluster_preserves_rows_and_schema(spark):
    df = spark.range(0, 300).select(
        (F.col("id") % 16).alias("x"), ((F.col("id") * 3) % 16).alias("y")
    )
    c = cluster_by_zorder(df, ("x", "y"), bits=4, num_partitions=4)
    assert c.columns == ["x", "y"]
    assert c.count() == 300
    assert c.exceptAll(df).count() == 0 and df.exceptAll(c).count() == 0
