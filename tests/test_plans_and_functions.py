"""Physical-plan assertions (pushdown / broadcast / no-Python-in-hot-path)
and the §2.8 scalar-function ports."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.functions import (
    domain_prefix,
    edge_hash,
    parse_stringified_list,
)
from halvesting_geometric_spark.operators.extract import extract_conv_edges


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_scan_pushes_filter_and_prunes_columns(spark, tmp_path):
    """A filtered 2-column projection must reach the parquet scan as
    PushedFilters + a pruned ReadSchema (SURVEY.md §4.1)."""
    path = str(tmp_path / "tr")
    generate_transcripts(spark, 30, seed=1).write.parquet(path)
    q = (
        spark.read.parquet(path)
        .filter(F.col("role") == "user")
        .select("conv_id", "turn_idx")
    )
    plan = _physical(q)
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,user)]" in plan
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema and "conv_id" in read_schema


def test_extraction_plan_is_pure_jvm(spark):
    """No Python evaluation node anywhere in the extraction plan — the
    input_hint's 'no per-row Python' shown at the physical level."""
    tr = generate_transcripts(spark, 10, seed=1)
    # datagen itself is a mapInPandas source (allowed: Arrow-batched); assert
    # the extraction *stage* adds no Python nodes beyond it
    edges = extract_conv_edges(tr)
    plan = _physical(edges)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDF
    assert "ArrowEvalPython" not in plan  # not even a scalar pandas UDF
    assert "FlatMapGroupsInPandas" not in plan
    assert "regexp_extract_all" in plan  # codegen'd JVM extraction


def test_small_dimension_join_broadcasts(spark, tmp_path):
    """Vertex-map joins on a small vertex table must plan as broadcast
    (reference J1 analog: ~20-row domains table)."""
    tr = generate_transcripts(spark, 40, seed=5)
    from halvesting_geometric_spark.operators.graph import build_graph

    g = build_graph(tr)
    plan = _physical(g.edges)
    assert "BroadcastHashJoin" in plan


def test_domain_prefix_matches_reference_semantics(spark):
    """Vectorized port of split_domain (link_prediction_metadata.py:452-470):
    first dot-segment, 'other' on empty/null."""
    df = spark.createDataFrame(
        [("shs.scipo",), ("info.info-ai",), ("math",), ("",), (None,)],
        "domain string",
    )
    got = df.select(domain_prefix("domain").alias("p")).toPandas()["p"].tolist()
    assert got == ["shs", "info", "math", "other", "other"]


def test_parse_stringified_list_matches_reference_semantics(spark):
    """Vectorized port of str_to_list (link_prediction_metadata.py:472-490)."""
    df = spark.createDataFrame(
        [("['shs.scipo', 'shs.stat']",), ("['math']",), ("[]",)],
        "domain string",
    )
    got = df.select(parse_stringified_list("domain").alias("l")).toPandas()["l"]
    assert list(got[0]) == ["shs.scipo", "shs.stat"]
    assert list(got[1]) == ["math"]
    assert list(got[2]) == []


def test_edge_hash_deterministic(spark):
    df = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "src long, dst long")
    h = df.select(edge_hash("src", "dst").alias("h")).toPandas()["h"]
    assert h[0] == h[1] != h[2]


def test_year_from_timestamp(spark):
    """F5 port: year extraction is a native function, not string surgery."""
    tr = generate_transcripts(spark, 5, seed=1)
    years = tr.select(F.year("ts").alias("y")).distinct().toPandas()["y"]
    assert (years == 2023).all()


def test_small_state_aqe_bypass_toggles_and_restores(spark):
    """Bypass engages only below threshold with AQE previously on, and
    always restores the prior setting (including on exception)."""
    import pytest

    from halvesting_geometric_spark.session import small_state_aqe_bypass

    key = "spark.sql.adaptive.enabled"
    assert spark.conf.get(key) == "true"
    with small_state_aqe_bypass(spark, 1000, threshold=10_000) as engaged:
        assert engaged is True
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == "true"

    # above threshold: no-op
    with small_state_aqe_bypass(spark, 10**9, threshold=10_000) as engaged:
        assert engaged is False
        assert spark.conf.get(key) == "true"

    # restores on exception
    with pytest.raises(RuntimeError, match="boom"):
        with small_state_aqe_bypass(spark, 1, threshold=10):
            assert spark.conf.get(key) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == "true"

    # AQE already off: engage must not flip it back on afterwards
    spark.conf.set(key, "false")
    try:
        with small_state_aqe_bypass(spark, 1, threshold=10) as engaged:
            assert engaged is False
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.set(key, "true")


def test_small_state_bypass_scales_shuffle_partitions(spark):
    """While engaged, shuffle partitions shrink to ceil(n/rows_per_partition)
    clamped to [4, previous]; the previous count is restored on exit and the
    derivation never raises the configured value."""
    from halvesting_geometric_spark.session import small_state_aqe_bypass

    pkey = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(pkey)
    try:
        spark.conf.set(pkey, "32")
        # 139k rows at 20k rows/partition -> 7
        with small_state_aqe_bypass(spark, 139_000, threshold=1_000_000):
            assert spark.conf.get(pkey) == "7"
        assert spark.conf.get(pkey) == "32"
        # tiny input clamps at the floor of 4
        with small_state_aqe_bypass(spark, 10, threshold=1_000_000):
            assert spark.conf.get(pkey) == "4"
        assert spark.conf.get(pkey) == "32"
        # big-but-under-threshold input never raises the configured count
        with small_state_aqe_bypass(spark, 1_000_000, threshold=1_000_000):
            assert spark.conf.get(pkey) == "32"
        assert spark.conf.get(pkey) == "32"
        # disengaged (above threshold): untouched
        with small_state_aqe_bypass(spark, 10, threshold=5):
            assert spark.conf.get(pkey) == "32"
    finally:
        spark.conf.set(pkey, prev)


def test_json_long_field_null_on_malformed(spark):
    from halvesting_geometric_spark.functions import json_long_field

    df = spark.createDataFrame(
        [('{"k": 7}',), ("not json",), (None,), ('{"k": null}',), ('{"j": 1}',)],
        "props string",
    )
    out = [r.k for r in df.select(json_long_field("props", "k").alias("k")).collect()]
    assert out == [7, None, None, None, None]
