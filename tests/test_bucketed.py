"""Bucketed co-located joins: the write-once/join-free-forever property,
asserted on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.sources.bucketed import (
    is_shuffle_free_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture
def bucketed_tables(spark, tmp_path):
    edges = spark.range(5000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7) % 500).alias("dst"),
    )
    state = spark.range(500).select(
        F.col("id").alias("src"), (F.col("id") * 0.001).alias("rank")
    )
    write_bucketed(
        edges, "t_edges_b", "src", n_buckets=8, path=str(tmp_path / "e")
    )
    write_bucketed(
        state, "t_state_b", "src", n_buckets=8, path=str(tmp_path / "s")
    )
    yield edges, state
    for t in ("t_edges_b", "t_state_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    edges, state = bucketed_tables
    eb = read_bucketed(spark, "t_edges_b")
    sb = read_bucketed(spark, "t_state_b")
    # force the shuffle-join shape (no broadcast) so the Exchange question
    # is decided by bucketing alone
    joined = eb.join(sb.hint("shuffle_hash"), "src")
    assert is_shuffle_free_join(joined)
    # same join over the un-bucketed frames must shuffle at least one side
    plain = edges.join(state.hint("shuffle_hash"), "src")
    assert not is_shuffle_free_join(plain)
    # and the bucketed join computes the same result
    got = joined.agg(
        F.count("*").alias("n"), F.sum("rank").alias("s")
    ).first()
    exp = plain.agg(F.count("*").alias("n"), F.sum("rank").alias("s")).first()
    assert got["n"] == exp["n"]
    assert abs(got["s"] - exp["s"]) < 1e-9


def test_bucketed_aggregation_is_shuffle_free(spark, bucketed_tables):
    """groupBy on the bucket key also skips the Exchange: partial and final
    aggregation collapse onto the bucketed layout."""
    eb = read_bucketed(spark, "t_edges_b")
    agg = eb.groupBy("src").agg(F.count("*").alias("deg"))
    assert is_shuffle_free_join(agg)
    # matches the plain computation
    edges, _ = bucketed_tables
    exp = dict(
        edges.groupBy("src").agg(F.count("*").alias("deg")).collect()
    )
    got = dict(agg.collect())
    assert got == exp


def test_write_bucketed_validation(spark, tmp_path):
    df = spark.range(10).select(F.col("id").alias("src"))
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(df, "t_bad", [], path=str(tmp_path / "b"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t_bad", "src", n_buckets=0, path=str(tmp_path / "b"))
