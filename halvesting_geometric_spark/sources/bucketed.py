"""Bucketed (pre-shuffled) tables: co-located joins with NO per-query shuffle.

The 100 TB lever this module packages: a join between two tables bucketed
by the same key into the same bucket count is planned WITHOUT an Exchange
on either side — the shuffle was paid once at write time and is amortized
over every subsequent join/aggregate on that key. For the engine's hot
key (``vertex_id`` / ``src``), that means edge↔vertex-state joins, degree
aggregations, and repeated analytical queries over a persisted graph skip
the dominant cost of every superstep-shaped query.

Spark specifics encoded here (public behavior of ``DataFrameWriter.bucketBy``):

- bucketed tables must go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not the parquet footer) — a plain ``.parquet(path)``
  write silently drops bucketing;
- both sides must agree on bucket count (or be multiples with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) and join on the
  full bucket key;
- ``sortBy`` additionally enables sort-merge joins without a per-query
  sort on the sorted prefix;
- AQE leaves bucketed scans alone (no Exchange to re-plan), so the plan
  assertion "no Exchange above either scan" is stable.

Verification: tests assert on the *physical plan* that the bucketed join
of two co-bucketed tables contains no Exchange, while the same join over
plain parquet does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_cols``.

    ``table`` is a catalog table name (bucket metadata requires the
    catalog); ``path`` optionally pins the storage location so the data
    lands in a caller-owned directory instead of the warehouse default.
    ``n_buckets`` sizes write-side parallelism AND the join parallelism of
    every future co-located join — at cluster scale pick it like you'd
    pick ``spark.sql.shuffle.partitions`` for this table's joins.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if not cols:
        raise ValueError("bucket_cols must be non-empty")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = df.write.mode(mode).format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, cols[0], *cols[1:])
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact."""
    return spark.table(table)


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True when the join's physical plan contains no shuffle Exchange —
    the co-location property bucketing buys (broadcast exchanges don't
    count as shuffles and are ignored)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return not any(
        line.lstrip("+-* ").startswith("Exchange")
        and "SinglePartition" not in line
        for line in plan.splitlines()
    )
