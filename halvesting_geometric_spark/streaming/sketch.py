"""Streaming count-min sketch — the mergeability of the batch sketch
(operators/sketch.py) applied to Structured Streaming: each micro-batch
appends its own depth×width-bounded partial cell table, and readers fold
partials with one aggregate. No stateful operator is needed because the
sketch IS the state, and it is associative — the same append-partials /
fold-on-read shape as the incremental degree store (streaming/degrees.py),
minus compaction (cells are bounded by batches·depth·width, and a reader
fold is one tiny aggregate; compact by rewriting the folded table if the
batch count ever matters).

Exactly-once per input file via the streaming checkpoint
(Trigger.AvailableNow) — re-running after new files land folds only the
delta, and a crash between append and commit replays the batch, which is
idempotent at the CELL level only if the append completed; the batch_id
column makes replayed appends detectable (dedup on (batch_id, row,
bucket) at read time)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from halvesting_geometric_spark.operators.sketch import count_min_sketch


def stream_sketch_available_now(
    spark: SparkSession,
    input_path: str,
    sketch_path: str,
    checkpoint_path: str,
    schema: StructType | str,
    key: Column | str,
    depth: int = 4,
    width: int = 2048,
    hash_method: str = "xxhash64",
) -> None:
    """Drain all currently-available input files, appending one partial
    sketch (batch_id, row, bucket, cnt) per micro-batch."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            count_min_sketch(
                batch_df, key, depth=depth, width=width,
                hash_method=hash_method,
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sketch_path)
        )

    q = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_sketch(spark: SparkSession, sketch_path: str) -> DataFrame:
    """Fold the appended partials into the merged sketch (row, bucket,
    cnt) — identical to the batch sketch of the union of all drained
    input. Replayed appends (crash between append and checkpoint commit)
    are dropped by deduplicating whole partials on batch_id first."""
    parts = spark.read.parquet(sketch_path).dropDuplicates(
        ["batch_id", "row", "bucket"]
    )
    return parts.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# Streaming HyperLogLog — approximate distinct over an unbounded stream
# ---------------------------------------------------------------------------


def stream_hll_available_now(
    spark: SparkSession,
    input_path: str,
    hll_path: str,
    checkpoint_path: str,
    schema: StructType | str,
    key: Column | str,
    group_cols: tuple[str, ...] = (),
    lgk: int = 12,
    hash_method: str = "xxhash64",
) -> None:
    """Drain all currently-available input files, appending one partial HLL
    register table (group..., reg, rho) per micro-batch. Unlike the CMS
    fold, register MAX is IDEMPOTENT, so a crash-replayed append cannot
    change the folded result — no batch_id bookkeeping is needed; the
    appended partials are simply unioned and re-maxed at read time. State
    per group is bounded by batches·2^lgk rows on disk and 2^lgk after
    fold."""
    from halvesting_geometric_spark.operators.sketch import hll_sketch

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            hll_sketch(
                batch_df, key, group_cols=group_cols, lgk=lgk,
                hash_method=hash_method,
            )
            .write.mode("append")
            .parquet(hll_path)
        )

    q = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_hll(
    spark: SparkSession,
    hll_path: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fold appended register partials into the merged sketch — identical to
    the batch sketch of the union of all drained input (MAX is associative,
    commutative, idempotent)."""
    return (
        spark.read.parquet(hll_path)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


# ---------------------------------------------------------------------------
# Streaming Bloom filter — approximate membership over an unbounded stream
# ---------------------------------------------------------------------------


def stream_bloom_available_now(
    spark: SparkSession,
    input_path: str,
    bloom_path: str,
    checkpoint_path: str,
    schema: StructType | str,
    key: Column | str,
    m_bits: int = 1 << 20,
    k: int = 5,
    hash_method: str = "xxhash64",
) -> None:
    """Drain all currently-available input files, appending one partial
    Bloom position table per micro-batch. Like the HLL fold (set-UNION is
    idempotent) a crash-replayed append cannot change the folded filter, so
    no batch bookkeeping is needed. Canonical use: keep a filter of
    every key ever ingested; new batches probe it cheaply for
    first-seen routing before the expensive exact check."""
    from halvesting_geometric_spark.operators.sketch import bloom_sketch

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            bloom_sketch(
                batch_df, key, m_bits=m_bits, k=k, hash_method=hash_method
            )
            .write.mode("append")
            .parquet(bloom_path)
        )

    q = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_bloom(spark: SparkSession, bloom_path: str) -> DataFrame:
    """Fold appended position partials into the merged filter (DISTINCT
    union — associative, commutative, idempotent)."""
    return spark.read.parquet(bloom_path).select("pos").distinct()
