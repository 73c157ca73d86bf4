"""Dense 0-based vertex-id assignment — done correctly at scale.

The reference assigns ids via ``df.index`` after dedupe
(``/root/reference/halvesting_geometric/utils/data/link_prediction_metadata.py:385,395,404,420,319``)
and *documents its own bug*: per-partition index reset collapses ids at scale
(docstring warning at ``:349-353``). Two correct strategies here:

- ``dense_ids_window``: ``row_number().over(Window.orderBy(key)) - 1``.
  Exact and simple; the global window is a single-task sort — fine for
  result-sized tables, wrong for billion-row vertex sets.
- ``dense_ids_scalable``: the zipWithIndex pattern kept in DataFrame land —
  range-repartition by key, sort within partitions, count rows per partition
  (tiny collect), then add per-partition prefix offsets as a pure Catalyst
  expression (``monotonically_increasing_id``'s low 33 bits are the
  within-partition record index; offsets attach via a broadcast join).
  Scales to any vertex count; the only driver traffic is one long per
  partition, and no Python evaluation anywhere.

Both produce ids equal to the rank of ``key`` in global ascending order, so
they are interchangeable and cross-checked in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids_window(df: DataFrame, key: str, id_col: str = "vertex_id") -> DataFrame:
    """Exact dense ids via a global window (test-scale / result-scale path)."""
    w = Window.orderBy(F.col(key).asc())
    return df.select(
        (F.row_number().over(w) - 1).cast("long").alias(id_col), F.col(key)
    )


def dense_ids_scalable(
    df: DataFrame,
    key: str,
    id_col: str = "vertex_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense ids via two-phase per-partition counting (the at-scale path).

    Phase 1 counts rows per range-partition (collects ``num_partitions``
    longs); phase 2 assigns ``offset[pid] + within-partition index`` as a
    pure Catalyst expression: ``monotonically_increasing_id`` stores the
    record number within each partition in its low 33 bits (documented
    layout), which over the sorted, pinned partitions IS the per-partition
    cumcount, and the prefix offsets attach via a broadcast join on
    ``spark_partition_id()``. No Python evaluation anywhere (the previous
    mapInPandas kernel paid a full JVM→Arrow→Python round trip of the
    vertex table — optimization guide §4).

    The ranged input is CHECKPOINTED between phases so both see identical
    partitioning: RangePartitioner samples boundaries with an RDD-id-seeded
    RNG, and a cache-evicted-and-recomputed partition could silently
    re-sample — localCheckpoint makes block loss FAIL the job instead of
    producing wrong ids (fail-over-wrong for an id-assignment path).
    """
    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = (
        df.select(key)
        .repartitionByRange(num_partitions, F.col(key).asc())
        .sortWithinPartitions(F.col(key).asc())
        .localCheckpoint(eager=True)
    )
    counts = {
        row["pid"]: row["cnt"]
        for row in sorted_df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    if counts and max(counts.values()) >= (1 << 33):
        # the 33-bit record field would wrap: 8.6e9 rows in ONE range
        # partition means the partitioning itself is broken — fail fast
        raise ValueError(
            "dense_ids_scalable: a range partition exceeds 2^33 rows; "
            "raise num_partitions"
        )
    offsets: list[tuple[int, int]] = []
    running = 0
    for pid in range(num_partitions):
        offsets.append((pid, running))
        running += counts.get(pid, 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    # record index must be computed directly over the pinned partitions
    # (BEFORE the join, whose output order is not load-bearing)
    indexed = sorted_df.select(
        F.spark_partition_id().alias("_pid"),
        F.monotonically_increasing_id()
        .bitwiseAND(F.lit((1 << 33) - 1))
        .alias("_idx"),
        F.col(key),
    )
    return indexed.join(F.broadcast(off_df), "_pid").select(
        (F.col("_off") + F.col("_idx")).cast("long").alias(id_col),
        F.col(key),
    )


def build_vertices(
    conv_edges: DataFrame,
    transcripts: DataFrame | None = None,
    scalable: bool = False,
    id_col: str = "vertex_id",
) -> DataFrame:
    """Vertex table ``(vertex_id, conv_id)`` from edges (± transcript convs).

    Referenced-but-absent conversations become vertices — the reference's
    vertex-set augmentation (union cited papers into the paper table + dedupe,
    ``link_prediction_metadata.py:312-319``) re-expressed as a typed union +
    ``distinct`` instead of a positional concat.
    """
    ids = conv_edges.select(F.col("src_conv").alias("conv_id")).unionByName(
        conv_edges.select(F.col("dst_conv").alias("conv_id"))
    )
    if transcripts is not None:
        ids = ids.unionByName(transcripts.select("conv_id"))
    distinct_ids = ids.distinct()
    fn = dense_ids_scalable if scalable else dense_ids_window
    return fn(distinct_ids, "conv_id", id_col=id_col)


def edges_to_ids(conv_edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Map conv-level string edges to the integer COO edge table ``(src, dst)``.

    Reference analog: joins J6/J7 resolving cited titles and citing halids to
    paper_idx (``link_prediction_metadata.py:321-331``). Two equi joins on the
    vertex table; Catalyst/AQE picks broadcast automatically when the vertex
    table is small.
    """
    src_map = vertices.select(
        F.col("conv_id").alias("src_conv"), F.col("vertex_id").alias("src")
    )
    dst_map = vertices.select(
        F.col("conv_id").alias("dst_conv"), F.col("vertex_id").alias("dst")
    )
    return (
        conv_edges.join(src_map, "src_conv")
        .join(dst_map, "dst_conv")
        .select("src", "dst")
    )
