"""SparkSession factory.

Reference analog: the dask multiprocessing setup at
``/root/reference/build_metadata.py:20,74`` (``NUM_PROC = physical cores``,
``from_pandas(df, npartitions=NUM_PROC)``). Here parallelism is explicit and
scale-ready: AQE on (runtime skew-join + partition coalescing), Arrow on (all
Python-side kernels are vectorized batches), shuffle partitions sized to the
local core count rather than the 200 default.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "halvesting_geometric_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this engine.

    ``cores=None`` → ``local[*]``. On a real cluster the same confs apply;
    only ``master`` changes (spark-submit owns it), so callers outside tests
    should not pass ``cores``.
    """
    cores_env = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and cores_env:
        cores = int(cores_env)
    master = f"local[{cores}]" if cores else "local[*]"
    n_threads = cores or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = n_threads

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@contextmanager
def small_state_aqe_bypass(
    spark: SparkSession,
    n_rows: int,
    threshold: int = 1_000_000,
    rows_per_partition: int = 20_000,
) -> Iterator[bool]:
    """Temporarily disable AQE around an iterative driver whose loop state
    is tiny, and shrink the static shuffle-partition count to match the
    input size; yields whether the bypass engaged.

    AQE re-plans every job from runtime shuffle statistics. On a superstep
    loop over a small cached state that re-planning is a fixed per-job
    driver cost: measured on the bench graph (139k edges, local[32]) the
    10-superstep PageRank median drops from 0.772 to 0.671 s/superstep
    (~13%) with AQE off. At real scale the re-plan amortizes to noise and
    AQE's coalescing / skew-join handling is a clear win (the 20M-edge
    scaling runs NEED the advisory-size coalescing), so the bypass only
    engages when ``n_rows <= threshold`` and AQE was on; the previous
    settings are always restored. The toggle is session-wide while active —
    the engine's drivers run one job at a time by design, so don't wrap
    concurrent queries.

    With AQE off nothing coalesces the static ``spark.sql.shuffle.partitions``
    (sized to the core count for the at-scale path), so every stage of a
    tiny-state loop schedules one near-empty task per core. Partition count
    should track data size, not core count (optimization guide §2.2): while
    the bypass is engaged the partition count becomes
    ``clamp(ceil(n_rows / rows_per_partition), 4, previous)`` — derived from
    the input size, never raised above the configured value, and only inside
    the same ≤``threshold`` window where AQE is off (at sf1.0 and above the
    bypass disengages entirely). Measured at 139k edges / local[32]
    (scripts/profile_partitions.py, warm JIT, median of 2): 32→8 partitions
    gives pagerank-to-1e-6 18.9→9.8 s, hits5 7.5→3.4 s, CC 11.7→4.2 s,
    BT-5 8.3→5.2 s.
    """
    key = "spark.sql.adaptive.enabled"
    pkey = "spark.sql.shuffle.partitions"
    prev = str(spark.conf.get(key, "true"))
    engage = n_rows <= threshold and prev.lower() == "true"
    prev_parts: str | None = None
    if engage:
        spark.conf.set(key, "false")
        try:
            cur_parts = int(spark.conf.get(pkey, "200"))
        except ValueError:
            cur_parts = None
        if cur_parts is not None:
            sized = max(4, -(-int(n_rows) // rows_per_partition))
            if sized < cur_parts:
                prev_parts = str(cur_parts)
                spark.conf.set(pkey, str(sized))
    try:
        yield engage
    finally:
        if engage:
            spark.conf.set(key, prev)
            if prev_parts is not None:
                spark.conf.set(pkey, prev_parts)
