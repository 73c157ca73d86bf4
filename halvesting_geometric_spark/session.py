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
