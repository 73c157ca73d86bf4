"""Table catalog abstraction: Iceberg when configured, parquet otherwise.

The engine's durable tables (graph tables, per-iteration state, metrics,
lineage) address a logical name; the catalog decides the physical home. On a
cluster with an Iceberg catalog configured (``spark.sql.catalog.<name>`` conf
+ jars on the classpath) the same calls go through
``writeTo(...).createOrReplace()`` and get snapshot isolation / time travel —
which is what makes checkpoint resume transactional at 10^12-turn scale. This
image ships no Iceberg jars, so the parquet layout is the tested path; the
call sites are identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_catalog_name(spark: SparkSession) -> str | None:
    """First configured Iceberg catalog name, or None."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:  # pragma: no cover - defensive
        return None
    for key, value in confs:
        if key.startswith("spark.sql.catalog.") and key.count(".") == 3:
            if "iceberg" in value.lower():
                return key.rsplit(".", 1)[1]
    return None


class TableCatalog:
    """name → table IO over Iceberg (if available) or a parquet root dir."""

    def __init__(self, spark: SparkSession, root: str, namespace: str = "graph"):
        self.spark = spark
        self.root = root
        self.namespace = namespace
        self.iceberg = iceberg_catalog_name(spark)
        if self.iceberg is None:
            os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _ident(self, name: str) -> str:
        return f"{self.iceberg}.{self.namespace}.{name}"

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if self.iceberg:
            writer = df.writeTo(self._ident(name))
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        else:
            df.write.mode(mode).option("compression", "zstd").parquet(
                self._path(name)
            )

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._ident(name))
        return os.path.exists(self._path(name))
