"""Source/sink layer (SURVEY.md §2.1 S1-S10 → Spark-first mappings).

The engine's internal format is partitioned Parquet with zstd (Iceberg-ready —
the same writes go through an Iceberg catalog when one is configured; this
image carries no Iceberg jars, so the catalog abstraction is parquet-backed
and the gate tests that path). TSV/JSON exist for reference interop: the
reference's node/edge tables are single-file TSVs
(``/root/reference/halvesting_geometric/utils/data/link_prediction_metadata.py:231,257,280,337``)
and its raw corpus is a JSON directory (``helpers.py:306-332``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_transcripts_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-pinned JSON scan (S2/S3) — never inferred (the reference's
    pandas inference at helpers.py:306-332 is dynamic; ours is declared).

    Malformed lines are quarantined, not fatal (a web-scale corpus always
    has some). Default: DROPMALFORMED — bad lines vanish at the scan, no
    extra column, full pushdown. ``keep_corrupt=True``: the file is scanned
    as text and parsed with ``from_json``, so the raw bad line lands in
    ``_corrupt_record`` and — unlike the native reader's PERMISSIVE mode —
    the result supports corrupt-only queries (`count`, reject inspection)
    without caching (the JSON-source corrupt-column restriction applies to
    raw scans, not to `from_json` over text).
    """
    from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA

    base = schema or TRANSCRIPTS_SCHEMA
    if not keep_corrupt:
        return (
            spark.read.schema(base)
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
    with_corrupt = T.StructType(
        base.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            with_corrupt,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record",
            },
        ).alias("r")
    )
    return parsed.select("r.*")


def read_tsv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Dtype-pinned TSV scan (S5) — golden-file interop with the reference's
    node/edge tables; header expected, schema mandatory."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .schema(schema)
        .csv(path)
    )


def write_tsv_single(df: DataFrame, path: str) -> None:
    """Single-file TSV sink (S7) — ONLY for tiny golden outputs; the
    coalesce(1) gather is the reference's scalability cliff, quarantined here
    on purpose (engine-internal writes are partitioned parquet)."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        .csv(path)
    )


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Engine-internal sink: partitioned parquet, zstd (S7/S9 mapping —
    compression replaces the reference's zip/gzip archive step)."""
    w = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
