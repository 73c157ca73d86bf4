"""Deterministic transcript/graph derivation from the driver's testdata.

The driver's correctness gate (``__spark_entry__.py``) compares the engine
against DuckDB on the same parquet tables. The engine's native input is a
transcripts table (``BASELINE.json`` ``input_hint``); no such table exists in
``/root/testdata``, so one is *derived* from ``events`` with pure integer/string
arithmetic that both Spark and ANSI SQL evaluate identically:

- ``conv_id`` = ``'c' || lpad(user_id % 53, 6, '0')``
- ``text``    embeds one marker ``[[ref:c<lpad(event_id % 211)>]]``
- ``tool``    = ``'t' || (event_id % 7)`` on every third event
  (``event_id % 3 = 0``), else ``''`` — a deterministic stand-in for
  agent tool-call turns so the tool-sequence analytics are exercisable

so the conversation graph has ≤211 vertices, power-from-the-data edge
multiplicity, and the whole pipeline (marker extraction → vertex-set
augmentation → dense ids → algorithms) is exercised end-to-end and
reproducible inside DuckDB for the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONV_MOD = 53
REF_MOD = 211


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _conv_expr(col):
    return F.concat(
        F.lit("c"), F.lpad((col % CONV_MOD).cast("string"), 6, "0")
    )


def derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → transcripts-shaped rows (conv_id, turn_idx, role, text, tool, ts).

    Matches the DuckDB derivation in ``__spark_entry__.py`` token for token on
    (conv_id, text); turn_idx/role/tool are engine-side conveniences.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = _conv_expr(F.col("user_id"))
    target = F.concat(
        F.lit("c"), F.lpad((F.col("event_id") % REF_MOD).cast("string"), 6, "0")
    )
    text = F.concat(
        F.lit("turn of "), conv, F.lit(" see [[ref:"), target, F.lit("]] end")
    )
    from pyspark.sql import Window

    tool = F.when(
        (F.col("event_id") % 3) == 0,
        F.concat(F.lit("t"), (F.col("event_id") % 7).cast("string")),
    ).otherwise(F.lit(""))
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return (
        ev.select(
            conv.alias("conv_id"),
            F.col("event_type").alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            F.col("ts"),
            F.col("event_id"),
        )
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
