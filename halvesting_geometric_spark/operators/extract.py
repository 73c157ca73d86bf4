"""Transcripts → conversation-level citation edges.

Reference analog: the paper→paper extraction stage — per-document GROBID XML
parse + bibliography XPath (``/root/reference/halvesting_geometric/utils/data/
link_prediction_metadata.py:111-191``, applied row-wise at ``:285-296``),
followed by positional column-concat + zip-explode (``:308-310``).

Spark-first re-expression: the "parse" is a codegen'd ``regexp_extract_all``
over the ``text`` column + ``explode`` — zero Python in the hot path, and
alignment of (src, dst) is by key (the marker lives in the same row as its
``conv_id``), never by row position (the reference's positional ``dd.concat``
at ``:308`` is banned here — SURVEY.md §2.7 T3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import extract_refs


def extract_conv_edges(
    transcripts: DataFrame,
    dedupe: bool = True,
    drop_self: bool = False,
) -> DataFrame:
    """Directed conv-level edges ``(src_conv, dst_conv)`` from text markers.

    ``dedupe=True`` collapses duplicate markers (reference analog: PyG
    ``coalesce`` at ``link_prediction_dataset.py:211``); self-references are
    kept by default (configurable per FIXTURES.md §1).
    """
    edges = (
        transcripts
        # prune early: only rows that can contain a marker reach the regex
        .filter(F.col("text").isNotNull() & F.col("text").contains("[[ref:"))
        .select(
            F.col("conv_id").alias("src_conv"),
            F.explode(extract_refs(F.col("text"))).alias("dst_conv"),
        )
    )
    if drop_self:
        edges = edges.filter(F.col("src_conv") != F.col("dst_conv"))
    if dedupe:
        edges = edges.dropDuplicates(["src_conv", "dst_conv"])
    return edges


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Turns under the stable ``(conv_id, turn_idx)`` ordering.

    The per-row invariant from ``BASELINE.json`` ``input_hint``: per-turn text
    equality is asserted under this ordering (tests compare this projection
    against the pandas oracle sorted the same way).
    """
    return transcripts.select("conv_id", "turn_idx", "text").orderBy(
        "conv_id", "turn_idx"
    )
