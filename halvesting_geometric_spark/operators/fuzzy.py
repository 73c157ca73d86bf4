"""Blocked fuzzy matching: edit-distance record linkage without the
quadratic all-pairs scan.

Engine-new dedup-family member (alongside MinHash/SimHash/winnowing in
``operators/dedup.py`` / ``operators/winnow.py``): classic blocking —
candidate pairs are generated ONLY inside equal-blocking-key groups, then
scored with Levenshtein distance on a bounded key prefix. Levenshtein is a
JVM built-in (``F.levenshtein``, whole-stage codegen) and has an exact
DuckDB twin, so the operator is oracle-checkable bit-for-bit.

Scale shape: the self-join is on the blocking key, so the worst case is the
largest block squared — ``max_block`` drops oversized blocks (with their
size logged via the returned frame when ``return_dropped``), the same
graceful degradation the shingle doc-frequency cap applies in
``dedup.py``. Everything else is one groupBy + one equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str] | None = None,
    block_expr: Column | None = None,
    prefix_len: int = 40,
    max_distance: int = 10,
    max_block: int = 1000,
) -> DataFrame:
    """Candidate pairs (a, b, distance) with ``a < b`` (by id), blocked.

    ``block_cols``/``block_expr``: equality blocking key (columns, or one
    computed expression aliased ``_blk``). Pairs are scored as
    ``levenshtein(prefix_a, prefix_b)`` over the first ``prefix_len`` chars
    and kept when ``<= max_distance``. Blocks larger than ``max_block``
    rows are dropped before the self-join — the documented anti-quadratic
    guard.
    """
    if (block_cols is None) == (block_expr is None):
        raise ValueError("exactly one of block_cols / block_expr required")
    blk = block_expr if block_expr is not None else F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in block_cols]
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("pfx"),
        blk.alias("_blk"),
    ).filter(F.col("pfx").isNotNull() & F.col("_blk").isNotNull())
    sizes = base.groupBy("_blk").agg(F.count("*").alias("_bn"))
    kept = base.join(
        F.broadcast(sizes.filter(F.col("_bn") <= max_block).select("_blk")),
        "_blk",
    )
    a = kept.select(
        F.col("_blk"), F.col("id").alias("a"), F.col("pfx").alias("pa")
    )
    b = kept.select(
        F.col("_blk"), F.col("id").alias("b"), F.col("pfx").alias("pb")
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("distance", F.levenshtein(F.col("pa"), F.col("pb")))
        .filter(F.col("distance") <= max_distance)
        .select("a", "b", F.col("distance").cast("long").alias("distance"))
    )
