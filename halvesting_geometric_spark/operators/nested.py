"""Nested array-of-struct ingestion and flattening (SURVEY §2 F1/U4).

Reference parity: the reference's first dataflow step explodes
``authors: [{name, halauthorid, affiliations: [...]}]`` from raw JSON with
row-wise ``json_normalize`` (``/root/reference/build_metadata.py:59-68``).
Here the same shapes are pure Catalyst operators — ``explode`` +
``"col.*"`` nested projection to flatten, ``collect_list(struct(...))`` to
build — so nested ingestion never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten_struct_array(
    df: DataFrame, array_col: str, keep: list[str] | None = None
) -> DataFrame:
    """One output row per element of ``array_col`` (an array<struct<...>>),
    with the struct's fields lifted to top-level columns next to ``keep``
    (default: every other column). Rows whose array is empty or null produce
    no output (inner explode — the reference's json_normalize semantics).
    """
    if array_col not in df.columns:
        raise ValueError(f"no column {array_col!r} in {df.columns}")
    keep = keep if keep is not None else [c for c in df.columns if c != array_col]
    exploded = df.select(*keep, F.explode(F.col(array_col)).alias("_s"))
    return exploded.select(*keep, "_s.*")


def build_struct_array(
    df: DataFrame,
    group_cols: list[str],
    struct_cols: list[str | Column],
    out_col: str = "items",
    sort: bool = True,
) -> DataFrame:
    """Inverse of :func:`flatten_struct_array`: one row per ``group_cols``
    value with the remaining columns packed into a (optionally sorted, hence
    deterministic) array<struct<...>> column ``out_col``."""
    packed = F.collect_list(F.struct(*struct_cols))
    if sort:
        packed = F.sort_array(packed)
    return df.groupBy(*group_cols).agg(packed.alias(out_col))
