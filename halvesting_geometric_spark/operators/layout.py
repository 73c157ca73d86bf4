"""Z-order (Morton curve) layout clustering — multi-dimensional data skipping.

At 100 TB, scan cost is dominated by how many files/row-groups a filter can
skip via column min/max statistics. Range-partitioning by ONE column gives
perfect pruning on that column and none on any other; interleaving the bits
of several columns into one Morton key and range-partitioning by it bounds
EVERY interleaved column's min/max range per file (each file covers a small
hypercube of the key space), so predicates on any clustered dimension skip
most files. This is the layout technique behind Delta/Iceberg ``ZORDER BY``
— implemented here as plain Catalyst integer arithmetic (shift/mask/sum,
whole-stage codegen, no UDF) + ``repartitionByRange``.

The z-value of d columns, ``bits`` each, is ``sum_i sum_b bit_b(c_i) <<
(b*d + i)`` — bit positions are disjoint so the sum IS the interleave and
stays inside 63 bits for ``d*bits <= 62``. Inputs must be non-negative and
< 2^bits; callers bucket/offset first (:func:`zorder_value` checks bounds
when ``validate``).

Reference analog: none (the reference never manages physical layout);
engine-new for the 100 TB axis. Scale: the z-value is one projection, the
clustering one range shuffle — the same cost as any global sort, paid once
at write time to make every later scan cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(
    *cols: Column | str, bits: int = 16, validate: bool = True
) -> Column:
    """Morton-interleave ``len(cols)`` non-negative ints, ``bits`` each.

    Unrolled to ``d*bits`` shift/mask terms summed — disjoint bit positions,
    so plain ``+`` composes the word; Catalyst folds it into one codegen
    expression. With ``validate`` (default) any out-of-range input raises at
    execution time via ANSI ``assert_true`` semantics — silent wraparound
    would corrupt the curve.
    """
    d = len(cols)
    if d < 1:
        raise ValueError("need at least one column")
    if not 1 <= bits * d <= 62:
        raise ValueError(f"bits*len(cols) must be in [1, 62], got {bits * d}")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    if validate:
        limit = F.lit(1 << bits)
        cs = [
            F.when((c >= 0) & (c < limit), c).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"zorder_value: input {i} out of [0, 2^{bits}): "),
                        c.cast("string"),
                    )
                )
            )
            for i, c in enumerate(cs)
        ]
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * d + i)
        for i, c in enumerate(cs)
        for b in range(bits)
    ]
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_sql(*exprs: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_value` (oracles/tests)."""
    d = len(exprs)
    terms = [
        f"(({e} // {1 << b}) % 2) * {1 << (b * d + i)}"
        for i, e in enumerate(exprs)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort the frame along the Morton curve of ``cols``.

    Write the result straight out: every output file then holds a compact
    z-range, i.e. a bounded min/max box on EVERY clustered column, which is
    what parquet/Iceberg row-group pruning consumes. One extra column is
    projected away before return, so the stored schema is unchanged.
    """
    z = zorder_value(*cols, bits=bits).alias("_z")
    out = df.select("*", z)
    out = (
        out.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")
