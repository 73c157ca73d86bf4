"""Reusable column expressions — the engine's scalar-function layer.

Everything here is built-in ``pyspark.sql.functions`` (JVM-side, codegen'd);
the reference's row-wise Python equivalents are cited per function. No Python
UDFs live in this module by design (``input_hint``: no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference marker embedded in transcript text. Analog of the GROBID XPath
# bibliography extraction (/root/reference/halvesting_geometric/utils/data/
# link_prediction_metadata.py:143,438,444) — but fully native: Spark's
# regexp_extract_all is codegen'd, no per-row Python.
MARKER_PATTERN = r"\[\[ref:([^\]]+)\]\]"


def extract_refs(text: Column | str) -> Column:
    """All ``[[ref:X]]`` targets in a text column, as array<string>."""
    return F.regexp_extract_all(text, F.lit(MARKER_PATTERN), 1)


def edge_hash(src: Column | str, dst: Column | str) -> Column:
    """Order-insensitive-safe 64-bit edge hash for checksums/convergence tests."""
    return F.xxhash64(src, dst)


def domain_prefix(domain: Column | str) -> Column:
    """First dot-separated segment with ``"other"`` fallback.

    Vectorized replacement for the reference's row-wise ``split_domain``
    (/root/reference/.../link_prediction_metadata.py:452-470).
    """
    col = F.col(domain) if isinstance(domain, str) else domain
    seg = F.split(col, r"\.").getItem(0)
    return F.when(col.isNull() | (F.trim(col) == ""), F.lit("other")).otherwise(
        F.coalesce(seg, F.lit("other"))
    )


def parse_stringified_list(col: Column | str) -> Column:
    """Parse ``"['a', 'b']"`` into array<string>.

    Vectorized replacement for the reference's row-wise ``str_to_list``
    (/root/reference/.../link_prediction_metadata.py:472-490). The engine never
    *produces* stringified lists (arrays stay typed); this exists only to read
    legacy text.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.regexp_replace(c, r"^\[|\]$", ""), r"'", "")
    return F.when(F.trim(cleaned) == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, r",\s*")
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side.

    ``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside codegen —
    no Python. Returns double; 0.0 for zero-norm inputs.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))
