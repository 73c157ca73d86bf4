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


# -- engine-portable hashing --------------------------------------------------
#
# xxhash64 is Spark-private: no other engine reproduces it, so any operator
# whose OUTPUT depends on hash values (splits, sampling, MinHash, SimHash)
# can't be verified by an external SQL oracle. ``portable_hash64`` is the
# cross-engine twin: the integer value of the first 15 hex chars (60 bits —
# fits a signed 64-bit int) of md5 over the '\\x1f'-joined string forms of the
# inputs. md5 is universal; the result is bit-identical in Spark, DuckDB,
# Python hashlib, etc. It is ~3× slower than xxhash64, so hash-dependent
# operators take a ``hash_method`` knob: 'xxhash64' (default, the scale path)
# or 'portable' (the verifiable path — same algorithm, swappable seed-for-seed).

_SEP = "\x1f"


def _to_str(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("string")


def portable_hash64(*cols: Column | str, seed: int | None = None) -> Column:
    """60-bit engine-portable hash (see module note). Non-negative BIGINT.

    Inputs are cast to their canonical string form first (Spark and ANSI SQL
    render integers/strings identically); avoid floating-point inputs.
    """
    parts = [_to_str(c) for c in cols]
    if seed is not None:
        parts.append(F.lit(str(seed)))
    s = F.concat_ws(_SEP, *parts)
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(*exprs: str, seed: int | None = None) -> str:
    """DuckDB SQL twin of :func:`portable_hash64` — used by the correctness
    oracles and tests to replicate hash-dependent operators cross-engine."""
    parts = [f"CAST({e} AS VARCHAR)" for e in exprs]
    if seed is not None:
        parts.append(f"'{seed}'")
    joined = ", ".join(parts)
    return (
        "list_reduce([CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT) "
        f"for c in string_split(substr(md5(concat_ws(chr(31), {joined})), 1, 15), '')], "
        "(a, b) -> a * 16 + b)"
    )


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


def unrolled_dot(a: Column, b: Column, dim: int) -> Column:
    """``a[0]·b[0] + … + a[dim-1]·b[dim-1]`` as plain codegen arithmetic.

    Higher-order ``F.aggregate`` folds are evaluated *interpreted* with
    per-element boxing — a measured 8.8× penalty on a 20M×32 scoring pass
    (BENCH/BASELINE.md, attention A/B: 277.4s HOF vs 31.5s unrolled,
    bit-identical sums). Unrolling keeps the whole reduction inside
    whole-stage codegen; use it whenever the vector width is statically
    known and small enough (≤128) not to strain codegen method limits.
    """
    dot = a[0].cast("double") * b[0].cast("double")
    for i in range(1, dim):
        dot = dot + a[i].cast("double") * b[i].cast("double")
    return dot


def cosine_similarity(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side.

    Returns double; 0.0 for zero-norm inputs. Pass ``dim`` when the vector
    width is statically known: the dot and norms then unroll into plain
    codegen arithmetic (see :func:`unrolled_dot`) instead of interpreted
    higher-order folds — the fast path for pair-space scoring (knn, ANN
    rerank, near-dup filters). Without ``dim`` (or above 128) the
    ``zip_with``+``aggregate`` form is kept.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim is not None and 1 <= dim <= 128:
        dot = unrolled_dot(a, b, dim)
        na = F.sqrt(unrolled_dot(a, a, dim))
        nb = F.sqrt(unrolled_dot(b, b, dim))
    else:
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


def json_long_field(col: Column | str, field: str) -> Column:
    """Extract one integer field from a JSON-string column, JVM-native.

    ``from_json`` with a single-field schema — parsed in the JVM (no UDF),
    prunable by Catalyst, and null-safe: malformed JSON yields null rather
    than failing the job (the right posture for web-scale property bags;
    cross-engine oracles must guard with ``json_valid`` since DuckDB's
    extractor throws on malformed input instead).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, f"{field} long").getField(field)
