"""Property-based tests (hypothesis): pure kernels get wide random
coverage; Spark-backed properties use few, large examples so each example
is one job, not one job per row."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.multimodal import (
    gif_bytes,
    jpeg_bytes,
    parse_image_header,
    png_bytes,
)

_spark_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
    fmt=st.sampled_from(["png", "jpeg", "gif"]),
)
@settings(max_examples=200, deadline=None)
def test_parse_image_header_roundtrips_any_dims(w, h, fmt):
    build = {"png": png_bytes, "jpeg": jpeg_bytes, "gif": gif_bytes}[fmt]
    assert parse_image_header(build(w, h)) == (fmt, w, h)


@given(data=st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_parse_image_header_never_raises_on_garbage(data):
    fmt, w, h = parse_image_header(data)
    assert fmt in (None, "png", "jpeg", "gif")
    # dimensions only ever come with a recognized container
    if fmt is None:
        assert w is None and h is None


@given(
    vals=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
    ),
    n=st.integers(min_value=0, max_value=40),
)
@_spark_settings
def test_take_smallest_exact_equals_sorted_head(spark, vals, n):
    from halvesting_geometric_spark.operators.sampling import take_smallest_exact

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "_h long, id long"
    )
    got = sorted(
        (r["_h"], r["id"])
        for r in take_smallest_exact(df, n, tie_cols=("id",)).collect()
    )
    exp = sorted((v, i) for i, v in enumerate(vals))[: min(n, len(vals))]
    assert got == exp


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=120,
    )
)
@_spark_settings
def test_canonical_edges_is_canonical_and_idempotent(spark, pairs):
    from halvesting_geometric_spark.operators.graph import canonical_edges

    edges = spark.createDataFrame(pairs, "src long, dst long")
    canon = canonical_edges(edges)
    rows = [(r["src"], r["dst"]) for r in canon.collect()]
    # src < dst, no dups, and the undirected edge set is preserved
    assert all(a < b for a, b in rows)
    assert len(rows) == len(set(rows))
    exp = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    assert set(rows) == exp
    # idempotent
    again = [(r["src"], r["dst"]) for r in canonical_edges(canon).collect()]
    assert sorted(again) == sorted(rows)
