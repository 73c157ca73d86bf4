"""Property tests for the cross-engine arithmetic identities the gates
rely on. Pure Python (no Spark session): these pin the MATH the Spark and
DuckDB twins both implement, over far more inputs than the end-to-end
equality tests can afford."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from halvesting_geometric_spark.operators.evalmetrics import dcg_discounts

E6 = 1_000_000


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=200))
def test_cusum_closed_form_identity(ds):
    """max(0, S+d) recursion == P_i - min(0, running_min(P_i)) — the
    identity that lets cusum_changepoints run as two window functions."""
    s, p, pmin = 0, 0, 0
    for d in ds:
        s = max(0, s + d)
        p += d
        pmin = min(pmin, p)
        assert s == p - min(pmin, 0)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-10**12, max_value=10**12),
    st.integers(min_value=1, max_value=10**9),
)
def test_truncdiv_sign_split_emulation(a, b):
    """Spark `div` (trunc toward zero) == the sign-split floor-division
    the conv_trend oracle uses: CASE WHEN a >= 0 THEN a // b ELSE -((-a) // b)."""
    # exact trunc-toward-zero reference, independent of the emulation:
    # floor division corrected upward when signs differ and a remainder exists
    q, r = divmod(a, b)
    spark_div = q + 1 if (q < 0 and r != 0) else q
    emulated = a // b if a >= 0 else -((-a) // b)
    assert emulated == spark_div


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=64))
def test_dcg_discounts_monotone_positive_ints(k):
    """e9 integer discounts: positive, strictly decreasing, first == 1e9
    (1/log2(2)), so integer DCG sums are order-free and well-scaled."""
    d = dcg_discounts(k)
    assert len(d) == k
    assert d[0] == 10**9
    assert all(isinstance(x, int) and x > 0 for x in d)
    assert all(a > b for a, b in zip(d, d[1:]))
    # overflow headroom: worst-case DCG * 1e6 stays under 2^63
    assert sum(d) * E6 < 2**63


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=2,
        max_size=100,
    )
)
def test_linregress_sufficient_sums_match_direct_ols(pts):
    """n·Σxy − ΣxΣy over n·Σx² − (Σx)² equals the direct least-squares
    slope (as an exact rational): cross-check the sufficient-statistic
    form grouped_linregress aggregates distributively."""
    from fractions import Fraction

    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num, denx = n * sxy - sx * sy, n * sxx - sx * sx
    if denx == 0:
        return
    # direct OLS: slope = Σ(x-x̄)(y-ȳ) / Σ(x-x̄)² in exact rationals
    xbar, ybar = Fraction(sx, n), Fraction(sy, n)
    direct = sum((x - xbar) * (y - ybar) for x, y in pts) / sum(
        (x - xbar) ** 2 for x, _ in pts
    )
    assert Fraction(num, denx) == direct
