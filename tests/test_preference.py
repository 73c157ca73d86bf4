"""Bradley–Terry strengths and win-rate matrix (operators/preference.py).

The BT anchor is a pure-Python replay of Hunter's MM update on the same
comparison log — the operator must match it to float tolerance, and its
qualitative ranking must put the item with the best record on top.
"""

from __future__ import annotations

import pytest

from halvesting_geometric_spark.operators.preference import (
    bradley_terry,
    win_rate_matrix,
)


def _mm_reference(comparisons, iters):
    """Driver-side MM replay: dict-based, same update and mean-1 rescale."""
    wins: dict = {}
    pairs: dict = {}
    items = set()
    for w, l in comparisons:
        if w == l:
            continue
        items.update((w, l))
        wins[w] = wins.get(w, 0) + 1
        key = (min(w, l), max(w, l))
        pairs[key] = pairs.get(key, 0) + 1
    p = {i: 1.0 for i in items}
    for _ in range(iters):
        denom = {i: 0.0 for i in items}
        for (a, b), n in pairs.items():
            denom[a] += n / (p[a] + p[b])
            denom[b] += n / (p[a] + p[b])
        p = {i: wins.get(i, 0) / denom[i] for i in items}
        s = sum(p.values())
        p = {i: v * len(items) / s for i, v in p.items()}
    return p


COMPS = [
    # a beats everyone repeatedly; c never wins; b/d trade wins
    ("a", "b"), ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"), ("d", "b"), ("d", "c"),
]


def test_bradley_terry_matches_mm_reference(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    res = bradley_terry(df, fixed_iters=4)
    got = {r["item"]: r["strength"] for r in res.strengths.collect()}
    want = _mm_reference(COMPS, 4)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12), i
    assert res.num_items == 4
    assert res.num_pairs == 6  # ab, ac, ad, bc, bd, cd


def test_bradley_terry_ranking_and_zero_win(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    res = bradley_terry(df, fixed_iters=6)
    got = {r["item"]: r["strength"] for r in res.strengths.collect()}
    # a is undefeated -> strictly strongest; c never wins -> exactly 0
    assert got["a"] == max(got.values())
    assert got["c"] == 0.0
    assert all(v >= 0.0 for v in got.values())
    # mean-1 normalization
    assert sum(got.values()) == pytest.approx(len(got), rel=1e-12)


def test_bradley_terry_multiplicity_matters(spark):
    # doubling a's wins over b must raise a's strength
    base = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "winner string, loser string"
    )
    tilted = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"), ("c", "a")],
        "winner string, loser string",
    )
    s0 = {
        r["item"]: r["strength"]
        for r in bradley_terry(base, fixed_iters=5).strengths.collect()
    }
    s1 = {
        r["item"]: r["strength"]
        for r in bradley_terry(tilted, fixed_iters=5).strengths.collect()
    }
    # rock-paper-scissors base case is fully symmetric
    assert s0["a"] == pytest.approx(s0["b"], rel=1e-12)
    assert s0["b"] == pytest.approx(s0["c"], rel=1e-12)
    assert s1["a"] > s1["b"]


def test_bradley_terry_drops_self_comparisons(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "winner string, loser string"
    )
    res = bradley_terry(df, fixed_iters=2)
    assert res.num_items == 2
    got = {r["item"]: r["strength"] for r in res.strengths.collect()}
    assert got["a"] > got["b"] == 0.0


def test_bradley_terry_rejects_bad_iters(spark):
    df = spark.createDataFrame([("a", "b")], "winner string, loser string")
    with pytest.raises(ValueError):
        bradley_terry(df, fixed_iters=0)


def test_win_rate_matrix_exact(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    rows = {
        (r["item_a"], r["item_b"]): r
        for r in win_rate_matrix(df).collect()
    }
    ab = rows[("a", "b")]
    assert (ab["a_wins"], ab["n_total"], ab["a_winrate_e6"]) == (
        2,
        2,
        1_000_000,
    )
    bd = rows[("b", "d")]  # b beat d once, d beat b once
    assert (bd["a_wins"], bd["n_total"], bd["a_winrate_e6"]) == (1, 2, 500_000)
    cd = rows[("c", "d")]  # d beat c once -> a side (c) has 0 wins
    assert (cd["a_wins"], cd["n_total"], cd["a_winrate_e6"]) == (0, 1, 0)


def test_win_rate_matrix_min_total(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    kept = win_rate_matrix(df, min_total=2).collect()
    assert {(r["item_a"], r["item_b"]) for r in kept} == {
        ("a", "b"),
        ("b", "d"),
    }
