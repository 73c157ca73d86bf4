"""Rank centrality, DPO pairs, tournament cycles, Spearman correlation.

Anchors are driver-side pure-Python replays (numpy power iteration for the
Markov chain, pandas midranks for Spearman) — the distributed operators must
match them to float tolerance / exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from halvesting_geometric_spark.operators.evalmetrics import (
    spearman_correlation,
)
from halvesting_geometric_spark.operators.preference import (
    dpo_pairs,
    rank_centrality,
    tournament_cycles,
)

COMPS = [
    ("a", "b"), ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"), ("d", "b"), ("d", "c"),
    ("c", "a"),  # one upset so no item is winless
]


def _rc_reference(comparisons, iters):
    """NumPy replay of the Negahban–Oh–Shah walk with the same scaling."""
    items = sorted({x for c in comparisons for x in c if c[0] != c[1]})
    idx = {x: i for i, x in enumerate(items)}
    n = len(items)
    wins = np.zeros((n, n))
    for w, l in comparisons:
        if w != l:
            wins[idx[w], idx[l]] += 1
    tot = wins + wins.T
    P = np.zeros((n, n))
    with np.errstate(invalid="ignore"):
        frac = np.where(tot > 0, wins / np.where(tot > 0, tot, 1), 0.0)
    # move i -> j with prob (wins of j over i)/n_ij / d_max
    deg = (tot > 0).sum(axis=1)
    d_max = deg.max()
    for i in range(n):
        for j in range(n):
            if i != j and tot[i, j] > 0:
                P[i, j] = frac[j, i] / d_max
        P[i, i] = 1.0 - P[i].sum()
    pi = np.full(n, 1.0 / n)
    for _ in range(iters):
        pi = pi @ P
    pi = pi * n / pi.sum()
    return dict(zip(items, pi))


def test_rank_centrality_matches_numpy(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    got = {
        r["item"]: r["score"]
        for r in rank_centrality(df, fixed_iters=5).collect()
    }
    want = _rc_reference(COMPS, 5)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12), i
    # a has the best record -> highest stationary mass
    assert max(got, key=got.get) == "a"


def test_rank_centrality_mean_one(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    scores = [r["score"] for r in rank_centrality(df, fixed_iters=3).collect()]
    assert sum(scores) / len(scores) == pytest.approx(1.0, rel=1e-12)


def test_dpo_pairs_majority_and_margin(spark):
    log = [
        ("a", "b"), ("a", "b"), ("b", "a"),  # a beats b 2-1 -> margin 1
        ("c", "d"), ("d", "c"),              # tie -> dropped
        ("e", "f"),                          # 1-0 -> margin 1
    ]
    df = spark.createDataFrame(log, "winner string, loser string")
    got = {
        (r["chosen"], r["rejected"]): (r["n_votes"], r["margin"])
        for r in dpo_pairs(df).collect()
    }
    assert got == {("a", "b"): (3, 1), ("e", "f"): (1, 1)}
    strict = dpo_pairs(df, min_votes=2).collect()
    assert {(r["chosen"], r["rejected"]) for r in strict} == {("a", "b")}


def test_tournament_cycles_rps(spark):
    rps = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(rps, "winner string, loser string")
    row = tournament_cycles(df).first()
    assert row["n_cycles"] == 1 and row["n_majority_edges"] == 3

    transitive = [("a", "b"), ("b", "c"), ("a", "c")]
    df2 = spark.createDataFrame(transitive, "winner string, loser string")
    row2 = tournament_cycles(df2).first()
    assert row2["n_cycles"] == 0 and row2["n_majority_edges"] == 3


def test_tournament_cycles_majority_not_raw(spark):
    # b beats a on raw count? no: a beats b 2-1, so majority edge is a->b
    log = [("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(log, "winner string, loser string")
    row = tournament_cycles(df).first()
    assert row["n_cycles"] == 1 and row["n_majority_edges"] == 3


def _spearman_reference(pairs_a, pairs_b):
    a = pd.Series(dict(pairs_a))
    b = pd.Series(dict(pairs_b))
    items = a.index.intersection(b.index)
    ra = a[items].rank(method="average")
    rb = b[items].rank(method="average")
    r = np.corrcoef(ra, rb)[0, 1]
    return int(np.floor(r * 1_000_000 + 0.5))


def test_spearman_with_ties_matches_pandas(spark):
    sa = [("a", 10), ("b", 10), ("c", 5), ("d", 7), ("e", 99), ("f", 7)]
    sb = [("a", 1), ("b", 3), ("c", 2), ("d", 2), ("e", 9), ("g", 4)]
    da = spark.createDataFrame(sa, "item string, value long")
    db = spark.createDataFrame(sb, "item string, value long")
    row = spearman_correlation(da, db).first()
    assert row["n_items"] == 5  # g only in b, f only in a
    assert row["spearman_e6"] == _spearman_reference(sa, sb)


def test_spearman_perfect_and_inverse(spark):
    items = [(str(i), i) for i in range(50)]
    inv = [(str(i), -i) for i in range(50)]
    da = spark.createDataFrame(items, "item string, value long")
    db = spark.createDataFrame(inv, "item string, value long")
    assert (
        spearman_correlation(da, da).first()["spearman_e6"] == 1_000_000
    )
    assert (
        spearman_correlation(da, db).first()["spearman_e6"] == -1_000_000
    )


def test_mine_hard_negatives_excludes_positives(spark):
    from halvesting_geometric_spark.operators.similarity import (
        mine_hard_negatives,
    )

    cand = spark.createDataFrame(
        [
            (1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (1, 13, 0.6),
            (2, 10, 0.5), (2, 11, 0.4),
        ],
        "query_id long, neighbor_id long, cosine double",
    )
    pos = spark.createDataFrame(
        [(1, 10), (2, 11)], "query_id long, positive_id long"
    )
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in mine_hard_negatives(cand, pos, k=2).collect()
    }
    # q1: 10 is positive -> hardest negatives are 11, 12; q2: 11 is positive
    assert got == {(1, 11), (1, 12), (2, 10)}


def test_mine_hard_negatives_tie_break_deterministic(spark):
    from halvesting_geometric_spark.operators.similarity import (
        mine_hard_negatives,
    )

    cand = spark.createDataFrame(
        [(1, 30, 0.5), (1, 20, 0.5), (1, 10, 0.5)],
        "query_id long, neighbor_id long, cosine double",
    )
    pos = spark.createDataFrame([(9, 9)], "query_id long, positive_id long")
    rows = mine_hard_negatives(cand, pos, k=2).collect()
    assert [r["neighbor_id"] for r in rows] == [10, 20]


def test_best_of_n_selection(spark):
    from halvesting_geometric_spark.operators.preference import best_of_n

    rewards = [
        ("p1", "r1", 0.5), ("p1", "r2", 0.9), ("p1", "r3", 0.1),
        ("p2", "r4", 0.7), ("p2", "r5", 0.7),  # tie -> smaller id both ends
        ("p3", "r6", 0.3),
    ]
    df = spark.createDataFrame(
        rewards, "prompt_id string, response_id string, reward double"
    )
    got = {r["prompt_id"]: r for r in best_of_n(df).collect()}
    assert got["p1"]["best_response"] == "r2"
    assert got["p1"]["worst_response"] == "r3"
    assert got["p1"]["gap_e6"] == 800_000
    assert got["p1"]["n_responses"] == 3
    assert got["p2"]["best_response"] == "r4"
    assert got["p2"]["worst_response"] == "r4"
    assert got["p2"]["gap_e6"] == 0
    assert got["p3"]["best_response"] == "r6" == got["p3"]["worst_response"]


def test_bt_calibration_buckets(spark):
    from halvesting_geometric_spark.operators.preference import (
        bt_calibration,
    )

    comps = [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c")]
    strengths = [("a", 2.0), ("b", 1.0), ("c", 1.0)]
    cdf = spark.createDataFrame(comps, "winner string, loser string")
    sdf = spark.createDataFrame(strengths, "item string, strength double")
    rows = {r["bucket"]: r for r in bt_calibration(cdf, sdf, buckets=10).collect()}
    # (a,b) pred P(a wins) = 2/3 and (a,c) pred = 2/3 both land in bucket 6:
    # 4 rows total, a wins 3 of them
    assert set(rows) == {6}
    assert rows[6]["n"] == 4 and rows[6]["a_wins"] == 3
    assert rows[6]["emp_winrate_e6"] == 750_000
    assert rows[6]["mean_pred_e6"] == 666_667


def test_bt_calibration_fold_and_clamp(spark):
    from halvesting_geometric_spark.operators.preference import (
        bt_calibration,
    )

    comps = [("a", "b"), ("a", "c")]
    strengths = [("a", 1.0), ("b", 0.0), ("c", 1.0)]
    cdf = spark.createDataFrame(comps, "winner string, loser string")
    sdf = spark.createDataFrame(strengths, "item string, strength double")
    rows = {r["bucket"]: r for r in bt_calibration(cdf, sdf, buckets=10).collect()}
    # (a,b): pred = 1/(1+0) = 1.0 -> clamped to bucket 9
    assert rows[9]["n"] == 1 and rows[9]["a_wins"] == 1
    assert rows[9]["mean_pred_e6"] == 1_000_000
    # (a,c): pred = 0.5 -> bucket 5
    assert rows[5]["n"] == 1 and rows[5]["emp_winrate_e6"] == 1_000_000
