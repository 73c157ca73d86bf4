from __future__ import annotations

import math

from halvesting_geometric_spark.operators.evalmetrics import (
    E6,
    calibration_error,
    dcg_discounts,
    ranking_metrics,
)


def _py_metrics(results, truth, k):
    disc = dcg_discounts(k)
    out = {}
    by_q = {}
    for q, item, rank in results:
        by_q.setdefault(q, {})[item] = rank
    truth_by_q = {}
    for q, item in truth:
        truth_by_q.setdefault(q, set()).add(item)
    for q, rel in truth_by_q.items():
        ranks = sorted(
            r for item, r in by_q.get(q, {}).items() if item in rel and r <= k
        )
        n_rel = len(rel)
        hits = len(ranks)
        dcg = sum(disc[r - 1] for r in ranks)
        idcg = sum(disc[: min(n_rel, k)])
        out[q] = dict(
            n_rel=n_rel,
            hits=hits,
            recall_e6=hits * E6 // n_rel,
            rr_e6=E6 // ranks[0] if ranks else 0,
            ndcg_e6=dcg * E6 // idcg,
        )
    return out


def test_ranking_metrics_matches_python_twin(spark):
    results, truth = [], []
    # q0: perfect top-3; q1: partial, deep ranks; q2: zero hits;
    # q3: n_rel > k
    for q in range(4):
        for r in range(1, 11):
            results.append((q, f"i{q}_{r}", r))
    truth += [(0, "i0_1"), (0, "i0_2"), (0, "i0_3")]
    truth += [(1, "i1_4"), (1, "i1_9"), (1, "missing")]
    truth += [(2, "nope1"), (2, "nope2")]
    truth += [(3, f"i3_{r}") for r in range(1, 11)] + [
        (3, f"extra{i}") for i in range(5)
    ]
    rdf = spark.createDataFrame(results, "query_id long, item_id string, rank long")
    tdf = spark.createDataFrame(truth, "query_id long, item_id string")
    got = {
        row["query_id"]: row.asDict()
        for row in ranking_metrics(rdf, tdf, k=10).collect()
    }
    want = _py_metrics(results, truth, 10)
    assert set(got) == set(want)
    for q in want:
        for key, val in want[q].items():
            assert got[q][key] == val, (q, key)
    assert got[0]["ndcg_e6"] == E6  # perfect ranking
    assert got[2]["rr_e6"] == 0 and got[2]["ndcg_e6"] == 0


def test_dcg_discounts_are_e9_integers():
    d = dcg_discounts(5)
    assert all(isinstance(x, int) for x in d)
    assert d[0] == 10**9  # 1/log2(2) == 1
    assert abs(d[1] - 10**9 / math.log2(3)) < 1


def test_calibration_error_exact_integers(spark):
    # perfectly calibrated bin (score 0.5, half positive) and a
    # miscalibrated bin (score 0.9, none positive)
    rows = [(500_000, i % 2) for i in range(100)] + [
        (900_000, 0) for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "score_e6 long, label int")
    out = {r["bin"]: r.asDict() for r in calibration_error(df, bins=10).collect()}
    assert out[5]["gap_e6"] == 0
    assert out[9]["gap_e6"] == 900_000
    # ECE = (100*0 + 100*900000) div 200
    assert out[-1]["gap_e6"] == 450_000
    assert out[-1]["n"] == 200
    # top edge: score exactly 1e6 stays in the last bin
    df2 = spark.createDataFrame([(E6, 1)], "score_e6 long, label int")
    out2 = {r["bin"]: r for r in calibration_error(df2, bins=10).collect()}
    assert 9 in out2
