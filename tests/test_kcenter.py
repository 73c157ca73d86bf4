from __future__ import annotations

import numpy as np
import pytest

from halvesting_geometric_spark.operators.similarity import kcenter_select


def _de4(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    cos = 0.0 if na == 0 or nb == 0 else float(np.dot(a, b) / (na * nb))
    return 10_000 - int(np.floor(cos * 10_000 + 0.5))


def _greedy(vecs, k):
    ids = sorted(vecs)
    sel = [ids[0]]
    md = {i: _de4(vecs[i], vecs[sel[0]]) for i in ids}
    while len(sel) < k:
        best = max(
            (i for i in ids if i not in sel), key=lambda i: (md[i], -i)
        )
        sel.append(best)
        for i in ids:
            md[i] = min(md[i], _de4(vecs[i], vecs[best]))
    return sel


def test_kcenter_matches_greedy_twin(spark):
    rng = np.random.RandomState(13)
    # 3 well-separated clusters + noise: greedy must visit each cluster early
    centers = np.eye(8)[:3] * 10
    vecs = {}
    for i in range(60):
        c = centers[i % 3]
        vecs[i] = (c + rng.normal(0, 0.3, 8)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = [
        r.id
        for r in kcenter_select(df, k=6, dim=8)
        .orderBy("sel_order")
        .collect()
    ]
    assert got == _greedy(vecs, 6)
    # the first 3 picks cover all 3 clusters (diversity property)
    assert {i % 3 for i in got[:3]} == {0, 1, 2}


def test_kcenter_k1_and_validation(spark):
    df = spark.createDataFrame(
        [(5, [1.0, 0.0]), (9, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_select(df, k=1, dim=2).collect()
    assert [(r.sel_order, r.id) for r in out] == [(0, 5)]
    with pytest.raises(ValueError):
        kcenter_select(df, k=3, dim=2)
    with pytest.raises(ValueError):
        kcenter_select(df, k=0, dim=2)
