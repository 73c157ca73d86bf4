from __future__ import annotations

import math

import numpy as np

from halvesting_geometric_spark.operators.quantiles import (
    weighted_quantiles,
)


def _brute(pairs, p):
    # type-1 weighted quantile: smallest v with cumweight >= ceil(p*W)
    pairs = sorted(pairs)
    total = sum(w for _, w in pairs)
    rank = math.ceil(total * p)
    cum = 0
    for v, w in pairs:
        cum += w
        if cum >= rank:
            return v
    return pairs[-1][0]


def test_weighted_quantiles_bruteforce(spark):
    rng = np.random.RandomState(9)
    rows = [
        ("g%d" % (i % 2), int(rng.randint(0, 100)), int(rng.randint(1, 10)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v int, w int")
    got = {
        r.g: r
        for r in weighted_quantiles(df, "g", "v", "w", ps=(0.5, 0.9)).collect()
    }
    for g in ("g0", "g1"):
        pairs = [(v, w) for gg, v, w in rows if gg == g]
        # groupBy sums weights per distinct value first — same result
        assert got[g].q_50 == _brute(pairs, 0.5)
        assert got[g].q_90 == _brute(pairs, 0.9)
        assert got[g].w_total == sum(w for _, w in pairs)


def test_weighted_quantiles_mass_vs_count(spark):
    # 10 light rows at value 1, one heavy row at value 100: the weighted
    # median is 100 even though the count median is 1
    rows = [("a", 1, 1)] * 10 + [("a", 100, 50)]
    df = spark.createDataFrame(rows, "g string, v int, w int")
    r = weighted_quantiles(df, "g", "v", "w", ps=(0.5,)).first()
    assert r.q_50 == 100 and r.w_total == 60


def test_weighted_quantiles_zero_weights_dropped(spark):
    rows = [("a", 5, 3), ("a", 9, 0)]
    df = spark.createDataFrame(rows, "g string, v int, w int")
    r = weighted_quantiles(df, "g", "v", "w", ps=(0.99,)).first()
    assert r.q_99 == 5 and r.w_total == 3
