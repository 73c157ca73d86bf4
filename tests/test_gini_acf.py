from __future__ import annotations

import collections
import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from halvesting_geometric_spark.operators.anomaly import acf_counts
from halvesting_geometric_spark.operators.metrics import gini_coefficient


def test_gini_matches_sorted_identity(spark):
    rng = np.random.RandomState(5)
    vals = np.concatenate(
        [rng.randint(0, 10, 300), rng.randint(0, 200, 50)]
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "value int")
    x = np.sort(vals)
    n = len(x)
    i = np.arange(1, n + 1)
    g_classic = (2 * np.sum(i * x)) / (n * x.sum()) - (n + 1) / n
    # midrank-identity replication (what the operator computes exactly)
    hist = collections.Counter(int(v) for v in vals)
    r2, less = {}, 0
    for v in sorted(hist):
        c = hist[v]
        r2[v] = 2 * less + c + 1
        less += c
    s2 = sum(c * v * r2[v] for v, c in hist.items())
    g = float(s2) / (float(n) * float(x.sum())) - (float(n) + 1) / float(n)
    assert abs(g - g_classic) < 1e-12
    r = gini_coefficient(df, "value").first()
    assert r.gini_e6 == math.floor(g * 1e6 + 0.5)
    assert (r.n, r.total) == (n, int(x.sum()))


def test_gini_extremes(spark):
    # perfectly equal -> 0
    eq = spark.createDataFrame([(7,)] * 100, "value int")
    assert gini_coefficient(eq, "value").first().gini_e6 == 0
    # all mass on one of n -> (n-1)/n
    conc = spark.createDataFrame([(0,)] * 99 + [(100,)], "value int")
    assert conc.count() == 100
    assert gini_coefficient(conc, "value").first().gini_e6 == 990_000


@pytest.fixture(scope="module")
def hourly_events(spark):
    rng = np.random.RandomState(2)
    base = datetime(2026, 1, 1)
    rows = []
    for h in range(24 * 10):
        cnt = 5 + (10 if h % 24 in (9, 10, 11) else 0) + int(
            rng.randint(0, 3)
        )
        for _ in range(cnt):
            rows.append(
                (
                    base
                    + timedelta(hours=h, minutes=int(rng.randint(0, 60))),
                )
            )
    return spark.createDataFrame(rows, "ts timestamp"), rows


def test_acf_matches_bruteforce(hourly_events):
    ev, rows = hourly_events
    counts: collections.Counter = collections.Counter()
    for (t,) in rows:
        counts[int(t.timestamp()) // 3600] += 1
    lo, hi = min(counts), max(counts)
    series = [counts.get(b, 0) for b in range(lo, hi + 1)]
    got = {
        r.lag: (r.r_e6, r.n_pairs)
        for r in acf_counts(ev, lags=(1, 24)).collect()
    }
    for k in (1, 24):
        xs, ys = series[:-k], series[k:]
        nn = float(len(xs))
        sx, sy = float(sum(xs)), float(sum(ys))
        sxy = float(sum(a * b for a, b in zip(xs, ys)))
        sxx = float(sum(a * a for a in xs))
        syy = float(sum(b * b for b in ys))
        cov = nn * sxy - sx * sy
        vx, vy = nn * sxx - sx * sx, nn * syy - sy * sy
        want = math.floor(cov / math.sqrt(vx * vy) * 1e6 + 0.5)
        assert got[k] == (want, len(xs))
    # the daily period must dominate the 1-hour neighbour correlation
    assert got[24][0] > got[1][0]


def test_acf_constant_series_is_null(spark):
    rows = [
        (datetime(2026, 1, 1) + timedelta(hours=h),) for h in range(48)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp")
    for r in acf_counts(ev, lags=(1, 2)).collect():
        assert r.r_e6 is None


def test_decayed_counts_bruteforce(spark):
    from halvesting_geometric_spark.operators.events import decayed_counts

    rows = []
    base = datetime(2026, 1, 10)
    for u, offs in [(1, [0, 1, 2]), (2, [0, 48]), (3, [200])]:
        for h in offs:
            rows.append((u, base - timedelta(hours=h)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    tmax = max(int(t.timestamp()) for _, t in rows)
    want = {}
    for u, t in rows:
        age = (tmax - int(t.timestamp())) // 3600
        w9 = math.floor(2 ** (-(float(age) / 24.0)) * 1e9 + 0.5)
        s, n = want.get(u, (0, 0))
        want[u] = (s + w9, n + 1)
    got = {
        r.user_id: (r.score_e9, r.n_events)
        for r in decayed_counts(
            ev, "user_id", "ts", halflife_hours=24.0
        ).collect()
    }
    assert got == want
    # a 24h-old event is worth exactly half a fresh one
    assert got[2][0] == 1_000_000_000 + 250_000_000  # 0h + 48h = 1 + 1/4


def test_degree_mixing_matrix_bruteforce(spark):
    from halvesting_geometric_spark.operators.metrics import (
        degree_mixing_matrix,
    )

    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 1), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    outd = collections.Counter(s for s, _ in edges)
    ind = collections.Counter(d for _, d in edges)
    want = collections.Counter(
        (
            math.floor(math.log2(outd[s])),
            math.floor(math.log2(ind[d])),
        )
        for s, d in edges
    )
    got = {
        (r.src_class, r.dst_class): (r.cnt, r.frac_e6)
        for r in degree_mixing_matrix(df).collect()
    }
    assert set(got) == set(want)
    for k, c in want.items():
        assert got[k] == (c, math.floor(c * 1e6 / len(edges) + 0.5))


def test_herfindahl_bruteforce(spark):
    from halvesting_geometric_spark.operators.metrics import herfindahl_index

    rows = (
        [("en", "s1")] * 50
        + [("en", "s2")] * 30
        + [("en", "s3")] * 20
        + [("fr", "s1")] * 100
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {r.lang: r for r in herfindahl_index(df, "lang", "source").collect()}
    hhi_en = (50 * 50 + 30 * 30 + 20 * 20) / (100 * 100)
    assert got["en"].hhi_e6 == math.floor(hhi_en * 1e6 + 0.5)
    assert got["en"].n_cats == 3
    # monopoly -> exactly 1.0
    assert got["fr"].hhi_e6 == 1_000_000 and got["fr"].n_cats == 1


def test_decayed_counts_empty_input(spark):
    from halvesting_geometric_spark.operators.events import decayed_counts

    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    out = decayed_counts(ev, "user_id", "ts")
    assert out.columns == ["user_id", "score_e9", "n_events"]
    assert out.count() == 0
