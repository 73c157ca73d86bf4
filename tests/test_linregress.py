from __future__ import annotations

import numpy as np

from halvesting_geometric_spark.operators.relational import grouped_linregress

E6 = 1_000_000


def _twin(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    trunc = lambda a, b: abs(a) * E6 // b * (1 if a >= 0 else -1)
    slope = trunc(num, denx) if denx > 0 else None
    iy = sy * E6 - slope * sx if slope is not None else None
    intercept = (
        (abs(iy) // n) * (1 if iy >= 0 else -1) if iy is not None else None
    )
    r2 = (
        int(np.floor(float(num) * num / (float(denx) * deny) * E6 + 0.5))
        if denx > 0 and deny > 0
        else None
    )
    return slope, intercept, r2


def test_grouped_linregress_matches_twin_and_numpy(spark):
    rng = np.random.RandomState(5)
    rows, series = [], {}
    for g, (a, b) in enumerate([(3, 10), (-4, 500), (0, 7)]):
        xs = list(range(30))
        ys = [a * x + b + int(rng.randint(-5, 6)) for x in xs]
        series[g] = (xs, ys)
        rows += [(g, x, y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    out = {r.g: r for r in grouped_linregress(df, "g", "x", "y").collect()}
    for g, (xs, ys) in series.items():
        slope, intercept, r2 = _twin(xs, ys)
        assert out[g].slope_e6 == slope
        assert out[g].intercept_e6 == intercept
        assert out[g].r2_e6 == r2
        # sanity vs numpy polyfit at e3 tolerance
        np_slope, np_int = np.polyfit(xs, ys, 1)
        assert abs(out[g].slope_e6 / E6 - np_slope) < 1e-3
        assert abs(out[g].intercept_e6 / E6 - np_int) < 1e-3
    assert out[1].slope_e6 < 0  # negative trend, trunc-div semantics pinned


def test_grouped_linregress_degenerate(spark):
    rows = [("cx", 5, i) for i in range(4)]  # constant x
    rows += [("cy", i, 9) for i in range(4)]  # constant y
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in grouped_linregress(df, "g", "x", "y").collect()}
    assert out["cx"].slope_e6 is None and out["cx"].r2_e6 is None
    assert out["cy"].slope_e6 == 0 and out["cy"].r2_e6 is None
    assert out["cy"].intercept_e6 == 9 * E6
