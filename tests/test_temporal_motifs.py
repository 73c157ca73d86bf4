from __future__ import annotations

import datetime as dt
import itertools

import numpy as np
import pytest

from halvesting_geometric_spark.operators.temporal import temporal_triangles

BASE = dt.datetime(2026, 1, 1)


def _brute(events: list[tuple[str, str, int]], delta_s: int) -> int:
    d_us = delta_s * 1_000_000
    ev = [(u, v, t * 1_000_000) for u, v, t in events]
    n = 0
    for (u1, v1, t1), (u2, v2, t2), (u3, v3, t3) in itertools.permutations(ev, 3):
        if (
            v1 == u2
            and v2 == u3
            and v3 == u1
            and t1 < t2 < t3 <= t1 + d_us
        ):
            n += 1
    return n


def _df(spark, events):
    rows = [(u, v, BASE + dt.timedelta(seconds=t)) for u, v, t in events]
    return spark.createDataFrame(
        rows, "src_conv string, dst_conv string, ts timestamp"
    )


def test_temporal_triangles_matches_bruteforce(spark):
    rng = np.random.RandomState(11)
    nodes = [f"n{i}" for i in range(8)]
    events = []
    for _ in range(120):
        u, v = rng.choice(len(nodes), 2, replace=False)
        events.append((nodes[u], nodes[v], int(rng.randint(0, 5000))))
    for delta in (300, 1500, 5000):
        got = temporal_triangles(_df(spark, events), delta).first()[0]
        assert got == _brute(events, delta), delta


def test_temporal_triangles_bucket_boundaries(spark):
    # t1 on an exact delta multiple; t3 exactly at t1 + delta (inclusive)
    events = [("a", "b", 100), ("b", "c", 150), ("c", "a", 200)]
    assert temporal_triangles(_df(spark, events), 100).first()[0] == 1
    # t3 one past the window -> excluded
    events2 = [("a", "b", 100), ("b", "c", 150), ("c", "a", 201)]
    assert temporal_triangles(_df(spark, events2), 100).first()[0] == 0
    # ties excluded by strict ordering
    events3 = [("a", "b", 100), ("b", "c", 100), ("c", "a", 150)]
    assert temporal_triangles(_df(spark, events3), 100).first()[0] == 0


def test_temporal_triangles_multiplicity(spark):
    # duplicated closing event doubles the count (occurrence semantics)
    events = [
        ("a", "b", 10),
        ("b", "c", 20),
        ("c", "a", 30),
        ("c", "a", 31),
    ]
    assert temporal_triangles(_df(spark, events), 60).first()[0] == 2


@pytest.mark.parametrize("cap,expect_exact", [(4096, True), (1, False)])
def test_temporal_triangles_cap(spark, cap, expect_exact):
    # hot middle vertex: many wedges through b inside one window
    events = [("a%d" % i, "b", 10 + i) for i in range(6)]
    events += [("b", "c%d" % i, 30 + i) for i in range(6)]
    events += [("c%d" % i, "a%d" % j, 50 + i + 6 * j) for i in range(6) for j in range(6)]
    exact = _brute(events, 600)
    assert exact > 0
    got = temporal_triangles(_df(spark, events), 600, max_per_bucket=cap).first()[0]
    if expect_exact:
        assert got == exact
    else:
        assert got < exact
