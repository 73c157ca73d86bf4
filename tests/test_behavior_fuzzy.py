"""Round-3d batch 2: funnels, cohorts, session paths, fuzzy matching,
hitting probabilities — each against an independent pure-Python twin."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.behavior import (
    cohort_retention,
    funnel_steps,
    session_paths,
)
from halvesting_geometric_spark.operators.fuzzy import fuzzy_pairs
from halvesting_geometric_spark.operators.traversal import hitting_probability

_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, _EV_SCHEMA)


def _t(h, m=0):
    return dt.datetime(2026, 1, 1) + dt.timedelta(hours=h, minutes=m)


# ------------------------------------------------------------------ funnel


def test_funnel_order_enforced(spark):
    rows = [
        # user 1: view -> click -> purchase in order: 3 steps
        (1, _t(0), 1, "view", 0.0), (2, _t(1), 1, "click", 0.0),
        (3, _t(2), 1, "purchase", 0.0),
        # user 2: click BEFORE view, never clicks after: stops at view
        (4, _t(0), 2, "click", 0.0), (5, _t(1), 2, "view", 0.0),
        # user 3: purchase before click: view -> click only
        (6, _t(0), 3, "view", 0.0), (7, _t(1), 3, "purchase", 0.0),
        (8, _t(2), 3, "click", 0.0),
        # user 4: no view at all
        (9, _t(0), 4, "purchase", 0.0),
    ]
    out = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 2}  # user 4 absent (never entered)


def test_funnel_same_timestamp_counts(spark):
    rows = [(1, _t(0), 1, "view", 0.0), (2, _t(0), 1, "click", 0.0)]
    out = funnel_steps(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert out["steps_completed"] == 2


# ------------------------------------------------------------------ cohorts


def test_cohort_retention_twin(spark):
    # user 1 first week 0, active weeks 0 and 2; user 2 first week 1
    rows = [
        (1, dt.datetime(2026, 1, 5), 1, "view", 0.0),    # Mon wk0
        (2, dt.datetime(2026, 1, 19), 1, "view", 0.0),   # Mon wk2
        (3, dt.datetime(2026, 1, 14), 2, "view", 0.0),   # wk1
        (4, dt.datetime(2026, 1, 15), 2, "view", 0.0),   # wk1 again
    ]
    out = {
        (r["cohort"].day, r["offset"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows), bucket="week").collect()
    }
    assert out == {(5, 0): 1, (5, 2): 1, (12, 0): 1}


# ------------------------------------------------------------ session paths


def test_session_paths_twin(spark):
    rows = [
        (1, _t(0), 1, "view", 0.0), (2, _t(0, 5), 1, "click", 0.0),
        # >30min gap: new session
        (3, _t(2), 1, "view", 0.0), (4, _t(2, 10), 1, "click", 0.0),
        (5, _t(5), 2, "view", 0.0), (6, _t(5, 1), 2, "click", 0.0),
        (7, _t(9), 2, "error", 0.0),
    ]
    out = {r["path"]: r["n_sessions"]
           for r in session_paths(_ev(spark, rows), min_count=1).collect()}
    assert out == {"view>click": 3, "error": 1}


def test_session_paths_max_len_caps(spark):
    rows = [(i, _t(0, i), 1, "view", 0.0) for i in range(20)]
    out = session_paths(_ev(spark, rows), max_len=3, min_count=1).collect()
    assert out[0]["path"] == "view>view>view"


# ------------------------------------------------------------------- fuzzy


def test_fuzzy_pairs_twin(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en"),
            (2, "the quick brown fix", "en"),   # distance 1 to id 1
            (3, "completely different text!!", "en"),
            (4, "the quick brown fox", "fr"),   # same text, other block
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["a"], r["b"]): r["distance"]
        for r in fuzzy_pairs(
            df, "doc_id", "text", block_cols=["lang"], max_distance=3
        ).collect()
    }
    assert got == {(1, 2): 1}


def test_fuzzy_pairs_block_cap_drops_quadratic_block(spark):
    rows = [(i, "same text", "en") for i in range(50)] + [
        (100, "abc", "fr"), (101, "abd", "fr")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = fuzzy_pairs(
        df, "doc_id", "text", block_cols=["lang"], max_distance=3, max_block=10
    ).collect()
    assert {(r["a"], r["b"]) for r in got} == {(100, 101)}


# ------------------------------------------------------- hitting probability


def _hit_twin(edges, n, targets, steps):
    out = {v: [] for v in range(n)}
    for s, d in edges:
        out[s].append(d)
    h = [1.0 if v in targets else 0.0 for v in range(n)]
    for _ in range(steps):
        nh = []
        for v in range(n):
            if v in targets:
                nh.append(1.0)
            elif out[v]:
                nh.append(sum(h[u] for u in out[v]) / len(out[v]))
            else:
                nh.append(0.0)
        h = nh
    return h


def test_hitting_probability_twin(spark):
    rng = random.Random(9)
    n = 12
    edges = [(a, b) for a in range(n) for b in range(n)
             if a != b and rng.random() < 0.25]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = {
        r["vertex_id"]: r["hit_prob"]
        for r in hitting_probability(e, v, [0, 1], steps=4).collect()
    }
    want = _hit_twin(edges, n, {0, 1}, 4)
    for vid in range(n):
        assert got[vid] == pytest.approx(want[vid], abs=1e-12)


def test_hitting_probability_line(spark):
    # 0<-1<-2: target {0}; h after 2 steps: v1=1 (one hop), v2=1 (two hops)
    e = spark.createDataFrame([(1, 0), (2, 1)], "src long, dst long")
    v = spark.range(3).select(F.col("id").alias("vertex_id"))
    got = {r["vertex_id"]: r["hit_prob"]
           for r in hitting_probability(e, v, [0], steps=2).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0}


def test_engagement_gini_matches_numpy_twin(spark):
    import numpy as np

    from halvesting_geometric_spark.operators.behavior import engagement_gini

    rng = np.random.RandomState(3)
    rows = []
    # group "even": perfectly equal; group "skew": one dominant actor
    for u in range(10):
        rows += [("even", u)] * 5
    rows += [("skew", 0)] * 91
    for u in range(1, 10):
        rows += [("skew", u)]
    for _ in range(200):
        rows.append(("rand", int(rng.zipf(1.7) % 20)))
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {r.event_type: r for r in engagement_gini(df).collect()}

    def twin(xs):
        xs = np.sort(np.asarray(xs, dtype=np.int64))
        n, tot = len(xs), xs.sum()
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(((2 * i - n - 1) * xs).sum())
        return num * 1_000_000 // int(n * tot)

    from collections import Counter

    for g in ("even", "skew", "rand"):
        counts = Counter(u for gg, u in rows if gg == g)
        assert got[g].gini_e6 == twin(list(counts.values())), g
    assert got["even"].gini_e6 == 0
    assert got["skew"].gini_e6 > 700_000  # heavy concentration
