from __future__ import annotations

import datetime as dt

import pytest

from halvesting_geometric_spark.operators.dialogue import (
    role_transitions,
    turn_gaps,
)


def _tr(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # conv a: user → assistant → user → tool
        ("a", 0, "user", t0),
        ("a", 1, "assistant", t0 + dt.timedelta(seconds=2)),
        ("a", 2, "user", t0 + dt.timedelta(seconds=5)),
        ("a", 3, "tool", t0 + dt.timedelta(seconds=6)),
        # conv b: user → assistant
        ("b", 0, "user", t0),
        ("b", 1, "assistant", t0 + dt.timedelta(seconds=4)),
        # conv c: single turn → no pairs
        ("c", 0, "user", t0),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


def test_role_transitions_counts_and_probs(spark):
    got = {
        (r["from_role"], r["to_role"]): (r["cnt"], r["prob"])
        for r in role_transitions(_tr(spark)).collect()
    }
    assert got == {
        ("user", "assistant"): (2, 2 / 3),
        ("user", "tool"): (1, 1 / 3),
        ("assistant", "user"): (1, 1.0),
    }


def test_turn_gaps_exact_microseconds(spark):
    got = {
        (r["from_role"], r["to_role"]): (
            r["n"],
            r["sum_gap_us"],
            r["mean_gap_us"],
        )
        for r in turn_gaps(_tr(spark)).collect()
    }
    assert got == {
        ("user", "assistant"): (2, 6_000_000, 3_000_000.0),
        ("user", "tool"): (1, 1_000_000, 1_000_000.0),
        ("assistant", "user"): (1, 3_000_000, 3_000_000.0),
    }


def test_role_transitions_probs_sum_to_one(spark):
    rows = role_transitions(_tr(spark)).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_role"]] = by_from.get(r["from_role"], 0.0) + r["prob"]
    for v in by_from.values():
        assert v == pytest.approx(1.0, abs=1e-12)
