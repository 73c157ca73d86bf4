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


def _tool_tr(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    # (conv, turn, tool): '' = non-tool turn, dropped before adjacency
    rows = [
        ("a", 0, "t1"), ("a", 1, ""), ("a", 2, "t1"), ("a", 3, "t1"),
        ("a", 4, "t2"), ("a", 5, "t1"),
        ("b", 0, "t2"), ("b", 1, "t2"), ("b", 2, "t2"),
        ("c", 0, None), ("c", 1, "t3"),
    ]
    return spark.createDataFrame(
        [(c, i, "user", t, t0 + dt.timedelta(seconds=i)) for c, i, t in rows],
        "conv_id string, turn_idx int, role string, tool string, ts timestamp",
    )


def test_tool_sequences_bigrams(spark):
    from halvesting_geometric_spark.operators.dialogue import tool_sequences

    got = {
        r["gram"]: r["cnt"]
        for r in tool_sequences(_tool_tr(spark), n=2).collect()
    }
    # conv a tool subsequence: t1 t1 t1 t2 t1; conv b: t2 t2 t2; conv c: t3
    assert got == {"t1>t1": 2, "t1>t2": 1, "t2>t1": 1, "t2>t2": 2}


def test_tool_sequences_trigrams_and_min_count(spark):
    from halvesting_geometric_spark.operators.dialogue import tool_sequences

    got = {
        r["gram"]: r["cnt"]
        for r in tool_sequences(_tool_tr(spark), n=3).collect()
    }
    # conv a tool subsequence t1 t1 t1 t2 t1; conv b t2 t2 t2; conv c too short
    assert got == {
        "t1>t1>t1": 1, "t1>t1>t2": 1, "t1>t2>t1": 1, "t2>t2>t2": 1,
    }
    assert tool_sequences(_tool_tr(spark), n=3, min_count=2).count() == 0


def test_tool_sequences_unigrams_are_tool_counts(spark):
    from halvesting_geometric_spark.operators.dialogue import tool_sequences

    got = {
        r["gram"]: r["cnt"]
        for r in tool_sequences(_tool_tr(spark), n=1).collect()
    }
    assert got == {"t1": 4, "t2": 4, "t3": 1}


def test_tool_runs_gaps_and_islands(spark):
    from halvesting_geometric_spark.operators.dialogue import tool_runs

    got = {
        (r["conv_id"], r["tool"], r["start_idx"]): r["run_len"]
        for r in tool_runs(_tool_tr(spark), min_len=2).collect()
    }
    # conv a: t1 at turns 2,3 is a run of 2 (turn 0's t1 is broken by the
    # non-tool turn 1? NO - non-tool turns are dropped first, so the tool
    # subsequence of conv a is t1(0) t1(2) t1(3) t2(4) t1(5): run of 3.
    assert got == {("a", "t1", 0): 3, ("b", "t2", 0): 3}


def test_tool_runs_min_len_one_covers_every_tool_turn(spark):
    from halvesting_geometric_spark.operators.dialogue import tool_runs

    rows = tool_runs(_tool_tr(spark), min_len=1).collect()
    assert sum(r["run_len"] for r in rows) == 9  # 9 tool-bearing turns
