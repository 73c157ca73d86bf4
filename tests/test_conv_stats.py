from __future__ import annotations

import collections
import math
from datetime import datetime, timedelta

from halvesting_geometric_spark.operators.dialogue import conversation_stats

ROWS = [
    # conv, idx, role, text, tool, hour
    ("a", 0, "user", "hello there", "", 0),
    ("a", 1, "assistant", "hi", "t1", 1),
    ("a", 2, "user", "bye", "", 3),
    ("b", 0, "user", "solo turn", "", 5),
    ("c", 0, "system", "x", "t2", 0),
    ("c", 1, "system", "yy", "t3", 10),
]


def test_conversation_stats_bruteforce(spark):
    base = datetime(2026, 2, 1)
    df = spark.createDataFrame(
        [
            (c, i, r, t, tool, base + timedelta(hours=h))
            for c, i, r, t, tool, h in ROWS
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    got = {r.conv_id: r for r in conversation_stats(df).collect()}
    for conv in ("a", "b", "c"):
        turns = [r for r in ROWS if r[0] == conv]
        n = len(turns)
        rc = collections.Counter(r[2] for r in turns)
        s = sum(
            c * math.floor(math.log2(c) * 1e9 + 0.5) for c in rc.values()
        )
        ent = math.floor(
            (math.log2(float(n)) - float(s) / (float(n) * 1e9)) * 1e6 + 0.5
        )
        chars = sum(len(r[3]) for r in turns)
        tools = sum(1 for r in turns if r[4])
        dur = (max(r[5] for r in turns) - min(r[5] for r in turns)) * 3600
        g = got[conv]
        assert (g.n_turns, g.n_roles, g.role_entropy_e6) == (n, len(rc), ent)
        assert (g.n_tool_turns, g.total_chars, g.duration_s) == (
            tools,
            chars,
            dur,
        )
        assert g.tool_rate_e6 == math.floor(tools * 1e6 / n + 0.5)
        assert g.mean_chars_e6 == math.floor(chars * 1e6 / n + 0.5)
    # single-role conv has zero entropy; two evenly-split roles < 'a'
    assert got["b"].role_entropy_e6 == 0
    assert got["c"].role_entropy_e6 == 0  # both turns same role
    assert got["a"].role_entropy_e6 > 0
