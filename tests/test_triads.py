"""Triad census: exhaustive-enumeration twin + hand-checked fixtures.

The distributed pipeline (wedge enumeration + single-link/null closed
forms) is validated against a brute-force O(n³) census; the 64→16 code map
itself carries an import-time permutation-invariance assertion and is
pinned here on hand-drawn canonical triads.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.triads import (
    CODE_TO_NAME,
    TRIAD_NAMES,
    _ARCS,
    triad_census,
)


def _brute_census(pairs, n):
    adj = set(pairs)
    counts = dict.fromkeys(TRIAD_NAMES, 0)
    for x, y, z in combinations(range(n), 3):
        nodes = (x, y, z)
        code = 0
        for i, (a, b) in enumerate(_ARCS):
            if (nodes[a], nodes[b]) in adj:
                code |= 1 << i
        counts[CODE_TO_NAME[code]] += 1
    return counts


def _census_df_to_dict(df):
    return {r["triad"]: int(r["cnt"]) for r in df.collect()}


def test_code_map_canonical_triads():
    # hand-drawn canonical instances on nodes (0,1,2); arc bit order is
    # (0→1, 1→0, 0→2, 2→0, 1→2, 2→1)
    def code(arcs):
        return sum(1 << _ARCS.index(a) for a in arcs)

    assert CODE_TO_NAME[code([])] == "003"
    assert CODE_TO_NAME[code([(0, 1)])] == "012"
    assert CODE_TO_NAME[code([(0, 1), (1, 0)])] == "102"
    assert CODE_TO_NAME[code([(1, 0), (1, 2)])] == "021D"  # 0←1→2
    assert CODE_TO_NAME[code([(0, 1), (2, 1)])] == "021U"  # 0→1←2
    assert CODE_TO_NAME[code([(0, 1), (1, 2)])] == "021C"  # chain
    assert CODE_TO_NAME[code([(0, 1), (1, 0), (2, 0)])] == "111D"  # 0↔1←2
    assert CODE_TO_NAME[code([(0, 1), (1, 0), (0, 2)])] == "111U"  # 0↔1, 0→2
    assert CODE_TO_NAME[code([(0, 1), (1, 2), (0, 2)])] == "030T"
    assert CODE_TO_NAME[code([(0, 1), (1, 2), (2, 0)])] == "030C"
    assert CODE_TO_NAME[code([(0, 1), (1, 0), (0, 2), (2, 0)])] == "201"
    assert (
        CODE_TO_NAME[code([(0, 1), (1, 0), (2, 0), (2, 1)])] == "120D"
    )  # 2 diverges into the mutual pair
    assert CODE_TO_NAME[code([(0, 1), (1, 0), (0, 2), (1, 2)])] == "120U"
    assert CODE_TO_NAME[code([(0, 1), (1, 0), (2, 0), (1, 2)])] == "120C"
    assert (
        CODE_TO_NAME[code([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)])] == "210"
    )
    assert (
        CODE_TO_NAME[
            code([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)])
        ]
        == "300"
    )


def test_triad_census_matches_brute_force(spark):
    rng = np.random.default_rng(29)
    n = 14
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(70, 2))
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = _census_df_to_dict(triad_census(edges, verts, max_degree=None))
    want = _brute_census(pairs, n)
    assert got == want
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_sparse_graph_closed_forms(spark):
    # one mutual pair + one far asymmetric arc in a 10-vertex graph:
    # singles and null classes come from the closed-form corrections
    n = 10
    pairs = [(0, 1), (1, 0), (5, 6)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = _census_df_to_dict(triad_census(edges, verts))
    want = _brute_census(pairs, n)
    assert got == want
    # spot math: the mutual pair is alone in (n-2) triads; the triple
    # {0,1,5/6} family contributes the 102/012 counts minus overlaps
    assert got["102"] == n - 2
    assert got["012"] == n - 2
    assert got["003"] == n * (n - 1) * (n - 2) // 6 - 2 * (n - 2)


def test_triad_census_cap_keeps_totals(spark):
    # capping hubs must still return 16 rows summing to C(n,3): capped
    # connected triads degrade into the 012/102/003 buckets by design
    rng = np.random.default_rng(31)
    n = 12
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(60, 2))
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    got = _census_df_to_dict(triad_census(edges, verts, max_degree=2))
    assert len(got) == 16
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
