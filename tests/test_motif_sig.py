from __future__ import annotations

import numpy as np

from halvesting_geometric_spark.operators.metrics import triangle_significance

E6 = 1_000_000


def test_triangle_significance_matches_closed_form(spark):
    # K5 plus a pendant: 10 triangles, degrees [4,4,4,4,5,1]
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_significance(df).first()
    degs = np.zeros(6, dtype=int)
    for a, b in edges:
        degs[a] += 1
        degs[b] += 1
    s1, s2 = int(degs.sum()), int((degs * (degs - 1)).sum())
    assert row.triangles == 10
    assert (row.s1, row.s2) == (s1, s2)
    expected = s2**3 / (6.0 * s1**3)
    assert row.expected_e6 == int(np.floor(expected * E6 + 0.5))
    assert row.ratio_e6 == int(np.floor(10 / expected * E6 + 0.5))
    assert row.ratio_e6 > E6  # K5 is more clustered than its null


def test_triangle_significance_degenerate(spark):
    # single edge: no wedges -> s2 == 0 -> ratio null, expected 0
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    row = triangle_significance(df).first()
    assert row.triangles == 0
    assert row.expected_e6 == 0
    assert row.ratio_e6 is None
