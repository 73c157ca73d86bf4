"""Round-3f operators: 2-D skyline, sorted-neighborhood blocking, edge
support, community conductance, and the two-layer SAGE gate kernel."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.ktruss import edge_support
from halvesting_geometric_spark.operators.metrics import community_conductance
from halvesting_geometric_spark.operators.resolve import (
    sorted_neighborhood_pairs,
)
from halvesting_geometric_spark.operators.skyline import skyline2


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_bruteforce_random(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(100), rng.randrange(100)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r["x"], r["y"]) for r in skyline2(df, "x", "y", num_partitions=5).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_ties_and_duplicates(spark):
    # duplicates of a frontier point all survive; same-x lower-y dies;
    # same-y lower-x dies
    pts = [(5, 5), (5, 5), (5, 3), (3, 5), (2, 9), (9, 2), (1, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r["x"], r["y"]) for r in skyline2(df, "x", "y", 3).collect())
    assert got == [(2, 9), (5, 5), (5, 5), (9, 2)]


def test_skyline_single_partition_and_nulls(spark):
    pts = [(1, 10), (2, 9), (3, 11), (None, 99), (4, None)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r["x"], r["y"]) for r in skyline2(df, "x", "y", 1).collect())
    assert got == [(3, 11)]


def test_skyline_carries_extra_columns(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b"), (0, 3, "c")], "x long, y long, tag string"
    )
    got = {r["tag"] for r in skyline2(df, "x", "y", 2).collect()}
    assert got == {"b", "c"}


def test_snm_pairs_match_bruteforce(spark):
    names = [f"user {i:03d}" for i in range(40)]
    rng = random.Random(3)
    rng.shuffle(names)
    rows = [(i, names[i]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, name string")
    w = 3
    got = sorted(
        (r["a"], r["b"])
        for r in sorted_neighborhood_pairs(df, "name", "id", window=w, num_partitions=4).collect()
    )
    ordered = [rid for _, rid in sorted((n, i) for i, n in rows)]
    want = sorted(
        (ordered[i], ordered[j])
        for i in range(len(ordered))
        for j in range(i + 1, min(i + w + 1, len(ordered)))
    )
    assert got == want


def test_snm_prefix_keys_rank_in_key_id_order(spark):
    # "user 1" is a proper prefix of "user 1 x": the tab separator sorts
    # below space/alphanumerics, so the shorter key must rank FIRST (the
    # old '|' separator, 0x7c, inverted this).
    rows = [(0, "user 1 x"), (1, "user 1"), (2, "user 2")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(
        (r["a"], r["b"])
        for r in sorted_neighborhood_pairs(
            df, "name", "id", window=1, num_partitions=2
        ).collect()
    )
    # (key, id) order: "user 1" (1) < "user 1 x" (0) < "user 2" (2)
    assert got == [(0, 2), (1, 0)]


def test_edge_support_triangle_plus_bridge(spark):
    # triangle 0-1-2 plus pendant edge 2-3: triangle edges support 1,
    # bridge supports 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): r["support"] for r in edge_support(edges).collect()
    }
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 1, (2, 3): 0}


def test_community_conductance_two_cliques_one_bridge(spark):
    # two triangles joined by one edge; m = 7 canonical edges
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    edges = spark.createDataFrame(
        tri1 + tri2 + [(2, 3)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(v, 0) for v in (0, 1, 2)] + [(v, 1) for v in (3, 4, 5)],
        "vertex_id long, label long",
    )
    got = {
        r["label"]: (r["members"], r["volume"], r["cut"], r["phi_e6"])
        for r in community_conductance(edges, labels).collect()
    }
    # each side: volume = 2*3 internal endpoints + 1 bridge endpoint = 7,
    # cut = 1, denominator = min(7, 14-7) = 7 -> phi = 1/7
    phi = int((1 * 1_000_000.0 / 7) + 0.5)
    assert got == {0: (3, 7, 1, phi), 1: (3, 7, 1, phi)}


def test_community_conductance_whole_graph_label(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    labels = spark.createDataFrame(
        [(0, 9), (1, 9), (2, 9)], "vertex_id long, label long"
    )
    rows = community_conductance(edges, labels).collect()
    assert len(rows) == 1
    r = rows[0]
    # single community: cut 0, denominator min(4, 0) = 0 -> phi 0
    assert (r["members"], r["volume"], r["cut"], r["phi_e6"]) == (3, 4, 0, 0)


def test_skyline_large_int64_values(spark):
    # values far above 2^53: the kernel must not round-trip through floats
    big = 2**60
    pts = [(big + 1, 1), (big, 2), (big + 1, 0), (1, big), (1, big - 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r["x"], r["y"]) for r in skyline2(df, "x", "y", 2).collect())
    assert got == [(1, big), (big, 2), (big + 1, 1)]


def test_citation_pair_counts_modes(spark):
    from halvesting_geometric_spark.operators.linkpred import (
        citation_pair_counts,
    )

    # 0→2, 1→2, 0→3, 1→3, 2→4: coupling(0,1)=2 (both cite 2 and 3);
    # cocitation(2,3)=2 (cited by both 0 and 1)
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (0, 3), (1, 3), (2, 4)], "src long, dst long"
    )
    co = {
        (r["a"], r["b"]): r["n"]
        for r in citation_pair_counts(edges, "cocitation").collect()
    }
    assert co == {(2, 3): 2}
    cp = {
        (r["a"], r["b"]): r["n"]
        for r in citation_pair_counts(edges, "coupling").collect()
    }
    assert cp == {(0, 1): 2}


def test_citation_pair_counts_degree_cap(spark):
    from halvesting_geometric_spark.operators.linkpred import (
        citation_pair_counts,
    )

    # hub 0 cites 5 targets; cap 4 drops the whole hub's wedges
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(9, 1), (9, 2)],
        "src long, dst long",
    )
    capped = citation_pair_counts(edges, "cocitation", max_degree=4).collect()
    assert {(r["a"], r["b"]) for r in capped} == {(1, 2)}
    full = citation_pair_counts(edges, "cocitation", max_degree=None).collect()
    assert len(full) == 10  # C(5,2) from the hub, with (1,2) counted twice


def test_degree_attack_robustness(spark):
    from halvesting_geometric_spark.operators.robustness import (
        degree_attack_robustness,
    )

    # star 0-{1..4} plus path 5-6-7: hub 0 has degree 4, path inner 6 has 2
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(5, 6), (6, 7)],
        "src long, dst long",
    )
    verts = spark.createDataFrame([(i,) for i in range(8)], "vertex_id long")
    got = {
        r["degree_cap"]: (
            r["kept_vertices"], r["kept_edges"], r["n_components"],
            r["giant_size"],
        )
        for r in degree_attack_robustness(
            edges, verts, degree_caps=(1, 2, 4)
        ).collect()
    }
    # cap 4: nothing removed -> components {0..4} and {5,6,7}
    assert got[4] == (8, 6, 2, 5)
    # cap 2: hub 0 removed -> 1..4 isolated + path intact
    assert got[2] == (7, 2, 5, 3)
    # cap 1: hub and vertex 6 removed -> all 6 survivors isolated
    assert got[1] == (6, 0, 6, 1)
