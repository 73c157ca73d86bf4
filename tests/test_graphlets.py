"""Graphlet census: brute-force 4-subset enumeration twin + invariants."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from halvesting_geometric_spark.operators.graphlets import graphlet_census


def _brute_census(pairs):
    """Exact non-induced and induced connected-graphlet counts by
    enumerating every 3- and 4-vertex subset."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({v for e in es for v in e})
    adj = {v: set() for v in nodes}
    for u, w in es:
        adj[u].add(w)
        adj[w].add(u)

    deg = {v: len(adj[v]) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    claws = sum(d * (d - 1) * (d - 2) // 6 for d in deg.values())

    tri = 0
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            tri += 1

    # 4-vertex: classify induced subgraph, and count non-induced copies
    # of each shape inside it.
    ni = {"paths4": 0, "tailed": 0, "cycles4": 0, "diamonds": 0, "k4": 0}
    ind = {"paths4": 0, "claws": 0, "cycles4": 0, "tailed": 0,
           "diamonds": 0, "k4": 0}
    for quad in combinations(nodes, 4):
        sub = [e for e in combinations(quad, 2) if e in es]
        m = len(sub)
        degs = sorted(
            sum(1 for e in sub if v in e) for v in quad
        )
        if m == 3 and degs == [1, 1, 1, 3]:
            ind["claws"] += 1
        elif m == 3 and degs == [1, 1, 2, 2]:
            ind["paths4"] += 1
            ni["paths4"] += 1
        elif m == 4 and degs == [1, 2, 2, 3]:
            ind["tailed"] += 1
            ni["tailed"] += 1
            ni["paths4"] += 2
        elif m == 4 and degs == [2, 2, 2, 2]:
            ind["cycles4"] += 1
            ni["cycles4"] += 1
            ni["paths4"] += 4
        elif m == 5:
            ind["diamonds"] += 1
            ni["diamonds"] += 1
            ni["cycles4"] += 1
            ni["tailed"] += 4
            ni["paths4"] += 6
        elif m == 6:
            ind["k4"] += 1
            ni["k4"] += 1
            ni["diamonds"] += 6
            ni["cycles4"] += 3
            ni["tailed"] += 12
            ni["paths4"] += 12
    return {
        "wedges": wedges,
        "claws": claws,
        "paths4": ni["paths4"],
        "triangles": tri,
        "tailed_triangles": ni["tailed"],
        "cycles4": ni["cycles4"],
        "diamonds": ni["diamonds"],
        "cliques4": ni["k4"],
        "ind_paths4": ind["paths4"],
        "ind_claws": ind["claws"],
        "ind_cycles4": ind["cycles4"],
        "ind_tailed_triangles": ind["tailed"],
        "ind_diamonds": ind["diamonds"],
    }


def _run(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    return graphlet_census(edges).first().asDict()


@pytest.mark.parametrize("seed,n,m", [(11, 14, 40), (23, 18, 60), (5, 12, 70)])
def test_census_matches_bruteforce(spark, seed, n, m):
    rng = np.random.default_rng(seed)
    pairs = [
        (int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))
    ]
    got = _run(spark, pairs)
    want = _brute_census(pairs)
    assert got == want


def test_census_known_small_graphs(spark):
    # K4: one of everything dense
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    got = _run(spark, k4)
    assert got["cliques4"] == 1
    assert got["diamonds"] == 6 and got["ind_diamonds"] == 0
    assert got["cycles4"] == 3 and got["ind_cycles4"] == 0
    assert got["triangles"] == 4
    assert got["paths4"] == 12 and got["ind_paths4"] == 0
    # C4: a single square
    got = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert got["cycles4"] == got["ind_cycles4"] == 1
    assert got["triangles"] == 0 and got["diamonds"] == 0
    assert got["paths4"] == 4 and got["ind_paths4"] == 0
    # star on 4 leaves: claws only
    got = _run(spark, [(9, 1), (9, 2), (9, 3), (9, 4)])
    assert got["claws"] == got["ind_claws"] == 4
    assert got["wedges"] == 6
    assert got["paths4"] == 0


def test_census_direction_and_dupes_ignored(spark):
    base = [(0, 1), (1, 2), (2, 0), (2, 3)]
    noisy = base + [(1, 0), (2, 1), (0, 2), (2, 3), (3, 3)]
    assert _run(spark, noisy) == _run(spark, base)


def test_cli_graphlets(spark, tmp_path, capsys):
    import json

    from halvesting_geometric_spark import cli
    from halvesting_geometric_spark.datagen import generate_transcripts

    tr_dir = str(tmp_path / "tr_gl")
    generate_transcripts(spark, 30, seed=8).write.parquet(tr_dir)
    out = str(tmp_path / "out_gl")
    rc = cli.main(["graphlets", "--transcripts", tr_dir, "--output", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["algorithm"] == "graphlets"
    assert summary["triangles"] >= 0
    assert spark.read.parquet(out).count() == 1
