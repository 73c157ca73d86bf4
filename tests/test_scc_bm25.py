"""Strongly connected components + BM25 scoring."""

from __future__ import annotations

import math

import pytest

from halvesting_geometric_spark.operators.bm25 import bm25_scores
from halvesting_geometric_spark.operators.scc import (
    strongly_connected_components,
)


def _scc_map(res):
    return {r["vertex_id"]: r["scc_id"] for r in res.components.collect()}


def test_scc_cycle_chain_mix(spark):
    # 3-cycle, a 2-cycle hanging off it, one pure sink
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (3, 5), (5, 3)],
        "src long, dst long",
    )
    res = strongly_connected_components(e)
    got = _scc_map(res)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 5: 3, 4: 4}
    assert res.num_components == 3


def test_scc_dag_is_all_singletons(spark):
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    res = strongly_connected_components(e)
    got = _scc_map(res)
    assert got == {v: v for v in range(4)}
    # sources/sinks trim immediately; the interior resolves as singleton
    # roots in the same round — a DAG never needs a second peel
    assert res.rounds <= 2


def test_scc_long_chain_of_cycles(spark):
    """k 2-cycles in a directed chain — exercises repeated peeling (each
    round collects the current source SCC after trimming nothing)."""
    pairs = []
    for i in range(6):
        a, b = 2 * i, 2 * i + 1
        pairs += [(a, b), (b, a)]
        if i < 5:
            pairs.append((b, 2 * (i + 1)))
    e = spark.createDataFrame(pairs, "src long, dst long")
    res = strongly_connected_components(e)
    got = _scc_map(res)
    for i in range(6):
        assert got[2 * i] == got[2 * i + 1] == 2 * i
    assert res.num_components == 6


def test_scc_matches_networkx_style_bruteforce(spark):
    """Deterministic pseudo-random digraph vs an O(V·E) python closure."""
    import itertools

    rng_edges = sorted(
        {((7 * i + 3) % 40, (11 * i + 5) % 40) for i in range(120)}
        - {(v, v) for v in range(40)}
    )
    e = spark.createDataFrame(rng_edges, "src long, dst long")
    got = _scc_map(strongly_connected_components(e))
    # python oracle: reachability via floyd-warshall-ish closure
    verts = sorted({v for p in rng_edges for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    reach = [[False] * n for _ in range(n)]
    for a, b in rng_edges:
        reach[idx[a]][idx[b]] = True
    for k, i, j in itertools.product(range(n), repeat=3):
        if reach[i][k] and reach[k][j]:
            reach[i][j] = True
    expect = {}
    for v in verts:
        members = [
            w
            for w in verts
            if w == v
            or (reach[idx[v]][idx[w]] and reach[idx[w]][idx[v]])
        ]
        expect[v] = min(members)
    assert got == expect


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "hash join hash"), (1, "join scan"), (2, "scan scan scan")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["hash"]).collect()}
    # N=3, df(hash)=1, idf=ln(1+(3-1+0.5)/1.5)=ln(8/3); dl0=3, avgdl=8/3
    idf = math.log(1 + 2.5 / 1.5)
    tf = 2
    denom = tf + 1.2 * (0.25 + 0.75 * 3 / (8 / 3))
    assert got[0] == pytest.approx(idf * tf * 2.2 / denom, rel=1e-12)
    assert got[1] == 0.0 and got[2] == 0.0


def test_bm25_prefers_rarer_terms_and_covers_all_docs(spark):
    rows = [(i, "common filler text") for i in range(10)]
    rows += [(10, "common rare"), (11, "common common")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["rare", "common"]).collect()}
    assert len(got) == 12  # every doc present
    assert got[10] > got[11] > 0  # the rare term dominates


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_condensation_and_levels(spark):
    import pyspark.sql.functions as F

    from halvesting_geometric_spark.operators.scc import (
        condensation,
        topological_levels,
    )

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (3, 5), (5, 3), (6, 6)],
        "src long, dst long",
    )
    res = strongly_connected_components(e)
    cond = condensation(e, res.components)
    assert sorted((r["src"], r["dst"]) for r in cond.collect()) == [
        (0, 3),
        (3, 4),
    ]
    lv = topological_levels(
        cond,
        res.components.select(F.col("scc_id").alias("vertex_id")).distinct(),
    )
    got = {r["vertex_id"]: r["level"] for r in lv.collect()}
    # chain of components 0 -> {3,5} -> 4; isolated self-loop 6 at level 0
    assert got == {0: 0, 3: 1, 4: 2, 6: 0}


def test_topological_levels_raises_on_cycle(spark):
    import pytest as _pt

    from halvesting_geometric_spark.operators.scc import topological_levels

    bad = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with _pt.raises(RuntimeError):
        topological_levels(bad, max_iters=4)


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from halvesting_geometric_spark.operators.bm25 import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry cherry")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf_e4"]) for r in rows}
    # doc0: apple tf=2 df=1 -> 2·ln(4/2)=1.3863; banana tf=1 df=2 -> ln(4/3)
    assert got[(0, 1)] == ("apple", int(2 * math.log(2.0) * 10000 + 0.5))
    assert got[(0, 2)][0] == "banana"
    # doc2: only cherry
    assert got[(2, 1)][0] == "cherry" and (2, 2) not in got
