"""Graph coarsening over maximal matching: contraction equals a Python
replay of (engine matching + relabel + multiplicity sum), and the standard
multilevel invariants hold."""

from halvesting_geometric_spark.operators.matching import (
    coarsen_graph,
    maximal_matching,
)

EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 0),  # 5-cycle
    (5, 6), (6, 7), (5, 7),                  # triangle
    (1, 6), (2, 7), (0, 5),                  # bridges
    (8, 8), (3, 2),                          # self-loop + reverse dup
]


def _python_coarsen(edges, matching):
    sup = {}
    for a, b in matching:
        sup[b] = a
    canon = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    out = {}
    for a, b in canon:
        ra, rb = sup.get(a, a), sup.get(b, b)
        if ra == rb:
            continue
        k = (min(ra, rb), max(ra, rb))
        out[k] = out.get(k, 0) + 1
    return out


def test_matches_python_contraction(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    m = maximal_matching(df, seed=42, hash_method="portable")
    pairs = [(r["a"], r["b"]) for r in m.matching.collect()]
    assert m.num_matched >= 1
    got = {
        (r["a"], r["b"]): r["weight"]
        for r in coarsen_graph(df, seed=42, hash_method="portable").collect()
    }
    assert got == _python_coarsen(EDGES, pairs)


def test_multilevel_invariants(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    coarse = coarsen_graph(df, seed=42, hash_method="portable")
    rows = coarse.collect()
    assert all(r["a"] < r["b"] for r in rows)  # canonical, no self-loops
    verts = {x for r in rows for x in (r["a"], r["b"])}
    m = maximal_matching(df, seed=42, hash_method="portable")
    orig_verts = {x for e in EDGES for x in e if e[0] != e[1]}
    # every contraction removes exactly one vertex from the edge-incident set
    assert len(verts) <= len(orig_verts) - m.num_matched
    # total multiplicity == surviving canonical edges
    canon = {(min(s, d), max(s, d)) for s, d in EDGES if s != d}
    assert sum(r["weight"] for r in rows) <= len(canon)


def test_empty_and_selfloop_only(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert coarsen_graph(df, hash_method="portable").count() == 0
