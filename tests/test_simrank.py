"""SimRank: dense numpy twin replay + invariants."""

from __future__ import annotations

import numpy as np
import pytest

from halvesting_geometric_spark.operators.simrank import simrank


def _numpy_simrank(pairs, k, c):
    """Dense reference: S_t = c * (A^T S_{t-1} A) / outer(indeg, indeg),
    diagonal re-pinned to 1 each iteration (Jeh & Widom eq. 1)."""
    nodes = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in set(pairs):
        if a != b:
            A[idx[a], idx[b]] = 1.0
    indeg = A.sum(axis=0)
    S = np.eye(n)
    for _ in range(k):
        T = A.T @ S @ A
        denom = np.outer(indeg, indeg)
        with np.errstate(divide="ignore", invalid="ignore"):
            S = c * T / denom
        S[~np.isfinite(S)] = 0.0
        np.fill_diagonal(S, 1.0)
    return S, idx


def _collect(df):
    return {
        (int(r["a"]), int(r["b"])): float(r["score"]) for r in df.collect()
    }


def _rand_edges(rng, n_nodes, n_edges):
    return [
        (int(a), int(b))
        for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
    ]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_simrank_matches_numpy_twin(spark, k):
    rng = np.random.default_rng(17)
    pairs = _rand_edges(rng, 40, 160)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = _collect(simrank(edges, k=k, c=0.8))
    S, idx = _numpy_simrank(pairs, k, 0.8)
    want = {}
    for a, i in idx.items():
        for b, j in idx.items():
            if a < b and S[i, j] > 0:
                want[(a, b)] = S[i, j]
    assert set(got) == set(want)
    for pair, s in want.items():
        assert got[pair] == pytest.approx(s, abs=1e-12)


def test_simrank_scores_bounded_and_canonical(spark):
    rng = np.random.default_rng(3)
    pairs = _rand_edges(rng, 30, 120)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = simrank(edges, k=3, c=0.6).collect()
    assert rows
    for r in rows:
        assert r["a"] < r["b"]
        assert 0.0 < r["score"] <= 0.6 + 1e-12


def test_simrank_k1_closed_form(spark):
    # s_1(a,b) = c * |I(a) ∩ I(b)| / (|I(a)| * |I(b)|)
    pairs = [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11), (3, 12)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = _collect(simrank(edges, k=1, c=0.8))
    assert got[(10, 11)] == pytest.approx(0.8 * 2 / (2 * 3), abs=1e-15)
    assert got[(11, 12)] == pytest.approx(0.8 * 1 / (3 * 1), abs=1e-15)
    assert (10, 12) not in got  # no common in-neighbor


def test_simrank_min_score_is_subset(spark):
    rng = np.random.default_rng(9)
    pairs = _rand_edges(rng, 30, 100)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    full = _collect(simrank(edges, k=2, c=0.8))
    pruned = _collect(simrank(edges, k=2, c=0.8, min_score=0.05))
    assert set(pruned) <= set(full)
    for pair, s in pruned.items():
        assert s >= 0.05
        # pruning only removes mass: kept pairs score at most the exact value
        assert s <= full[pair] + 1e-12


def test_simrank_max_out_degree_equals_capped_graph(spark):
    rng = np.random.default_rng(5)
    pairs = _rand_edges(rng, 25, 80) + [(0, i) for i in range(1, 20)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    capped = _collect(simrank(edges, k=2, c=0.8, max_out_degree=6))
    dedup = {(a, b) for a, b in pairs if a != b}
    od: dict[int, int] = {}
    for a, _ in dedup:
        od[a] = od.get(a, 0) + 1
    kept = [(a, b) for a, b in dedup if od[a] <= 6]
    want = _collect(
        simrank(
            spark.createDataFrame(kept, "src long, dst long"), k=2, c=0.8
        )
    )
    assert set(capped) == set(want)
    for pair, s in want.items():
        assert capped[pair] == pytest.approx(s, abs=1e-12)


def test_simrank_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        simrank(edges, k=0)
    with pytest.raises(ValueError):
        simrank(edges, c=0.0)
    with pytest.raises(ValueError):
        simrank(edges, c=1.5)


# ---------------------------------------------------------------- simrank_mc

import hashlib

from halvesting_geometric_spark.operators.simrank import simrank_mc


def _ph(*vals, seed):
    s = "\x1f".join([str(v) for v in vals] + [str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_simrank_mc(pairs, queries, num_walks, length, c_num, c_den, seed):
    """Replay the reverse walks + first-meeting estimator exactly."""
    radj: dict[int, list[int]] = {}
    for a, b in sorted({(a, b) for a, b in pairs if a != b}):
        radj.setdefault(b, []).append(a)
    for v in radj:
        radj[v] = sorted(set(radj[v]))

    pos = {}  # (qv, rep) -> list of vertices by step
    for qv in queries:
        for rep in range(num_walks):
            wid = qv * num_walks + rep
            path = [qv]
            for t in range(1, length + 1):
                cur = path[-1]
                nbrs = radj.get(cur)
                if not nbrs:
                    break
                path.append(nbrs[_ph(wid, t, seed=seed) % len(nbrs)])
            pos[(qv, rep)] = path

    out = {}
    for i, a in enumerate(queries):
        for b in queries[i + 1:]:
            lo, hi = min(a, b), max(a, b)
            num = 0
            for rep in range(num_walks):
                pa, pb = pos[(a, rep)], pos[(b, rep)]
                tau = next(
                    (
                        t
                        for t in range(1, min(len(pa), len(pb)))
                        if pa[t] == pb[t]
                    ),
                    None,
                )
                if tau is not None:
                    num += c_num**tau * c_den ** (length - tau)
            if num:
                out[(lo, hi)] = num
    return out


def test_simrank_mc_matches_python_twin(spark):
    rng = np.random.default_rng(29)
    pairs = _rand_edges(rng, 30, 150)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    queries = list(range(12))
    res = simrank_mc(
        edges, queries, num_walks=6, walk_length=3, seed=7,
        hash_method="portable",
    ).collect()
    got = {(int(r["a"]), int(r["b"])): int(r["meet_num"]) for r in res}
    want = _python_simrank_mc(pairs, queries, 6, 3, 4, 5, 7)
    assert got == want
    den = 5**3 * 6
    for r in res:
        assert r["score"] == pytest.approx(r["meet_num"] / den, abs=0)


def test_simrank_mc_converges_to_exact(spark):
    rng = np.random.default_rng(31)
    pairs = _rand_edges(rng, 20, 120)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    queries = list(range(10))
    exact = _collect(simrank(edges, k=3, c=0.8))
    est_rows = simrank_mc(
        edges, queries, num_walks=400, walk_length=3, seed=1
    ).collect()
    est = {(int(r["a"]), int(r["b"])): float(r["score"]) for r in est_rows}
    qset = {
        (a, b)
        for i, a in enumerate(queries)
        for b in queries[i + 1:]
    }
    errs = [
        abs(est.get(p, 0.0) - exact.get(p, 0.0))
        for p in qset
    ]
    assert max(errs) < 0.12
    assert sum(errs) / len(errs) < 0.04


def test_simrank_mc_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        simrank_mc(edges, [1], num_walks=0)
    with pytest.raises(ValueError):
        simrank_mc(edges, [1], walk_length=0)
    with pytest.raises(ValueError):
        simrank_mc(edges, [1], c_num=5, c_den=5)
