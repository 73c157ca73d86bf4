from __future__ import annotations

import collections
import itertools
import math

import numpy as np
import pytest

from halvesting_geometric_spark.operators.clustering import (
    dbscan_embeddings,
)

EPS, MINPTS, DIM = 9500, 4, 8


def _cos_e4(a: np.ndarray, b: np.ndarray) -> int:
    dot = na = nb = 0.0
    for k in range(len(a)):
        dot += a[k] * b[k]
        na += a[k] * a[k]
        nb += b[k] * b[k]
    if na == 0 or nb == 0:
        return 0
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5)


def _brute(X: np.ndarray, eps: int, min_pts: int):
    n = len(X)
    Xd = X.astype(np.float64)
    nbrs: dict[int, set[int]] = collections.defaultdict(set)
    for i, j in itertools.combinations(range(n), 2):
        if _cos_e4(Xd[i], Xd[j]) >= eps:
            nbrs[i].add(j)
            nbrs[j].add(i)
    core = {i for i in range(n) if len(nbrs[i]) + 1 >= min_pts}
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    members = collections.defaultdict(list)
    for i in core:
        members[find(i)].append(i)
    clus = {}
    for mem in members.values():
        m = min(mem)
        for i in mem:
            clus[i] = m
    want = {}
    for i in range(n):
        if i in core:
            want[i] = ("core", clus[i])
        else:
            cn = [clus[j] for j in nbrs[i] if j in core]
            want[i] = ("border", min(cn)) if cn else ("noise", None)
    return want


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(4)

    def mk(center, n, spread):
        return center[None, :] + rng.normal(0, spread, (n, DIM))

    X = np.vstack(
        [
            mk(rng.normal(0, 1, DIM), 20, 0.05),
            mk(rng.normal(0, 1, DIM), 15, 0.05),
            rng.normal(0, 1, (10, DIM)),
        ]
    ).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    return emb, X


def test_dbscan_matches_bruteforce(clustered):
    emb, X = clustered
    want = _brute(X, EPS, MINPTS)
    got = {
        r.vec_id: (r.role, r.cluster)
        for r in dbscan_embeddings(
            emb, dim=DIM, eps_e4=EPS, min_pts=MINPTS
        ).collect()
    }
    assert got == want
    # two planted clusters found, noise flagged
    clusters = {c for role, c in got.values() if role == "core"}
    assert len(clusters) == 2
    assert sum(1 for role, _ in got.values() if role == "noise") >= 8


def test_dbscan_minpts_gates_cores(clustered):
    emb, X = clustered
    # min_pts above the planted cluster sizes -> everything noise
    got = dbscan_embeddings(emb, dim=DIM, eps_e4=EPS, min_pts=30)
    roles = {r.role for r in got.collect()}
    assert roles == {"noise"}


def test_dbscan_lsh_path_runs(clustered):
    emb, _ = clustered
    out = dbscan_embeddings(
        emb, dim=DIM, eps_e4=EPS, min_pts=MINPTS, pairs="lsh", n_planes=2
    ).collect()
    assert len(out) == 45
    assert {r.role for r in out} <= {"core", "border", "noise"}


def test_knn_label_agreement_bruteforce(clustered, spark):
    from halvesting_geometric_spark.operators.clustering import (
        knn_label_agreement,
    )

    emb, X = clustered
    # labels: first 20 -> 0, next 15 -> 1, noise -> 2
    labels = [0] * 20 + [1] * 15 + [2] * 10
    lab = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "vec_id long, label int"
    )
    df = emb.join(lab, "vec_id")
    got = {
        r.vec_id: (r.label, r.k_eff, r.agree_e6)
        for r in knn_label_agreement(df, dim=DIM, k=3).collect()
    }
    n = len(X)
    Xd = X.astype(np.float64)
    for i in range(n):
        sims = sorted(
            ((_cos_e4(Xd[i], Xd[j]), -j, j) for j in range(n) if j != i),
            reverse=True,
        )[:3]
        agree = sum(1 for _, _, j in sims if labels[j] == labels[i])
        assert got[i] == (
            labels[i],
            3,
            math.floor(agree * 1e6 / 3 + 0.5),
        )
    # cluster members agree with their neighbors; noise rarely does
    mean_cluster = np.mean([got[i][2] for i in range(35)])
    mean_noise = np.mean([got[i][2] for i in range(35, 45)])
    assert mean_cluster > mean_noise
