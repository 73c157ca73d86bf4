"""Louvain, IVF ANN, and n-gram LM scoring — round-3 additions."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from halvesting_geometric_spark.operators.ivf import (
    ivf_assign,
    ivf_topk,
    kmeans_fit,
    seed_centroids,
)
from halvesting_geometric_spark.operators.linkpred import modularity
from halvesting_geometric_spark.operators.louvain import (
    contract_graph,
    louvain,
    louvain_round,
)
from halvesting_geometric_spark.operators.ngram_lm import (
    bigram_logprob,
    ngram_counts,
)
from halvesting_geometric_spark.operators.similarity import (
    cosine_topk_bruteforce,
)

SF = "/root/testdata/sf0.01"


# --------------------------------------------------------------------------
# Louvain
# --------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_louvain_two_triangles(spark):
    # two triangles joined by a bridge: the unambiguous two-community graph
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    res = louvain(e, max_levels=3, max_rounds=10)
    labels = {r["vertex_id"]: r["comm"] for r in res.labels.collect()}
    assert res.num_communities == 2
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    q = modularity(
        e, res.labels.select("vertex_id", F.col("comm").alias("label"))
    ).collect()[0]
    assert q["modularity"] == pytest.approx(5 / 14, abs=1e-9)


def test_louvain_round_singleton_scores(spark):
    """One ungated round from singletons must follow the exact integral
    rule: v moves to argmax(2m − k_v·k_u) over neighbors u when positive,
    ties to the smaller id."""
    # star: center 0 with leaves 1..4 plus edge (1,2); 2m = 10
    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)])
    got = {r["vertex_id"]: r["comm"] for r in louvain_round(e).collect()}
    # v=0 (k=4): best neighbor u=3 or 4 (k=1): score 10-4=6 > 0; min id 3
    assert got[0] == 3
    # v=3 (k=1): only neighbor 0 (k=4): 10-4=6 > 0 -> moves to 0
    assert got[3] == 0 and got[4] == 0
    # v=1 (k=2): neighbors 0 (k=4, score 2), 2 (k=2, score 6) -> 2
    assert got[1] == 2 and got[2] == 1


def test_louvain_round_no_positive_gain_stays(spark):
    # K4: every move score is 2m − k·k = 12 − 9 < 0... actually 2m=12,
    # k=3 -> 12−9=3 > 0, so use K5: 2m=20, k=4 -> 20−16=4 > 0. A clique
    # always has positive first-move gain; instead pin the "stay" branch
    # with two isolated-but-self-looped... simplest: a single edge graph,
    # 2m=2, k=1 -> score 2−1=1 > 0: merges. Use weighted: one heavy loop
    # dominating the degree makes every move negative.
    e = spark.createDataFrame(
        [(0, 0, 10.0), (1, 1, 10.0), (0, 1, 1.0)],
        "src long, dst long, weight double",
    )
    got = {
        r["vertex_id"]: r["comm"]
        for r in louvain_round(e, weight_col="weight").collect()
    }
    # k_0 = k_1 = 21, 2m = 42; moving 0→{1}: 42·1 − 21·21 < 0 → stay
    assert got == {0: 0, 1: 1}


def test_contract_graph_conserves_weight(spark):
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)],
        "vertex_id long, comm long",
    )
    c = {(r["src"], r["dst"]): r["weight"] for r in contract_graph(e, labels).collect()}
    assert c == {(0, 0): 3, (3, 3): 3, (0, 3): 1}


def test_louvain_recovers_planted_partition(spark):
    """Planted partition: 6 groups of 10 vertices, full intra-group cliques,
    one deterministic inter-group bridge per adjacent pair. Louvain must
    recover the planted groups (Q ≈ (1−1/6) · dense-limit) — the standard
    recovery check for modularity methods. (The sf conv graph is ~uniform
    random at density 0.27, so its max modularity is ≈ 0 — not a useful
    recovery target.)"""
    pairs = []
    for grp in range(6):
        base = grp * 10
        pairs += [
            (base + i, base + j) for i in range(10) for j in range(i + 1, 10)
        ]
    pairs += [(g * 10, (g + 1) * 10) for g in range(5)]  # sparse bridges
    e = _edges(spark, pairs)
    res = louvain(e, max_levels=3, max_rounds=12)
    labels = {r["vertex_id"]: r["comm"] for r in res.labels.collect()}
    # every planted group ends in exactly one community
    groups = [{labels[g * 10 + i] for i in range(10)} for g in range(6)]
    assert all(len(s) == 1 for s in groups), groups
    assert res.num_communities == 6
    q = modularity(
        e, res.labels.select("vertex_id", F.col("comm").alias("label"))
    ).collect()[0]
    assert q["modularity"] > 0.7


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_seed_centroids_unit_norm(emb):
    cent = seed_centroids(emb, 8)
    assert cent.shape == (8, 64)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)


def test_ivf_assign_is_argmax(emb):
    cent = seed_centroids(emb, 8)
    rows = ivf_assign(emb, cent).collect()
    assert len(rows) == emb.count()
    # seeds must land in their own cell with sim 1.0 (tie-break: own id first)
    own = {r["vec_id"]: r for r in rows if r["vec_id"] < 8}
    for i in range(8):
        assert own[i]["cell"] == i and own[i]["sim_e4"] == 10_000


def test_ivf_recall_vs_bruteforce(spark, emb):
    """nprobe=4 of 8 cells must recover most exact top-5 neighbors; this is
    the measured-recall contract the LSH path also ships with."""
    cent = seed_centroids(emb, 8)
    queries = emb.filter(F.col("vec_id") < 20)
    approx = ivf_topk(emb, cent, k=5, nprobe=4, queries=queries)
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    b = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, recall


def test_kmeans_objective_improves(emb):
    cent, hist = kmeans_fit(emb, 8, iters=4)
    assert cent.shape == (8, 64)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    # spherical Lloyd's: mean cosine to assigned centroid grows (tiny
    # rounding slack — the history reads the e4-rounded assignment sim)
    assert hist[-1] >= hist[0] + 0.01
    assert all(b >= a - 1e-3 for a, b in zip(hist, hist[1:]))


def test_ivf_cell_cap_bounds_candidates(emb):
    cent = seed_centroids(emb, 8)
    capped = ivf_assign(emb, cent)
    # cap of 10 per cell -> at most 8 cells * 10 entries
    res = ivf_topk(
        emb, cent, k=3, nprobe=1, cell_cap=10,
        queries=emb.filter(F.col("vec_id") < 5),
    )
    rows = res.collect()
    assert len(rows) <= 5 * 3
    assert capped.count() == emb.count()


# --------------------------------------------------------------------------
# n-gram LM
# --------------------------------------------------------------------------


def test_bigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "c")],
        "doc_id long, text string",
    )
    # bigrams: doc0 = [a b, b a, a b], doc1 = [a b]; V = {a,b,c} = 3
    # c(a b)=3, c(b a)=1; prefix c(a ·)=3, c(b ·)=1; α=0.5
    p_ab = (3 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (1 + 0.5 * 3)
    got = {r["doc_id"]: r for r in bigram_logprob(docs, alpha=0.5).collect()}
    assert set(got) == {0, 1}  # doc 2 has no bigram
    assert got[0]["n_bigrams"] == 3
    exp0 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert got[0]["logprob"] == pytest.approx(exp0, rel=1e-12)
    assert got[1]["logprob"] == pytest.approx(math.log(p_ab), rel=1e-12)


def test_ngram_counts_unigram_bigram(spark):
    docs = spark.createDataFrame(
        [(0, "x y x"), (1, "y z")], "doc_id long, text string"
    )
    uni = {r["gram"]: r["cnt"] for r in ngram_counts(docs, n=1).collect()}
    assert uni == {"x": 2, "y": 2, "z": 1}
    bi = {r["gram"]: r["cnt"] for r in ngram_counts(docs, n=2).collect()}
    assert bi == {"x y": 1, "y x": 1, "y z": 1}
    with pytest.raises(ValueError):
        ngram_counts(docs, n=3)


def test_bigram_logprob_orders_quality(spark):
    """A document made of corpus-frequent bigrams must outscore one made of
    singleton bigrams — the filtering signal the operator exists for."""
    common = [(i, "the quick brown fox jumps") for i in range(20)]
    rare = [(100, "zq wv xk yj pn")]
    docs = spark.createDataFrame(common + rare, "doc_id long, text string")
    got = {r["doc_id"]: r["logprob"] for r in bigram_logprob(docs).collect()}
    assert got[0] > got[100]


# --------------------------------------------------------------------------
# batched supersteps (sync_every) equivalence — LPA and SSSP
# --------------------------------------------------------------------------


def test_labelprop_sync_every_matches_per_iteration(spark):
    from halvesting_geometric_spark.operators.labelprop import (
        label_propagation,
    )

    e = _edges(
        spark,
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (5, 6)],
    )
    a = label_propagation(e, fixed_iters=5)
    b = label_propagation(e, fixed_iters=5, sync_every=5)
    la = sorted((r["vertex_id"], r["label"]) for r in a.labels.collect())
    lb = sorted((r["vertex_id"], r["label"]) for r in b.labels.collect())
    assert la == lb
    assert a.iterations == b.iterations == 5
    assert [m["batched_steps"] for m in b.metrics] == [5]
    import pytest as _pt

    with _pt.raises(ValueError):
        label_propagation(e, fixed_iters=2, sync_every=0)


def test_sssp_sync_every_matches_per_iteration(spark):
    from halvesting_geometric_spark.operators.traversal import sssp

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0), (4, 0, 3.0)],
        "src long, dst long, w double",
    )
    v = spark.range(6).select(F.col("id").alias("vertex_id"))
    a = sssp(e, v, [0], weight_col="w", fixed_iters=6)
    b = sssp(e, v, [0], weight_col="w", fixed_iters=6, sync_every=6)
    da = sorted((r["vertex_id"], r["dist"]) for r in a.collect())
    db = sorted((r["vertex_id"], r["dist"]) for r in b.collect())
    assert da == db == [(0, 0.0), (1, 1.0), (2, 3.0), (3, 4.0)]


def test_ivf_arrow_rerank_matches_expr(spark, emb):
    cent = seed_centroids(emb, 8)
    q = emb.filter(F.col("vec_id") < 30)
    a = sorted(
        tuple(r)
        for r in ivf_topk(
            emb, cent, k=5, nprobe=3, queries=q, rerank="expr"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in ivf_topk(
            emb, cent, k=5, nprobe=3, queries=q, rerank="arrow"
        ).collect()
    )
    assert a == b and len(a) == 150
    import pytest as _pt

    with _pt.raises(ValueError):
        ivf_topk(emb, cent, rerank="nope")
