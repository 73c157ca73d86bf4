"""Semantic oracles for linear-threshold influence and the prefix-filtered
exact similarity join — pure-python twins on seeded random inputs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.dedup import word_shingles
from halvesting_geometric_spark.operators.influence import linear_threshold
from halvesting_geometric_spark.operators.setjoin import (
    prefix_filter_pairs,
    similarity_join,
)


def _lt_python(pairs, seeds, t_num, t_den, rounds):
    indeg: dict[int, int] = {}
    for _, b in pairs:
        indeg[b] = indeg.get(b, 0) + 1
    active = {s: 0 for s in seeds}
    for r in range(1, rounds + 1):
        cnt: dict[int, int] = {}
        for a, b in pairs:
            if a in active:
                cnt[b] = cnt.get(b, 0) + 1
        newly = [
            v
            for v, c in cnt.items()
            if v not in active and c * t_den >= t_num * indeg[v]
        ]
        if not newly:
            break
        for v in newly:
            active[v] = r
    return active


def test_linear_threshold_matches_python(spark):
    rng = np.random.default_rng(5)
    n = 40
    pairs = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, size=(200, 2))
         if a != b}
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    seeds = [0, 1, 2, 3, 4]
    want = _lt_python(pairs, seeds, 1, 3, 5)
    got = {
        r["vertex_id"]: r["round"]
        for r in linear_threshold(
            edges, verts, seeds, theta_num=1, theta_den=3, max_rounds=5
        ).collect()
    }
    assert got == want
    assert any(v > 0 for v in got.values())  # the cascade actually spread


def test_linear_threshold_monotone_in_theta(spark):
    rng = np.random.default_rng(9)
    n = 30
    pairs = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, size=(120, 2))
         if a != b}
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.range(n).select(F.col("id").alias("vertex_id"))
    loose = linear_threshold(
        edges, verts, [0, 1], theta_num=1, theta_den=4, max_rounds=6
    ).count()
    strict = linear_threshold(
        edges, verts, [0, 1], theta_num=3, theta_den=4, max_rounds=6
    ).count()
    assert loose >= strict  # lower threshold can only activate more


def test_linear_threshold_rejects_bad_args(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.range(2).select(F.col("id").alias("vertex_id"))
    with pytest.raises(ValueError):
        linear_threshold(edges, verts, [0], theta_num=0, theta_den=2)
    with pytest.raises(ValueError):
        linear_threshold(edges, verts, [0], theta_num=3, theta_den=2)
    with pytest.raises(ValueError):
        linear_threshold(edges, verts, [0], max_rounds=-1)


def _brute_jaccard_pairs(doc_shingles: dict, t_num: int, t_den: int):
    ids = sorted(doc_shingles)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(doc_shingles[a] & doc_shingles[b])
            union = len(doc_shingles[a] | doc_shingles[b])
            if inter * t_den >= t_num * union:
                out[(a, b)] = (inter, union)
    return out


def _doc_fixture(spark, seed=17, n_docs=30, vocab=18, length=12):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = [
        (i, " ".join(rng.choice(words, size=length)))
        for i in range(n_docs)
    ]
    # include an exact duplicate and a near-duplicate so the joins fire
    rows.append((n_docs, rows[0][1]))
    rows.append((n_docs + 1, rows[0][1] + " extraword"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_similarity_join_exact_vs_bruteforce(spark):
    docs = _doc_fixture(spark)
    sh = word_shingles(docs, n=3)
    doc_sets: dict[int, set] = {}
    for r in sh.collect():
        doc_sets.setdefault(r["id"], set()).add(r["shingle"])
    for t_num, t_den in ((1, 3), (1, 2), (4, 5)):
        want = _brute_jaccard_pairs(doc_sets, t_num, t_den)
        got = {
            (r["a"], r["b"]): (r["inter"], r["union_sz"])
            for r in similarity_join(sh, t_num, t_den).collect()
        }
        assert got == want, f"t={t_num}/{t_den}"
    assert want  # the strictest threshold still finds the planted dup


def test_prefix_filter_is_complete(spark):
    """Every qualifying pair must appear among the prefix candidates —
    the lossless-ness that distinguishes this from LSH."""
    docs = _doc_fixture(spark, seed=29)
    sh = word_shingles(docs, n=3)
    doc_sets: dict[int, set] = {}
    for r in sh.collect():
        doc_sets.setdefault(r["id"], set()).add(r["shingle"])
    t_num, t_den = 2, 5
    want = set(_brute_jaccard_pairs(doc_sets, t_num, t_den))
    cand = {
        (r["a"], r["b"])
        for r in prefix_filter_pairs(sh, t_num, t_den).collect()
    }
    assert want <= cand
    # and it actually prunes vs the all-pairs space
    n = len(doc_sets)
    assert len(cand) < n * (n - 1) // 2


def test_prefix_filter_rejects_bad_threshold(spark):
    docs = _doc_fixture(spark)
    sh = word_shingles(docs, n=3)
    with pytest.raises(ValueError):
        prefix_filter_pairs(sh, 0, 3)
    with pytest.raises(ValueError):
        prefix_filter_pairs(sh, 4, 3)
