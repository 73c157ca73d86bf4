"""Product quantization: encode determinism, training convergence, and
ADC top-k exactness/recall contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.ivf import _unit_rows
from halvesting_geometric_spark.operators.pq import (
    pq_adc_rerank_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_seed_codebooks,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def _np_encode(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Reference encoder: argmin of e4-rounded squared L2 per subspace."""
    m, k, dsub = cb.shape
    u = _unit_rows(mat)
    sub = u.reshape(len(u), m, dsub)
    out = np.empty((len(u), m), dtype=np.int64)
    for s in range(m):
        x = sub[:, s, :]
        d2 = (
            (x * x).sum(axis=1)[:, None]
            + (cb[s] * cb[s]).sum(axis=1)[None, :]
            - 2.0 * x @ cb[s].T
        )
        out[:, s] = np.floor(d2 * 1e4 + 0.5).astype(np.int64).argmin(axis=1)
    return out


def test_seed_codebooks_shape_and_slicing(emb):
    cb = pq_seed_codebooks(emb, m=4, k=8)
    assert cb.shape == (4, 8, 16)
    # codebooks are SLICES of the unit-normalized seed vectors: gluing the
    # subspaces back together must give unit rows
    glued = cb.transpose(1, 0, 2).reshape(8, 64)
    assert np.allclose(np.linalg.norm(glued, axis=1), 1.0)
    with pytest.raises(ValueError):
        pq_seed_codebooks(emb, m=5, k=8)  # 64 % 5 != 0


def test_encode_matches_numpy_reference(emb):
    cb = pq_seed_codebooks(emb, m=4, k=8)
    rows = pq_encode(emb, cb).collect()
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    want = _np_encode(mat, cb)
    got = {r["vec_id"]: list(r["codes"]) for r in rows}
    assert len(got) == len(mat)
    for i in range(len(mat)):
        assert got[i] == list(want[i])
    # seeds encode to their own code in every subspace (distance 0)
    for i in range(8):
        assert got[i] == [i, i, i, i]


def test_fit_reduces_quantization_error(emb):
    cb, hist = pq_fit(emb, m=4, k=8, iters=3)
    assert cb.shape == (4, 8, 16)
    assert len(hist) == 3
    # Lloyd's error is non-increasing up to the e4 assignment rounding
    assert hist[-1] <= hist[0] + 1e-9
    assert hist[-1] < 0.25  # unit vectors: untrained error would be ~2/m


def test_adc_shape_and_ordering(emb):
    cb, _ = pq_fit(emb, m=4, k=8, iters=2)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") < 10)
    rows = pq_adc_topk(codes, cb, q, k=3).collect()
    assert len(rows) == 30
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        assert len(rs) == 3
        ids = [r["neighbor_id"] for r in rs]
        assert len(set(ids)) == 3
        scores = sorted((r["score_e4"] for r in rs), reverse=True)
        # e4 cosine sums of m=4 rounded terms stay inside [-1e4-2, 1e4+2]
        assert all(-10_002 <= s <= 10_002 for s in scores)


def test_adc_exact_when_every_vector_is_a_codeword(spark):
    """k = corpus size ⇒ every vector encodes to itself (distance 0) and
    the ADC score is the sum of e4-rounded subspace dots of the true
    cosine — ranking must agree with brute force within the m/2-unit
    rounding band. Checked exactly: recompute the reference ADC ranking in
    numpy and require identical (query, [neighbors]) lists."""
    rng = np.random.RandomState(7)
    mat = rng.randn(32, 8)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(32)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_seed_codebooks(df, m=2, k=32)
    codes = pq_encode(df, cb)
    got = {
        (r["vec_id"], tuple(r["codes"])) for r in codes.collect()
    }
    assert got == {(i, (i, i)) for i in range(32)}

    top = pq_adc_topk(codes, cb, df.filter(F.col("vec_id") < 5), k=4)
    per_q: dict[int, list[tuple[int, int]]] = {}
    for r in top.collect():
        per_q.setdefault(r["query_id"], []).append(
            (r["score_e4"], r["neighbor_id"])
        )
    u = _unit_rows(mat)
    sub = u.reshape(32, 2, 4)
    for qid in range(5):
        lut = np.floor(
            np.einsum("md,nmd->nm", sub[qid], sub) * 1e4 + 0.5
        ).astype(np.int64)
        score = lut.sum(axis=1)
        order = sorted(range(32), key=lambda i: (-score[i], i))[:4]
        want = [(int(score[i]), i) for i in order]
        gotq = sorted(per_q[qid], key=lambda t: (-t[0], t[1]))
        assert gotq == want


def _recall_at_10(result_rows, sims) -> float:
    approx_sets: dict[int, set[int]] = {}
    for r in result_rows:
        if r["neighbor_id"] != r["query_id"]:
            approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid in approx_sets:
        exact = [i for i in np.argsort(-sims[qid]) if i != qid][:10]
        hits += len(approx_sets[qid] & set(exact))
        total += 10
    return hits / total


def test_adc_recall_and_rerank(spark, emb):
    """The measured-recall contract the LSH and IVF paths also ship with:
    m=16,k=16 codes are 16 bytes/vector (vs 256 float); the ADC shortlist
    + exact rerank must recover most of the exact cosine top-10 (measured
    0.87 here), and raw ADC@11 must stay a useful filter (measured
    0.44)."""
    cb, _ = pq_fit(emb, m=16, k=16, iters=3)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    u = _unit_rows(mat)
    sims = u @ u.T

    raw = pq_adc_topk(codes, cb, q, k=11).collect()
    assert _recall_at_10(raw, sims) >= 0.3

    reranked = pq_adc_rerank_topk(emb, codes, cb, q, k=11, shortlist=50)
    assert _recall_at_10(reranked.collect(), sims) >= 0.6


def test_adc_empty_and_bounds(spark, emb):
    cb = pq_seed_codebooks(emb, m=4, k=8)
    codes = pq_encode(emb, cb)
    empty = pq_adc_topk(codes, cb, emb.filter(F.col("vec_id") < 0), k=3)
    assert empty.count() == 0
    with pytest.raises(ValueError):
        pq_adc_topk(codes, cb, emb, k=3, max_queries=10)
