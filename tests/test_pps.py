"""PPS (probability-proportional-to-size) sampling: exact twin + strata."""

from __future__ import annotations

import hashlib
import random

import pytest

from halvesting_geometric_spark.operators.sampling import pps_sample


def _docs_df(spark, sizes):
    return spark.createDataFrame(
        [(f"d{i:04d}", int(s)) for i, s in enumerate(sizes)],
        "doc_id string, size long",
    )


def _ph(doc_id, seed):
    s = f"{doc_id}\x1f{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_pps(sizes, n, seed):
    total = sum(sizes)
    D = 1 << 60
    keep = set()
    for i, s in enumerate(sizes):
        h = _ph(f"d{i:04d}", seed) % D
        if h * total < min(s * n, total) * D:
            keep.add(f"d{i:04d}")
    return keep


def test_portable_vs_python_twin(spark):
    rng = random.Random(61)
    sizes = [rng.randrange(1, 5000) for _ in range(400)]
    got = {
        r.doc_id
        for r in pps_sample(
            _docs_df(spark, sizes), 60, "size", seed=9, hash_method="portable"
        ).collect()
    }
    assert got == _python_pps(sizes, 60, 9)
    # expected size is n; the realized size should be in a wide sane band
    assert 20 <= len(got) <= 140


def test_certainty_stratum_always_kept(spark):
    # one giant doc holding > total/n of the mass is kept with p = 1
    sizes = [10] * 99 + [100_000]
    kept = {
        r.doc_id
        for r in pps_sample(
            _docs_df(spark, sizes), 5, "size", seed=3, hash_method="portable"
        ).collect()
    }
    assert "d0099" in kept


def test_determinism_and_seed_variation(spark):
    sizes = [100 + i for i in range(200)]
    df = _docs_df(spark, sizes)
    a = {r.doc_id for r in pps_sample(df, 40, "size", seed=5).collect()}
    b = {r.doc_id for r in pps_sample(df, 40, "size", seed=5).collect()}
    c = {r.doc_id for r in pps_sample(df, 40, "size", seed=6).collect()}
    assert a == b
    assert a != c


def test_validation(spark):
    df = _docs_df(spark, [10, 20])
    with pytest.raises(ValueError):
        pps_sample(df, 0, "size")
    with pytest.raises(ValueError):
        pps_sample(_docs_df(spark, [0, 0]), 3, "size")
