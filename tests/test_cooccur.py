from __future__ import annotations

import math
from collections import Counter

import pytest

from halvesting_geometric_spark.operators.cooccur import (
    cooccurrence_counts,
    cooccurrence_pmi,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_pairs(texts, window):
    c = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for i, w1 in enumerate(toks):
            for o in range(1, window + 1):
                if i + o < len(toks):
                    a, b = sorted((w1, toks[i + o]))
                    c[(a, b)] += 1
    return c


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the cat",
    "cat cat cat",
    "  ",
]


@pytest.mark.parametrize("window", [1, 2, 3])
def test_cooccurrence_counts_match_python_twin(spark, window):
    got = {
        (r["a"], r["b"]): r["cnt"]
        for r in cooccurrence_counts(_docs(spark, TEXTS), window=window)
        .collect()
    }
    assert got == dict(_py_pairs(TEXTS, window))


def test_cooccurrence_min_count(spark):
    full = _py_pairs(TEXTS, 2)
    got = {
        (r["a"], r["b"]): r["cnt"]
        for r in cooccurrence_counts(
            _docs(spark, TEXTS), window=2, min_count=2
        ).collect()
    }
    assert got == {k: v for k, v in full.items() if v >= 2}


def test_cooccurrence_pmi_matches_math(spark):
    window = 2
    pairs = _py_pairs(TEXTS, window)
    C = sum(pairs.values())
    uni = Counter(
        w for t in TEXTS for w in t.lower().split() if w
    )
    T = sum(uni.values())
    rows = cooccurrence_pmi(
        _docs(spark, TEXTS), window=window, min_count=2
    ).collect()
    assert rows, "expected at least one pair with cnt >= 2"
    for r in rows:
        cnt = pairs[(r["a"], r["b"])]
        assert r["cnt"] == cnt
        exp_ratio = (cnt / C) / ((uni[r["a"]] / T) * (uni[r["b"]] / T))
        assert r["ratio"] == pytest.approx(exp_ratio, rel=1e-12)
        assert r["pmi"] == pytest.approx(math.log(exp_ratio), rel=1e-12)


def test_cooccurrence_rejects_bad_params(spark):
    d = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="window"):
        cooccurrence_counts(d, window=0)
    with pytest.raises(ValueError, match="min_count"):
        cooccurrence_counts(d, min_count=0)
