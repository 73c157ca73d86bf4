from __future__ import annotations

import hashlib

import pytest

from halvesting_geometric_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _portable_hash(*parts, seed=0):
    s = "\x1f".join([*map(str, parts), str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text, k, w):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return set()
    hs = [
        (_portable_hash(" ".join(toks[i : i + k])), i)
        for i in range(len(toks) - k + 1)
    ]
    m = len(hs)
    out = set()
    for s in range(max(m - w, 0) + 1):
        win = hs[s : s + w]
        # smallest hash, rightmost position on ties
        best = min(win, key=lambda t: (t[0], -t[1]))
        out.add((best[1], best[0]))
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "a b a b a b a b a b a b",  # heavy hash ties → exercises the tie rule
    "short",  # < k tokens → no fingerprints
    "the quick brown fox jumps over the sleepy cat",  # shares a prefix run
]


@pytest.mark.parametrize("k,w", [(3, 4), (2, 3), (1, 2)])
def test_winnow_matches_python_twin(spark, k, w):
    got = {}
    rows = winnow_fingerprints(
        _docs(spark, TEXTS), k=k, window=w, hash_method="portable"
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _py_winnow(t, k, w), f"doc {i}"


def test_winnow_guarantee_shared_substring_is_detected(spark):
    # docs 0 and 3 share "the quick brown fox jumps over the" = 7 tokens
    # >= window + k - 1 = 6 → at least one shared fingerprint guaranteed
    pairs = {
        (r["a"], r["b"]): r["shared"]
        for r in winnow_pairs(
            _docs(spark, TEXTS), k=3, window=4, min_shared=1,
            hash_method="portable",
        ).collect()
    }
    assert (0, 3) in pairs


def test_winnow_doc_freq_cap_drops_boilerplate(spark):
    texts = ["common boilerplate line here"] * 5
    uncapped = winnow_pairs(
        _docs(spark, texts), k=3, window=4, min_shared=1,
        max_doc_freq=None, hash_method="portable",
    ).count()
    capped = winnow_pairs(
        _docs(spark, texts), k=3, window=4, min_shared=1,
        max_doc_freq=4, hash_method="portable",
    ).count()
    assert uncapped == 10  # all C(5,2) pairs
    assert capped == 0  # every fingerprint appears in 5 > 4 docs


def test_winnow_rejects_bad_params(spark):
    d = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="k must"):
        winnow_fingerprints(d, k=0)
    with pytest.raises(ValueError, match="window"):
        winnow_fingerprints(d, window=0)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_pairs(d, min_shared=0)
