from __future__ import annotations

import datetime as dt

import pytest

from halvesting_geometric_spark.operators.dialogue import topic_boundaries

E6 = 1_000_000


def _twin(convs, w):
    out = {}
    for cid, texts in convs.items():
        toks = [set(t.split()) for t in texts]
        n = len(toks)
        for b in range(n - 1):
            left = set().union(*toks[max(0, b - w + 1) : b + 1])
            right = set().union(*toks[b + 1 : b + 1 + w])
            inter = len(left & right)
            union = len(left | right)
            out[(cid, b)] = (inter, union, inter * E6 // union)
    return out


def _df(spark, convs):
    rows = []
    for cid, texts in convs.items():
        for i, t in enumerate(texts):
            rows.append(
                (cid, i, "user", t, "", dt.datetime(2026, 1, 1, 0, i))
            )
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


@pytest.mark.parametrize("w", [1, 3])
def test_topic_boundaries_matches_set_twin(spark, w):
    convs = {
        "a": [
            "the cat sat here",
            "a cat and a dog",
            "dog ran fast",
            "quantum flux capacitor",  # topic shift
            "flux capacitor charge level",
            "charge the capacitor now",
        ],
        "b": ["same words here", "same words here", "same words here"],
    }
    got = {
        (r.conv_id, r.boundary): (r.inter, r.union_sz, r.jaccard_e6)
        for r in topic_boundaries(_df(spark, convs), w=w).collect()
    }
    assert got == _twin(convs, w)
    # the injected shift in conv a (boundary 2) scores lowest
    a_scores = {b: v[2] for (c, b), v in got.items() if c == "a"}
    assert min(a_scores, key=a_scores.get) == 2
    # the constant conversation scores a perfect 1.0 everywhere
    assert all(v[2] == E6 for (c, _), v in got.items() if c == "b")


def test_topic_boundaries_validation(spark):
    with pytest.raises(ValueError):
        topic_boundaries(_df(spark, {"a": ["x y", "y z"]}), w=0)
    # a single-turn conversation has no interior boundary
    out = topic_boundaries(_df(spark, {"solo": ["only turn"]}), w=2)
    assert out.count() == 0


def test_context_windows_matches_python_twin(spark):
    from halvesting_geometric_spark.operators.dialogue import context_windows

    convs = {
        "a": ["t0", "t1", "t2", "t3", "t4", "t5"],
        "b": ["solo"],
    }
    out = {
        (r.conv_id, r.turn_idx): r.context
        for r in context_windows(_df(spark, convs), k=3, sep="|").collect()
    }
    for cid, texts in convs.items():
        for i in range(len(texts)):
            want = "|".join(texts[max(0, i - 3) : i])
            assert out[(cid, i)] == want, (cid, i)
    assert out[("b", 0)] == ""  # first turn: empty context, not null


def test_context_windows_validation(spark):
    import pytest as _pytest

    from halvesting_geometric_spark.operators.dialogue import context_windows

    with _pytest.raises(ValueError):
        context_windows(_df(spark, {"a": ["x"]}), k=0)
