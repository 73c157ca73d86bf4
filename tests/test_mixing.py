"""Semantic oracles for budgeted data mixing and token chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.mixing import (
    budget_mix,
    chunk_tokens,
)


def _docs(spark):
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(10 + (i % 5))),
         "en" if i % 3 else "fr")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_budget_mix_rates_and_membership(spark):
    from halvesting_geometric_spark.functions import portable_hash64

    docs = _docs(spark)
    budget = 150
    got = budget_mix(docs, "lang", token_budget=budget, seed=0)
    rows = got.collect()
    # recompute group totals + rates in python
    toks = {
        r["doc_id"]: len(r["text"].split())
        for r in docs.collect()
    }
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    totals: dict[str, int] = {}
    for d, t in toks.items():
        totals[langs[d]] = totals.get(langs[d], 0) + t
    rates = {
        g: min(1_000_000, (budget * 1_000_000) // t)
        for g, t in totals.items()
    }
    hashes = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id",
            F.pmod(portable_hash64(F.col("doc_id"), seed=0), F.lit(1_000_000))
            .alias("h"),
        ).collect()
    }
    want = {d for d in toks if hashes[d] < rates[langs[d]]}
    assert {r["doc_id"] for r in rows} == want
    for r in rows:
        assert r["rate_ppm"] == rates[r["lang"]]
        assert r["group_tokens"] == totals[r["lang"]]
    # the sample is a strict, non-empty subset (budget < totals here)
    assert 0 < len(rows) < len(toks)


def test_budget_mix_under_budget_keeps_everything(spark):
    docs = _docs(spark)
    got = budget_mix(docs, "lang", token_budget=10**9)
    assert got.count() == docs.count()
    assert got.select("rate_ppm").distinct().collect()[0][0] == 1_000_000


def test_budget_mix_per_group_override(spark):
    docs = _docs(spark)
    got = budget_mix(
        docs, "lang", token_budget=10**9, budgets={"fr": 0}
    )
    kept_langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert kept_langs == {"en"}  # fr budget 0 -> rate 0 -> nothing kept


def test_budget_mix_rejects_negative(spark):
    with pytest.raises(ValueError):
        budget_mix(_docs(spark), "lang", token_budget=-1)


def test_chunk_tokens_matches_python(spark):
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"w{j}" for j in range(10))),
            (1, "single"),
            (2, " ".join(f"x{j}" for j in range(4))),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk"])
        for r in chunk_tokens(docs, chunk_size=4, overlap=1).collect()
    )
    want = []
    for did, text in [(0, " ".join(f"w{j}" for j in range(10))),
                      (1, "single"),
                      (2, " ".join(f"x{j}" for j in range(4)))]:
        toks = text.split()
        stride = 3
        for k, s in enumerate(range(0, len(toks), stride)):
            window = toks[s:s + 4]
            want.append((did, k, len(window), " ".join(window)))
    assert got == sorted(want)


def test_chunk_tokens_full_coverage_no_overlap(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(str(j) for j in range(100)))], "doc_id long, text string"
    )
    chunks = chunk_tokens(docs, chunk_size=32, overlap=0).collect()
    # concatenating the chunks reproduces the document exactly
    joined = " ".join(
        c["chunk"] for c in sorted(chunks, key=lambda c: c["chunk_idx"])
    )
    assert joined == " ".join(str(j) for j in range(100))
    assert sum(c["n_tokens"] for c in chunks) == 100


def test_chunk_tokens_rejects_bad_args(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_tokens(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_tokens(docs, chunk_size=4, overlap=4)
