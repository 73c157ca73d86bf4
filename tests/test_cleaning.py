"""Corpus-cleaning pipeline: stage composition + audit arithmetic."""

from __future__ import annotations

import pytest

from halvesting_geometric_spark.plans.cleaning import clean_corpus


def test_clean_corpus_stages(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog with it for now"),
        (1, "the quick brown fox jumps over the lazy dog with it for now"),  # dup of 0
        (2, "x"),                                    # too short -> low quality
        (3, "mail bob@example.com about the quick brown fox and the lazy "
            "dog that it is for"),
        (4, "le chat noir dort sur le canape dans la maison de la famille"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = clean_corpus(df, min_quality=0.5)
    audit = res.audit.first()
    assert audit["n_input"] == 5
    docs = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert 0 in docs and 1 not in docs          # dedup kept the min id
    assert 2 not in docs                        # quality-filtered
    assert 3 in docs and "<EMAIL>" in docs[3]   # scrubbed survivor
    assert audit["n_output"] == len(docs)
    assert audit["n_quality_pass"] - audit["n_dup_removed"] == audit["n_output"]
    # language allowlist drops the french doc
    res_en = clean_corpus(df, min_quality=0.3, languages=["en"])
    ids = {r["doc_id"] for r in res_en.docs.collect()}
    assert 4 not in ids
