"""BPE subword trainer/segmenter."""

from __future__ import annotations

import pyspark.sql.functions as F

from halvesting_geometric_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_counts,
)


def test_bpe_textbook_example(spark):
    """The classic low/lower/newest corpus: first merges must fuse the
    shared stems, exactly as in the original presentation of the
    algorithm."""
    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "low low newer newest"), (2, "wider new")],
        "doc_id long, text string",
    )
    merges, syms = bpe_train(docs, num_merges=5)
    assert [(a, b) for a, b, _ in merges[:2]] == [("l", "o"), ("lo", "w")]
    seg = {
        (r["doc_id"], r["word"]): list(r["subwords"])
        for r in bpe_segment(docs, merges, word_syms=syms).collect()
    }
    assert seg[(0, "low")] == ["low"]
    assert seg[(0, "lower")][0] == "low"
    # segmentation always concatenates back to the word
    for (_, w), parts in seg.items():
        assert "".join(parts) == w


def test_bpe_merge_is_greedy_leftmost(spark):
    docs = spark.createDataFrame([(0, "aaa aaa aa")], "doc_id long, text string")
    merges, syms = bpe_train(docs, num_merges=1)
    assert (merges[0][0], merges[0][1]) == ("a", "a")
    got = {r["word"]: list(r["s"]) for r in syms.collect()}
    # greedy left: aaa -> [aa, a], aa -> [aa]
    assert got["aaa"] == ["aa", "a"]
    assert got["aa"] == ["aa"]


def test_bpe_counts_are_weighted_by_frequency(spark):
    # 'zx' appears 3 times, 'qy' once: the first merge must be (z, x)
    docs = spark.createDataFrame(
        [(0, "zx zx"), (1, "zx qy")], "doc_id long, text string"
    )
    merges, _ = bpe_train(docs, num_merges=1)
    assert (merges[0][0], merges[0][1], merges[0][2]) == ("z", "x", 3)


def test_bpe_exhausts_small_vocab(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges, syms = bpe_train(docs, num_merges=10)
    # one merge fuses the whole word; further rounds find no pairs
    assert len(merges) == 1
    assert {tuple(r["s"]) for r in syms.collect()} == {("ab",)}


def test_bpe_segment_without_trained_syms(spark):
    docs = spark.createDataFrame([(0, "banana bandana")], "doc_id long, text string")
    merges, _ = bpe_train(docs, num_merges=2)
    seg = bpe_segment(docs, merges)  # recompute path
    for r in seg.collect():
        assert "".join(r["subwords"]) == r["word"]


def test_word_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "B a")], "doc_id long, text string"
    )
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert got == {"a": 3, "b": 2}


def test_bpe_subword_total_shrinks_monotonically(spark):
    """Each merge can only reduce (or keep) the corpus subword count —
    the compression-progress invariant."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(100)
    totals = []
    for k in (0, 1, 3):
        merges, syms = bpe_train(docs, num_merges=k)
        seg = bpe_segment(docs, merges, word_syms=syms)
        totals.append(
            seg.agg(F.sum(F.size("subwords")).alias("t")).first()["t"]
        )
    assert totals[0] >= totals[1] >= totals[2]
    assert totals[2] < totals[0]
