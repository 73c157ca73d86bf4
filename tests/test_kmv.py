"""KMV bottom-k distinct sketch + pairwise Jaccard estimation."""

import pytest

from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.sketch import kmv_jaccard, kmv_sketch


def _df(spark, groups):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "grp string, val long")


def test_kmv_sketch_is_bottom_k_of_distinct_hashes(spark):
    # duplicates collapse; ranks are 1..min(k, n_distinct) in hash order
    df = _df(spark, {"a": [1, 2, 3, 2, 1], "b": [7]})
    sk = kmv_sketch(df, "grp", "val", k=2)
    rows = sorted(
        (r["group"], r["rank"], r["h"]) for r in sk.collect()
    )
    a_rows = [r for r in rows if r[0] == "a"]
    assert [r[1] for r in a_rows] == [1, 2]
    assert a_rows[0][2] < a_rows[1][2]
    assert [(r[0], r[1]) for r in rows if r[0] == "b"] == [("b", 1)]


def test_kmv_sketch_two_phase_matches_single_window(spark):
    vals = list(range(200))
    df = _df(spark, {"g": vals})
    got = {
        (r["rank"], r["h"])
        for r in kmv_sketch(df, "grp", "val", k=16, salt_buckets=4).collect()
    }
    ref = {
        (r["rank"], r["h"])
        for r in kmv_sketch(df, "grp", "val", k=16, salt_buckets=1).collect()
    }
    assert got == ref and len(got) == 16


def test_kmv_jaccard_exact_when_k_exceeds_union(spark):
    # |A ∪ B| = 6, |A ∩ B| = 2 -> J = 1/3 exactly; k=16 > union size
    df = _df(spark, {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6]})
    sk = kmv_sketch(df, "grp", "val", k=16)
    row = kmv_jaccard(sk, k=16).collect()[0]
    assert (row["g1"], row["g2"]) == ("a", "b")
    assert (row["n_union"], row["matches"]) == (6, 2)
    assert row["jaccard_e6"] == 333333  # floor(2e6/6 + 0.5)


def test_kmv_jaccard_all_pairs_and_disjoint(spark):
    df = _df(spark, {"a": [1, 2], "b": [1, 2], "c": [9]})
    sk = kmv_sketch(df, "grp", "val", k=8)
    got = {
        (r["g1"], r["g2"]): (r["matches"], r["n_union"], r["jaccard_e6"])
        for r in kmv_jaccard(sk, k=8).collect()
    }
    assert got[("a", "b")] == (2, 2, 1_000_000)
    assert got[("a", "c")] == (0, 3, 0)
    assert got[("b", "c")] == (0, 3, 0)


def test_kmv_validates_k(spark):
    df = _df(spark, {"a": [1]})
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "grp", "val", k=0)


# ------------------------------- vocab coverage (textstats.vocab_coverage)

from halvesting_geometric_spark.operators.textstats import vocab_coverage  # noqa: E402


def test_vocab_coverage_counts_and_ties(spark):
    docs = spark.createDataFrame(
        [
            (0, "aa bb aa cc"),
            (1, "bb bb dd"),
            (2, "  "),
        ],
        "doc_id long, text string",
    )
    # corpus counts: bb=3, aa=2, cc=1, dd=1 -> vocab_size=3 keeps bb, aa,
    # and the tie cc<dd resolved by token ascending -> cc in, dd out
    got = {
        r["id"]: (r["n_tokens"], r["n_oov"], r["oov_e6"])
        for r in vocab_coverage(docs, vocab_size=3).collect()
    }
    assert got[0] == (4, 0, 0)
    assert got[1] == (3, 1, 333333)
    assert got[2] == (0, 0, 0)  # empty doc still gets a row


def test_vocab_coverage_full_vocab_means_zero_oov(spark):
    docs = spark.createDataFrame(
        [(0, "x y z"), (1, "x q")], "doc_id long, text string"
    )
    rows = vocab_coverage(docs, vocab_size=100).collect()
    assert all(r["n_oov"] == 0 for r in rows)


def test_vocab_coverage_validates_size(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vocab_size"):
        vocab_coverage(docs, vocab_size=0)
