"""Exact duplicated-substring removal (Lee et al. 2022 semantics) against a
brute-force Python replay: gram counting, window merge, span count, and
in-order reassembly."""

from halvesting_geometric_spark.operators.dedup import dedup_substrings


def _brute(texts, l, min_occ):
    toked = {i: t.split() for i, t in texts.items()}
    counts = {}
    for toks in toked.values():
        for p in range(len(toks) - l + 1):
            g = " ".join(toks[p : p + l]).lower()
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, toks in toked.items():
        cov = set()
        for p in range(len(toks) - l + 1):
            g = " ".join(toks[p : p + l]).lower()
            if counts[g] >= min_occ:
                cov.update(range(p, p + l))
        spans = sum(1 for p in sorted(cov) if p - 1 not in cov)
        clean = " ".join(t for p, t in enumerate(toks) if p not in cov)
        out[i] = (len(toks), len(cov), spans, clean)
    return out


def test_matches_bruteforce_planted_dups(spark):
    boiler = "the quick brown fox jumps over the lazy dog"
    texts = {
        1: f"alpha beta {boiler} gamma delta epsilon zeta",
        2: f"one two three {boiler} four five six seven eight",
        3: "totally unique document with no repeated runs at all here",
        4: f"{boiler} padding {boiler}",  # within-doc repeat, two spans
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["text"])
        for r in dedup_substrings(df, l=5).collect()
    }
    assert got == _brute(texts, 5, 2)
    # the boilerplate run really was cut from every carrier
    assert "quick brown" not in got[1][3] and "quick brown" not in got[2][3]
    assert got[3] == (10, 0, 0, texts[3])


def test_case_insensitive_matching_preserves_original_case(spark):
    texts = {1: "A B C D E tail one", 2: "a b c d e tail two"}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["text"])
        for r in dedup_substrings(df, l=5).collect()
    }
    # "b c d e tail" is itself a shared 5-gram, so "tail" is covered too
    assert got == _brute(texts, 5, 2)
    assert got[1][3] == "one" and got[2][3] == "two"


def test_short_and_empty_docs_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "only four tokens here"), (2, "   "), (3, "x")],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in dedup_substrings(df, l=5).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_spans"] == 0
    assert got[2]["n_tokens"] == 0 and got[2]["text"] == ""
    assert got[3]["text"] == "x"


def test_min_occurrences_threshold(spark):
    t = "p q r s t"
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, t)], "doc_id long, text string"
    )
    kept = dedup_substrings(df, l=5, min_occurrences=4).collect()
    assert all(r["n_dup_tokens"] == 0 for r in kept)
    cut = dedup_substrings(df, l=5, min_occurrences=3).collect()
    assert all(r["n_dup_tokens"] == 5 and r["text"] == "" for r in cut)
