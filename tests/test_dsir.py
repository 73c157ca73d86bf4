"""DSIR importance scores against a brute-force Python replay (portable
hash, add-alpha smoothing, unigram+bigram hashed features)."""

import hashlib
import math

from halvesting_geometric_spark.operators.mixing import dsir_scores


def _phash(s: str, seed: int = 0) -> int:
    joined = "\x1f".join([s, str(seed)]).encode()
    return int(hashlib.md5(joined).hexdigest()[:15], 16)


def _feats(text: str, buckets: int, use_bigrams=True):
    toks = text.strip().lower().split()
    toks = [t for t in toks if t]
    f = list(toks)
    if use_bigrams and len(toks) >= 2:
        f += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_phash(x) % buckets for x in f]


def _brute(raw, tgt, buckets, alpha):
    rawf = {i: _feats(t, buckets) for i, t in raw.items()}
    tgtf = [b for t in tgt.values() for b in _feats(t, buckets)]
    cr, ct = {}, {}
    for fs in rawf.values():
        for b in fs:
            cr[b] = cr.get(b, 0) + 1
    for b in tgtf:
        ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), len(tgtf)
    out = {}
    for i, fs in rawf.items():
        s = sum(
            math.log((ct.get(b, 0) + alpha) / (nt + alpha * buckets))
            - math.log((cr[b] + alpha) / (nr + alpha * buckets))
            for b in fs
        )
        out[i] = (len(fs), math.floor(s * 10_000 + 0.5))
    return out


def test_matches_bruteforce(spark):
    raw = {
        1: "the cat sat on the mat",
        2: "stock market prices fell sharply today",
        3: "the dog sat on the log",
        4: "quarterly earnings beat market expectations",
    }
    tgt = {10: "the cat sat quietly", 11: "a dog sat on a mat"}
    rd = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    td = spark.createDataFrame(list(tgt.items()), "doc_id long, text string")
    got = {
        r["id"]: (r["n_feats"], r["llr_e4"])
        for r in dsir_scores(rd, td, buckets=256).collect()
    }
    assert got == _brute(raw, tgt, 256, 0.5)
    # animal sentences must score higher than finance ones vs the animal target
    assert min(got[1][1], got[3][1]) > max(got[2][1], got[4][1])


def test_empty_and_short_docs(spark):
    rd = spark.createDataFrame(
        [(1, "   "), (2, "single")], "doc_id long, text string"
    )
    td = spark.createDataFrame([(9, "single word")], "doc_id long, text string")
    got = {r["id"]: r for r in dsir_scores(rd, td, buckets=64).collect()}
    assert got[1]["n_feats"] == 0 and got[1]["llr_e4"] == 0
    assert got[2]["n_feats"] == 1  # unigram only, no bigram possible


def test_unigram_only_mode(spark):
    raw = {1: "a b c"}
    rd = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    got = dsir_scores(rd, rd, buckets=64, use_bigrams=False).collect()
    assert got[0]["n_feats"] == 3
    # target == raw -> every bucket ratio is 1 -> llr exactly 0
    assert got[0]["llr_e4"] == 0


def _brute_clf(raw, weights, buckets, bias):
    out = {}
    for i, t in raw.items():
        fs = _feats(t, buckets)
        s = bias + sum(weights.get(b, 0.0) for b in fs)
        out[i] = (len(fs), math.floor(s * 10_000 + 0.5), s >= 0)
    return out


def test_classifier_scores_matches_bruteforce(spark):
    from halvesting_geometric_spark.operators.mixing import classifier_scores

    raw = {
        1: "clean well written informative article text",
        2: "spam spam click here spam buy now",
        3: "   ",
    }
    wmap = {b: ((b * 37) % 21 - 10) / 10.0 for b in range(128)}
    rd = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    wd = spark.createDataFrame(list(wmap.items()), "bucket long, weight double")
    got = {
        r["id"]: (r["n_feats"], r["score_e4"], r["positive"])
        for r in classifier_scores(rd, wd, bias=-0.25, buckets=128).collect()
    }
    assert got == _brute_clf(raw, wmap, 128, -0.25)
    # featureless doc scores exactly at the bias
    assert got[3] == (0, math.floor(-0.25 * 10_000 + 0.5), False)


def test_classifier_missing_buckets_weigh_zero(spark):
    from halvesting_geometric_spark.operators.mixing import classifier_scores

    rd = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    wd = spark.createDataFrame([], "bucket long, weight double")
    r = classifier_scores(rd, wd, bias=1.0, buckets=64).collect()[0]
    assert r["n_feats"] == 3 and r["score_e4"] == 10_000 and r["positive"]
