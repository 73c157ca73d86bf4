from __future__ import annotations

import collections
import math
import re
import zlib

import pytest

from halvesting_geometric_spark.operators.diversity import (
    compression_ratio,
    distinct_ngrams,
    heaps_checkpoints,
    unigram_entropy,
    zipf_slope,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log the dog"),
    (2, "a cat and a dog and a bird"),
    (3, "  the   the the  "),
    (4, "solo"),
    (5, ""),
]


def _toks(t: str) -> list[str]:
    return [x for x in re.split(r"\s+", t.strip()) if x]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_distinct_ngrams_bruteforce(docs):
    got = {
        r.n: (r.total_ngrams, r.distinct_ngrams, r.ratio_e6)
        for r in distinct_ngrams(docs, ns=(1, 2, 3)).collect()
    }
    for n in (1, 2, 3):
        tot, dis = 0, set()
        for _, t in DOCS:
            tk = _toks(t)
            for i in range(len(tk) - n + 1):
                tot += 1
                dis.add(" ".join(tk[i : i + n]))
        assert got[n] == (
            tot,
            len(dis),
            math.floor(len(dis) * 1e6 / tot + 0.5),
        )


def test_distinct_ngrams_short_docs_excluded(spark):
    # a 1-token doc must contribute NO bigrams (no descending sequence)
    df = spark.createDataFrame([(0, "one"), (1, "a b")], "doc_id long, text string")
    got = {r.n: r.total_ngrams for r in distinct_ngrams(df, ns=(2,)).collect()}
    assert got[2] == 1


@pytest.mark.parametrize("scalable", [False, True])
def test_zipf_slope_bruteforce(docs, scalable):
    cnt = collections.Counter()
    for _, t in DOCS:
        cnt.update(_toks(t))
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(i + 1) * 1e9 + 0.5) for i in range(len(ordered))]
    ys = [math.floor(math.log(c) * 1e9 + 0.5) for _, c in ordered]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    sxx, syy = float(sum(a * a for a in xs)), float(sum(b * b for b in ys))
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    r = zipf_slope(docs, scalable=scalable).first()
    assert r.slope_e6 == math.floor(cov / varx * 1e6 + 0.5)
    assert r.r2_e6 == math.floor(cov * cov / (varx * vary) * 1e6 + 0.5)
    assert r.n_terms == len(ordered)


def test_unigram_entropy_bruteforce(docs):
    cnt = collections.Counter()
    for _, t in DOCS:
        cnt.update(_toks(t))
    big_n = sum(cnt.values())
    s = sum(c * math.floor(math.log2(c) * 1e9 + 0.5) for c in cnt.values())
    want = math.floor(
        (math.log2(float(big_n)) - float(s) / (float(big_n) * 1e9)) * 1e6 + 0.5
    )
    r = unigram_entropy(docs).first()
    assert (r.entropy_e6, r.n_tokens, r.vocab) == (want, big_n, len(cnt))


def test_unigram_entropy_uniform(spark):
    # 8 distinct tokens once each -> exactly 3 bits
    df = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string"
    )
    assert unigram_entropy(df).first().entropy_e6 == 3_000_000


def test_heaps_checkpoints_bruteforce(docs):
    stream: list[str] = []
    for _, t in sorted(DOCS):
        stream.extend(_toks(t))
    firsts: dict[str, int] = {}
    for i, tk in enumerate(stream, 1):
        firsts.setdefault(tk, i)
    cps = (1, 3, 6, 10, 100)
    want = {k: sum(1 for v in firsts.values() if v <= k) for k in cps}
    got = {
        r.tokens: r.vocab
        for r in heaps_checkpoints(docs, checkpoints=cps).collect()
    }
    assert got == want
    # growth is monotone and ends at the full vocabulary
    assert got[100] == len(firsts)


def test_compression_ratio_matches_zlib(docs):
    got = {
        r.doc_id: (r.raw_bytes, r.zlib_bytes, r.ratio_e6)
        for r in compression_ratio(docs).collect()
    }
    for did, t in DOCS:
        raw = t.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        assert got[did] == (
            len(raw),
            z,
            math.floor(len(raw) * 1e6 / z + 0.5),
        )


def test_compression_ratio_flags_repetition(spark):
    df = spark.createDataFrame(
        [(0, "spam " * 500), (1, " ".join(f"w{i}x{i * 7 % 13}" for i in range(500)))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.ratio_e6 for r in compression_ratio(df).collect()}
    assert got[0] > 3 * got[1]


def test_js_divergence_bruteforce(spark):
    from halvesting_geometric_spark.operators.diversity import js_divergence

    a_docs = [(0, "a a b c"), (1, "a b d")]
    b_docs = [(0, "a c c e"), (1, "e e")]
    da = spark.createDataFrame(a_docs, "doc_id long, text string")
    db = spark.createDataFrame(b_docs, "doc_id long, text string")
    ca = collections.Counter("a a b c a b d".split())
    cb = collections.Counter("a c c e e e".split())
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    s = 0
    for t in vocab:
        pa = ca.get(t, 0) / na
        pb = cb.get(t, 0) / nb
        m = (pa + pb) / 2
        c = 0.0
        if ca.get(t, 0) > 0:
            c += pa * math.log2(pa / m)
        if cb.get(t, 0) > 0:
            c += pb * math.log2(pb / m)
        s += math.floor(c * 1e12 + 0.5)
    want = math.floor(float(s) / 2e6 + 0.5)
    r = js_divergence(da, db).first()
    assert (r.jsd_e6, r.n_a, r.n_b, r.vocab) == (want, na, nb, len(vocab))


def test_js_divergence_bounds(spark):
    from halvesting_geometric_spark.operators.diversity import js_divergence

    same = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    assert js_divergence(same, same).first().jsd_e6 == 0
    da = spark.createDataFrame([(0, "p q r")], "doc_id long, text string")
    db = spark.createDataFrame([(0, "s t u")], "doc_id long, text string")
    # disjoint vocabularies -> exactly 1 bit
    assert js_divergence(da, db).first().jsd_e6 == 1_000_000


def test_unigram_cross_entropy_bruteforce(spark):
    from halvesting_geometric_spark.operators.diversity import (
        unigram_cross_entropy,
    )

    train = [(0, "a a b c"), (1, "a b")]
    evald = [(0, "a b z z")]
    dt = spark.createDataFrame(train, "doc_id long, text string")
    de = spark.createDataFrame(evald, "doc_id long, text string")
    ca = collections.Counter("a a b c a b".split())
    cb = collections.Counter("a b z z".split())
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    v = len(vocab)
    s = 0
    for t in vocab:
        if cb.get(t, 0) == 0:
            continue
        qb = cb[t] / nb
        p = (ca.get(t, 0) + 1.0) / (na + 1.0 * v)
        s += math.floor(-qb * math.log2(p) * 1e12 + 0.5)
    want_ce = math.floor(float(s) / 1e6 + 0.5)
    oov = cb["z"]
    r = unigram_cross_entropy(dt, de).first()
    assert r.ce_bits_e6 == want_ce
    assert r.oov_rate_e6 == math.floor(oov * 1e6 / nb + 0.5)
    assert (r.n_eval_tokens, r.vocab) == (nb, v)


def test_heaps_checkpoints_duplicate_ids(spark):
    # duplicate doc_id rows each get their own positions (rows ordered
    # deterministically by text within an id) — no overlapping offsets
    df = spark.createDataFrame(
        [(1, "a b"), (1, "c d"), (2, "e f")],
        "doc_id long, text string",
    )
    # streams: id1 -> sorted by text: "a b" then "c d"; id2 -> "e f"
    # global order by id: a b c d e f (positions 1..6)
    got = {
        r.tokens: r.vocab
        for r in heaps_checkpoints(df, checkpoints=(2, 4, 6)).collect()
    }
    assert got == {2: 2, 4: 4, 6: 6}
