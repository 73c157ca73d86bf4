"""Dedup / similarity / textstats / multimodal operators vs python oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.dedup import (
    exact_dedup,
    jaccard_similarity,
    minhash_near_dups,
    simhash_near_dups,
    word_shingles,
)
from halvesting_geometric_spark.operators.multimodal import (
    extract_features,
    generate_media_fixture,
    sample_frames,
)
from halvesting_geometric_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dups,
    lsh_ann_topk,
)
from halvesting_geometric_spark.operators.textstats import (
    repetition_stats,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river edge"),  # near-dup of 0
    (2, "completely different content about spark dataframes and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "le chat noir dort sur le canapé dans la maison de la famille"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}


def test_exact_dedup(spark):
    got = exact_dedup(_docs_df(spark)).toPandas()
    grp = got[got.n_copies > 1]
    assert len(grp) == 1
    assert grp.iloc[0]["keep_id"] == 0
    assert list(grp.iloc[0]["all_ids"]) == [0, 3]


def test_word_shingles_match_python(spark):
    got = word_shingles(_docs_df(spark), n=3).toPandas()
    for doc_id, text in DOCS:
        exp = _py_shingles(text)
        have = set(got[got.id == doc_id]["shingle"])
        assert have == exp, doc_id


def test_minhash_near_dups_finds_planted_pair(spark):
    pairs = minhash_near_dups(
        _docs_df(spark), threshold=0.5, num_hashes=32, bands=16
    ).toPandas()
    found = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert (0, 1) in found  # near-dup
    assert (0, 3) in found and (1, 3) in found  # exact dup cluster
    assert all({a, b} <= {0, 1, 3} for a, b in found)
    # jaccard values exact vs python
    for _, row in pairs.iterrows():
        sa = _py_shingles(dict(DOCS)[row.a])
        sb = _py_shingles(dict(DOCS)[row.b])
        exp = len(sa & sb) / len(sa | sb)
        assert abs(row.jaccard - exp) < 1e-12


def test_jaccard_all_pairs_matches_python(spark):
    sh = word_shingles(_docs_df(spark), n=2)
    got = jaccard_similarity(sh).toPandas()
    for _, row in got.iterrows():
        sa = _py_shingles(dict(DOCS)[row.a], 2)
        sb = _py_shingles(dict(DOCS)[row.b], 2)
        assert row.inter == len(sa & sb)
        assert row.union_sz == len(sa | sb)


def test_simhash_near_dups(spark):
    # band_bits=4 → 16 blocks > max_hamming=8: pigeonhole recall guaranteed
    pairs = simhash_near_dups(_docs_df(spark), max_hamming=8, band_bits=4).toPandas()
    found = {(a, b) for a, b in zip(pairs.a, pairs.b)}
    assert (0, 3) in found  # identical text → hamming 0
    exact = pairs[(pairs.a == 0) & (pairs.b == 3)]
    assert exact.iloc[0]["hamming"] == 0


# ---------------- similarity ----------------


def _emb_df(spark, sf_dir="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cosine_topk_matches_numpy(spark):
    emb = _emb_df(spark)
    queries = emb.filter(F.col("vec_id") < 2)
    got = cosine_topk_bruteforce(emb, queries, k=5).toPandas()
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    for q in (0, 1):
        qi = np.where(ids == q)[0][0]
        sims = mat @ mat[qi] / (norms * norms[qi])
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != q],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        exp_ids = [i for _, i in order]
        got_q = got[got.query_id == q].sort_values("cosine", ascending=False)
        assert got_q["neighbor_id"].tolist() == exp_ids
        np.testing.assert_allclose(
            got_q["cosine"].to_numpy(), [s for s, _ in order], atol=1e-9
        )


def test_lsh_ann_subset_and_scores_exact(spark):
    emb = _emb_df(spark)
    got = lsh_ann_topk(emb, dim=64, k=3, n_planes=6).toPandas()
    assert len(got) > 0
    # scores must be exact cosines (rerank is exact), spot-check one
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = list(pdf["vec_id"])
    row = got.iloc[0]
    a, b = ids.index(row.query_id), ids.index(row.neighbor_id)
    exp = mat[a] @ mat[b] / (np.linalg.norm(mat[a]) * np.linalg.norm(mat[b]))
    assert abs(row.cosine - exp) < 1e-9


def test_embedding_near_dups_identical_vectors(spark):
    emb = _emb_df(spark).limit(20)
    # plant an exact duplicate vector with a new id
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(dup)
    pairs = embedding_near_dups(both, dim=64, threshold=0.999999).toPandas()
    assert ((pairs.a == 0) & (pairs.b == 100000)).any()


# ---------------- textstats ----------------


def test_token_count_matches_python(spark):
    got = token_count(_docs_df(spark)).toPandas().set_index("doc_id")
    for doc_id, text in DOCS:
        assert got.loc[doc_id, "ws_tokens"] == len(text.split())


def test_language_id(spark):
    got = language_id(_docs_df(spark)).toPandas().set_index("doc_id")
    assert got.loc[0, "lang_pred"] == "en"
    assert got.loc[4, "lang_pred"] == "fr"


def test_quality_score_ranges(spark):
    got = quality_score(_docs_df(spark)).toPandas()
    assert (got["quality"] >= 0).all() and (got["quality"] <= 1).all()
    assert (got["alpha_ratio"] > 0).all()
    assert (
        got[got.doc_id == 0]["quality"].iloc[0]
        > 0.4  # clean english sentence scores well
    )


def test_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "other text")],
        "doc_id long, text string",
    )
    got = fingerprint(df).toPandas().set_index("doc_id")
    assert got.loc[0, "fp_full"] == got.loc[1, "fp_full"]
    assert got.loc[0, "fp_full"] != got.loc[2, "fp_full"]


# ---------------- multimodal ----------------


def test_multimodal_features_deterministic(spark):
    media = generate_media_fixture(spark, n=30)
    f1 = extract_features(media).toPandas().sort_values("media_id")
    f2 = extract_features(media.repartition(7)).toPandas().sort_values("media_id")
    assert len(f1) == 30
    assert (f1["n_bytes"].to_numpy() > 0).all()
    np.testing.assert_array_equal(
        np.stack(f1["feat"].to_numpy()), np.stack(f2["feat"].to_numpy())
    )


def test_multimodal_frame_sampling_counts(spark):
    media = generate_media_fixture(spark, n=30)
    frames = sample_frames(media, every_ms=1000).toPandas()
    meta = media.filter(F.col("kind") == "video").select(
        "media_id", "meta.duration_ms"
    ).toPandas()
    for _, row in meta.iterrows():
        exp = int(row.duration_ms // 1000)
        assert (frames.media_id == row.media_id).sum() == exp


def test_multimodal_pillow_backend_is_explicit_stub(spark):
    media = generate_media_fixture(spark, n=3)
    with pytest.raises(NotImplementedError):
        extract_features(media, decode_backend="pillow")


def test_repetition_stats_match_python(spark):
    import re as _re

    docs = DOCS + [
        (5, "spam spam spam spam spam ham"),          # heavy token repetition
        (6, "a b a b a b a b"),                       # duplicate 2-grams
        (7, ""),                                      # empty doc
        (8, "one"),                                   # single token
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = repetition_stats(df).toPandas().set_index("doc_id")
    for doc_id, text in docs:
        toks = [t for t in _re.split(r"[^0-9a-zA-Z\u00c0-\u024f]+", text.lower().strip()) if t]
        n = len(toks)
        assert got.loc[doc_id, "n_tokens"] == n
        exp_top = max((toks.count(t) for t in set(toks)), default=0) / n if n else 0.0
        assert got.loc[doc_id, "top_token_frac"] == pytest.approx(exp_top)
        for k, col in [(2, "dup_2gram_frac"), (3, "dup_3gram_frac")]:
            grams = [" ".join(toks[i:i + k]) for i in range(n - k + 1)]
            exp = (len(grams) - len(set(grams))) / len(grams) if n >= k else 0.0
            assert got.loc[doc_id, col] == pytest.approx(exp), (doc_id, col)


def test_scrub_text_redacts_and_counts(spark):
    from halvesting_geometric_spark.operators.textstats import scrub_text

    rows = [
        (0, "mail bob@example.com or visit https://ex.org/a?u=x@y.zz now"),
        (1, "server 10.0.0.1 acct 123456789 short 12345678"),
        (2, "clean text with nothing to hide"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = scrub_text(df).toPandas().set_index("doc_id")
    assert got.loc[0, "scrubbed"] == "mail <EMAIL> or visit <URL> now"
    # the email inside the URL was consumed by the URL pattern first
    assert got.loc[0, "n_url"] == 1 and got.loc[0, "n_email"] == 1
    assert got.loc[1, "scrubbed"] == "server <IP> acct <NUM> short 12345678"
    assert got.loc[1, "n_ip"] == 1 and got.loc[1, "n_longnum"] == 1
    assert got.loc[2, "scrubbed"] == rows[2][1]
    assert (
        got.loc[2, ["n_url", "n_email", "n_ip", "n_longnum"]] == 0
    ).all()


def test_scrub_text_custom_patterns_and_validation(spark):
    import pytest as _pytest

    from halvesting_geometric_spark.operators.textstats import scrub_text

    df = spark.createDataFrame([(0, "id ABC-123 ok")], "doc_id long, text string")
    got = scrub_text(
        df, patterns=[("code", r"[A-Z]{3}-\d{3}", "<CODE>")]
    ).toPandas()
    assert got.iloc[0]["scrubbed"] == "id <CODE> ok"
    assert got.iloc[0]["n_code"] == 1
    with _pytest.raises(ValueError, match="non-empty"):
        scrub_text(df, patterns=[])


def test_containment_scores_catch_subset_duplicates(spark):
    from halvesting_geometric_spark.operators.dedup import (
        containment_scores,
        jaccard_similarity,
        word_shingles,
    )

    big = "w" + " w".join(str(i) for i in range(200))
    small = " ".join(f"w{i}" for i in range(30))  # strict subset of big
    rows = [(0, "alpha beta gamma delta epsilon zeta"),
            (1, big), (2, small)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(df, n=3)
    cont = containment_scores(sh).toPandas().set_index(["a", "b"])
    jac = jaccard_similarity(sh).toPandas().set_index(["a", "b"])
    # small-inside-big: containment of the small side ~1.0, Jaccard tiny
    row = cont.loc[(1, 2)]
    assert row["containment_b"] == pytest.approx(1.0)
    assert row["overlap"] == pytest.approx(1.0)
    assert jac.loc[(1, 2)]["jaccard"] < 0.2
    # consistency with the python sets
    import re as _re

    def shingles(text):
        toks = [t for t in _re.split(r"\s+", text.lower().strip()) if t]
        return {" ".join(toks[i:i + 3]) for i in range(max(len(toks) - 2, 1))
                if len(toks[i:i + 3]) > 0}

    s1, s2 = shingles(big), shingles(small)
    assert row["inter"] == len(s1 & s2)
    assert row["containment_a"] == pytest.approx(len(s1 & s2) / len(s1))
    # threshold filters on the overlap coefficient
    hi = containment_scores(sh, min_containment=0.9).toPandas()
    assert set(map(tuple, hi[["a", "b"]].to_numpy())) == {(1, 2)}


def test_l2_normalize_and_quantize_int8(spark):
    import numpy as np

    from halvesting_geometric_spark.operators.similarity import (
        l2_normalize,
        quantize_int8,
    )

    rows = [
        (0, [3.0, 4.0]),
        (1, [0.0, 0.0]),           # zero vector passes through
        (2, [-1.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    norm = l2_normalize(df).toPandas().set_index("vec_id")
    assert norm.loc[0, "norm"] == pytest.approx(5.0)
    np.testing.assert_allclose(norm.loc[0, "unit"], [0.6, 0.8])
    assert norm.loc[1, "norm"] == 0.0
    np.testing.assert_allclose(norm.loc[1, "unit"], [0.0, 0.0])

    q = quantize_int8(df).toPandas().set_index("vec_id")
    assert q.loc[0, "scale"] == pytest.approx(127 / 4.0)
    assert list(q.loc[0, "q"]) == [
        int(np.floor(3.0 * 127 / 4.0 + 0.5)),
        127,
    ]
    assert q.loc[1, "scale"] == 0.0 and list(q.loc[1, "q"]) == [0, 0]
    assert list(q.loc[2, "q"]) == [-127, int(np.floor(0.5 * (127 / 1.5) + 0.5))]
    # codes bounded
    for _, r in q.iterrows():
        assert all(-127 <= c <= 127 for c in r["q"])


def test_near_dup_clusters_transitive(spark):
    from halvesting_geometric_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id long"
    )
    # chain 0-1-2 (transitive cluster), pair 4-5, singletons 3 and 6
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "a long, b long"
    )
    got = (
        near_dup_clusters(pairs, docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got["cluster_rep"].to_dict() == {
        0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6,
    }
    assert got["is_kept"].to_dict() == {
        0: True, 1: False, 2: False, 3: True, 4: True, 5: False, 6: True,
    }


def test_lsh_candidate_pairs_empty_input_keeps_id_type(spark):
    """Empty corpus: the (a, b) frame's id type must follow the caller's id
    column (string here), matching the non-empty case for downstream unions."""
    from halvesting_geometric_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = spark.createDataFrame([], "doc_id string, text string")
    sig = minhash_signatures(word_shingles(docs, n=2), num_hashes=16)
    pairs = lsh_candidate_pairs(sig, bands=8)
    assert pairs.count() == 0
    assert [f.dataType.simpleString() for f in pairs.schema.fields] == [
        "string",
        "string",
    ]
    assert pairs.columns == ["a", "b"]


def test_jaccard_max_doc_freq_preserves_fixture_pairs(spark):
    """The doc-frequency cap drops only ubiquitous shingles: on a fixture
    with a planted near-dup pair plus a stop-shingle present in every doc,
    pair recall is unchanged while the quadratic shingle is gone."""
    from halvesting_geometric_spark.operators.dedup import (
        jaccard_similarity,
        word_shingles,
    )

    stop = "the quick brown"  # 3-shingle shared by every doc
    rows = [
        (1, stop + " alpha beta gamma delta epsilon"),
        (2, stop + " alpha beta gamma delta zeta"),  # near-dup of 1
        (3, stop + " one two three four five"),
        (4, stop + " six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(docs, n=3)

    exact = jaccard_similarity(sh).toPandas().set_index(["a", "b"])
    capped = (
        jaccard_similarity(sh, max_doc_freq=3).toPandas().set_index(["a", "b"])
    )
    # the planted pair survives with a lower-bounded score
    assert (1, 2) in capped.index
    assert capped.loc[(1, 2), "jaccard"] <= exact.loc[(1, 2), "jaccard"]
    assert capped.loc[(1, 2), "jaccard"] > 0.3
    # pairs connected ONLY through the stop shingle disappear (that's the
    # quadratic blowup being cut); with inter lower-bounded and set sizes
    # exact, union_sz = sza + szb - inter upper-bounds the exact union
    assert (3, 4) in exact.index and (3, 4) not in capped.index
    assert (capped["union_sz"] >= exact.loc[capped.index, "union_sz"]).all()
    assert (capped["inter"] <= exact.loc[capped.index, "inter"]).all()


def test_parse_media_meta_inverts_real_headers(spark):
    """parse_media_meta reads REAL container bytes: on the fixture (whose
    image payloads are genuine PNG/JPEG/GIF containers) it must reproduce
    the declared meta exactly; opaque audio/video payloads give nulls."""
    from halvesting_geometric_spark.operators.multimodal import (
        gif_bytes,
        jpeg_bytes,
        parse_image_header,
        parse_media_meta,
        png_bytes,
    )

    # direct byte-level roundtrips incl. 16-bit-boundary dims
    for fmt, build in (("png", png_bytes), ("jpeg", jpeg_bytes), ("gif", gif_bytes)):
        for w, h in ((1, 1), (640, 480), (65535, 257)):
            assert parse_image_header(build(w, h)) == (fmt, w, h), fmt
    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"\x00garbage") == (None, None, None)
    assert parse_image_header(b"\x89PNG\r\n\x1a\n trunc") == ("png", None, None)
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("jpeg", None, None)

    media = generate_media_fixture(spark, n=30)
    got = (
        parse_media_meta(media)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    exp = (
        media.select(
            "media_id", "kind", "meta.format", "meta.width", "meta.height"
        )
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    img = exp["kind"] == "image"
    assert (got.loc[img, "format"] == exp.loc[img, "format"]).all()
    assert (got.loc[img, "width"] == exp.loc[img, "width"]).all()
    assert (got.loc[img, "height"] == exp.loc[img, "height"]).all()
    assert got.loc[~img, ["format", "width", "height"]].isna().all().all()


def test_parse_audio_header_inverts_wav_containers(spark):
    """WAV chunk walk reads real RIFF bytes: byte-level roundtrips, exact
    integer duration, fixture meta equality, garbage tolerance."""
    from halvesting_geometric_spark.operators.multimodal import (
        parse_audio_header,
        parse_audio_meta,
        wav_bytes,
    )

    for ch, rate, ns in ((1, 8000, 1000), (2, 44100, 48000), (2, 16000, 1)):
        fmt, c, r, dur = parse_audio_header(wav_bytes(ch, rate, ns))
        assert (fmt, c, r) == ("wav", ch, rate)
        assert dur == ns * 1000 // rate  # exact integer arithmetic
    assert parse_audio_header(None) == (None, None, None, None)
    assert parse_audio_header(b"RIFFxxxxJUNK") == (None, None, None, None)
    assert parse_audio_header(b"\x00" * 40) == (None, None, None, None)
    # RIFF/WAVE with no fmt/data chunks identifies but yields null fields
    assert parse_audio_header(b"RIFF\x04\x00\x00\x00WAVE") == (
        "wav", None, None, None,
    )

    media = generate_media_fixture(spark, n=30)
    aud = media.filter(F.col("kind") == "audio")
    got = parse_audio_meta(aud).toPandas().set_index("media_id").sort_index()
    exp = (
        aud.select("media_id", "meta.format", "meta.duration_ms")
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert (got["format"] == "wav").all()
    assert (got["duration_ms"] == exp["duration_ms"]).all()
    assert got["channels"].isin([1, 2]).all()


def test_parse_video_header_inverts_mp4_containers(spark):
    """ISO BMFF box walk reads real bytes: roundtrips across timescales,
    exact integer duration, fixture meta equality, garbage tolerance."""
    from halvesting_geometric_spark.operators.multimodal import (
        mp4_bytes,
        parse_video_header,
        parse_video_meta,
    )

    for ts, dur in ((600, 3000), (1000, 1), (90000, 123456)):
        assert parse_video_header(mp4_bytes(ts, dur)) == (
            "mp4",
            dur * 1000 // ts,
        )
    assert parse_video_header(None) == (None, None)
    assert parse_video_header(b"\x89PNG\r\n\x1a\x0agarbage") == (None, None)
    # a bare ftyp with no moov identifies but yields null duration
    bare = mp4_bytes(1000, 1000)[:20]
    assert parse_video_header(bare) == ("mp4", None)

    media = generate_media_fixture(spark, n=30)
    vid = media.filter(F.col("kind") == "video")
    got = parse_video_meta(vid).toPandas().set_index("media_id").sort_index()
    exp = (
        vid.select("media_id", "meta.duration_ms")
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert (got["format"] == "mp4").all()
    assert (got["duration_ms"] == exp["duration_ms"]).all()


def test_burstiness_matches_numpy_twin(spark):
    import datetime as dt

    import numpy as np

    from halvesting_geometric_spark.operators.events import burstiness

    base = dt.datetime(2026, 4, 1)
    rows = []
    # periodic: constant 60s gaps -> B == -1; bursty: heavy-tailed gaps
    t = 0
    for i in range(50):
        rows.append(("periodic", base + dt.timedelta(seconds=60 * i), i))
    gaps = [1, 1, 1, 1, 3600] * 10
    for i, g in enumerate(gaps):
        t += g
        rows.append(("bursty", base + dt.timedelta(seconds=t), 100 + i))
    rows.append(("single", base, 999))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long")
    got = {r.event_type: r for r in burstiness(df, "event_type").collect()}

    def twin(gms):
        gms = np.asarray(gms, dtype=np.int64)
        n, sg, sg2 = len(gms), int(gms.sum()), int((gms * gms).sum())
        mu = sg / n
        sigma = np.sqrt(max(sg2 / n - mu * mu, 0.0))
        return int(np.floor((sigma - mu) / (sigma + mu) * 1e6 + 0.5))

    assert got["periodic"].b_e6 == -1_000_000  # sigma == 0 -> B = -1
    # exact twin over the actual gap sequence of the constructed series
    series = sorted(r[1] for r in rows if r[0] == "bursty")
    actual = [
        int((b - a).total_seconds() * 1000) for a, b in zip(series, series[1:])
    ]
    assert got["bursty"].b_e6 == twin(actual)
    assert got["bursty"].b_e6 > 0  # bursty stream scores positive
    assert "single" not in got  # no gaps -> no row


def test_gap_memory_matches_numpy_twin(spark):
    import datetime as dt

    import numpy as np

    from halvesting_geometric_spark.operators.events import gap_memory

    base = dt.datetime(2026, 5, 1)
    # alternating short/long gaps -> strong negative memory;
    # monotone-growing gaps -> positive memory
    alt_gaps = [10, 900] * 20
    mono_gaps = list(range(10, 300, 7))
    rows, eid = [], 0
    for name, gaps in (("alt", alt_gaps), ("mono", mono_gaps)):
        t = 0
        rows.append((name, base, eid)); eid += 1
        for g in gaps:
            t += g
            rows.append((name, base + dt.timedelta(seconds=t), eid)); eid += 1
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long")
    got = {r.event_type: r for r in gap_memory(df, "event_type").collect()}

    def twin(gaps):
        a = np.asarray(gaps[:-1], dtype=np.int64)
        b = np.asarray(gaps[1:], dtype=np.int64)
        n = len(a)
        num = float(n * (a * b).sum() - a.sum() * b.sum())
        da = float(n * (a * a).sum() - a.sum() ** 2)
        db = float(n * (b * b).sum() - b.sum() ** 2)
        return int(np.floor(num / (np.sqrt(da) * np.sqrt(db)) * 1e6 + 0.5))

    assert got["alt"].m_e6 == twin(alt_gaps)
    assert got["alt"].m_e6 < -900_000  # near-perfect alternation
    assert got["mono"].m_e6 == twin(mono_gaps)
    assert got["mono"].m_e6 > 900_000  # monotone growth
