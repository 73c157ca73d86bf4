"""Count-min sketch: cell arithmetic, no-underestimate/mergeability
invariants, and heavy-hitter recovery."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    count_min_sketch,
    heavy_hitters,
)


def _py_portable(value: str, seed: int) -> int:
    s = "\x1f".join([value, str(seed)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def words(spark):
    # zipf-ish deterministic corpus: word_i appears (40 - 2i) times
    rows = []
    n = 0
    for i in range(20):
        for _ in range(40 - 2 * i):
            rows.append((n, f"word_{i}"))
            n += 1
    return spark.createDataFrame(rows, "row_id long, w string").repartition(4)


def test_cells_match_python_reference(words):
    depth, width = 3, 64
    cells = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(
            words, "w", depth=depth, width=width, hash_method="portable"
        ).collect()
    }
    counts = Counter(r["w"] for r in words.collect())
    want: dict[tuple[int, int], int] = {}
    for w, c in counts.items():
        for d in range(depth):
            b = _py_portable(w, d) % width
            want[(d, b)] = want.get((d, b), 0) + c
    assert cells == want


def test_estimate_never_underestimates_and_is_exact_when_wide(spark, words):
    counts = Counter(r["w"] for r in words.collect())
    keys = spark.createDataFrame(
        [(k,) for k in counts], "key string"
    )
    # narrow sketch: overestimates allowed, underestimates never
    sk = count_min_sketch(words, "w", depth=4, width=16, hash_method="portable")
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(
            sk, keys, depth=4, width=16, hash_method="portable"
        ).collect()
    }
    assert est.keys() == set(counts)
    assert all(est[k] >= counts[k] for k in counts)
    # wide sketch: 20 keys into 4×4096 cells — estimates are exact
    sk2 = count_min_sketch(
        words, "w", depth=4, width=4096, hash_method="portable"
    )
    est2 = {
        r["key"]: r["est"]
        for r in cms_estimate(
            sk2, keys, depth=4, width=4096, hash_method="portable"
        ).collect()
    }
    assert est2 == dict(counts)


def test_merge_equals_sketch_of_union(words):
    a = words.filter(F.col("row_id") % 2 == 0)
    b = words.filter(F.col("row_id") % 2 == 1)
    merged = cms_merge(
        count_min_sketch(a, "w", depth=3, width=32, hash_method="portable"),
        count_min_sketch(b, "w", depth=3, width=32, hash_method="portable"),
    )
    full = count_min_sketch(words, "w", depth=3, width=32, hash_method="portable")
    ma = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    mf = {(r["row"], r["bucket"]): r["cnt"] for r in full.collect()}
    assert ma == mf


def test_weighted_sketch(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "k string, wt long"
    )
    sk = count_min_sketch(
        df, "k", depth=2, width=8, weight="wt", hash_method="portable"
    )
    keys = spark.createDataFrame([("a",), ("b",)], "key string")
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(
            sk, keys, depth=2, width=8, hash_method="portable"
        ).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 1


def test_heavy_hitters_recovers_exact_topk(words):
    top = heavy_hitters(
        words, "w", k=5, depth=4, width=4096, hash_method="portable"
    ).collect()
    got = [(r["key"], r["est"]) for r in top]
    # exact counts: word_0=40 > word_1=38 > ... — wide sketch makes the
    # estimates exact, so the ranking is the true top-5
    assert got == [(f"word_{i}", 40 - 2 * i) for i in range(5)]


def test_heavy_hitters_xxhash_default(words):
    # scale-path hash: ranking invariants only (values engine-private)
    top = heavy_hitters(words, "w", k=3, depth=4, width=4096).collect()
    assert [r["key"] for r in top] == ["word_0", "word_1", "word_2"]


def test_streaming_sketch_matches_batch_and_resumes(spark, tmp_path):
    from halvesting_geometric_spark.streaming.sketch import (
        read_sketch,
        stream_sketch_available_now,
    )

    in_dir = str(tmp_path / "in")
    sk_dir = str(tmp_path / "sk")
    ck_dir = str(tmp_path / "ck")
    rows1 = [(i, f"word_{i % 7}") for i in range(100)]
    spark.createDataFrame(rows1, "row_id long, w string").write.mode(
        "append"
    ).parquet(in_dir)
    stream_sketch_available_now(
        spark, in_dir, sk_dir, ck_dir, "row_id long, w string", "w",
        depth=3, width=64, hash_method="portable",
    )
    batch1 = count_min_sketch(
        spark.read.parquet(in_dir), "w", depth=3, width=64,
        hash_method="portable",
    )
    fold = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in read_sketch(spark, sk_dir).collect()
    }
    want = {(r["row"], r["bucket"]): r["cnt"] for r in batch1.collect()}
    assert fold == want

    # new files land; re-drain folds ONLY the delta, totals stay exact
    rows2 = [(i, f"word_{i % 5}") for i in range(100, 160)]
    spark.createDataFrame(rows2, "row_id long, w string").write.mode(
        "append"
    ).parquet(in_dir)
    stream_sketch_available_now(
        spark, in_dir, sk_dir, ck_dir, "row_id long, w string", "w",
        depth=3, width=64, hash_method="portable",
    )
    batch2 = count_min_sketch(
        spark.read.parquet(in_dir), "w", depth=3, width=64,
        hash_method="portable",
    )
    fold2 = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in read_sketch(spark, sk_dir).collect()
    }
    want2 = {(r["row"], r["bucket"]): r["cnt"] for r in batch2.collect()}
    assert fold2 == want2


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_accuracy_at_lgk12(spark):
    from halvesting_geometric_spark.operators.sketch import approx_distinct

    n = 5000
    df = spark.range(0, n * 3).selectExpr("concat('k', id % 5000) AS k")
    est = approx_distinct(df, "k", lgk=12).first()["approx_distinct"]
    # stderr ~ 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - n) / n < 0.065


def test_hll_merge_equals_sketch_of_union(spark):
    from halvesting_geometric_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    a = spark.range(0, 4000).selectExpr("concat('k', id) AS k")
    b = spark.range(2000, 7000).selectExpr("concat('k', id) AS k")
    sa, sb = hll_sketch(a, "k", lgk=10), hll_sketch(b, "k", lgk=10)
    merged = hll_merge(sa, sb)
    whole = hll_sketch(a.union(b), "k", lgk=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # idempotent: folding a sketch with itself changes nothing
    twice = hll_merge(merged, merged)
    assert sorted(map(tuple, twice.collect())) == sorted(
        map(tuple, merged.collect())
    )
    est = hll_estimate(merged, lgk=10).first()["approx_distinct"]
    assert abs(est - 7000) / 7000 < 0.15  # 4+ sigma at m=1024


def test_hll_small_range_linear_counting_is_tight(spark):
    from halvesting_geometric_spark.operators.sketch import approx_distinct

    df = spark.range(0, 500).selectExpr("concat('u', id % 25) AS k")
    est = approx_distinct(df, "k", lgk=12).first()["approx_distinct"]
    assert abs(est - 25) < 1.0


def test_hll_grouped_tracks_exact_per_group(spark):
    from halvesting_geometric_spark.operators.sketch import approx_distinct

    df = spark.range(0, 20000).selectExpr(
        "id % 4 AS g", "concat('v', id % (1000 * (1 + id % 4))) AS k"
    )
    exact = {
        r["g"]: r["d"]
        for r in df.groupBy("g")
        .agg(F.countDistinct("k").alias("d"))
        .collect()
    }
    got = {
        r["g"]: r["approx_distinct"]
        for r in approx_distinct(df, "k", group_cols=("g",), lgk=12).collect()
    }
    assert set(got) == set(exact)
    for g, e in exact.items():
        assert abs(got[g] - e) / e < 0.1


def test_hll_portable_matches_python_replica(spark):
    """The portable-hash register table is bit-reproducible outside Spark."""
    from halvesting_geometric_spark.operators.sketch import hll_sketch

    vals = [f"u{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = sorted(
        (r["reg"], r["rho"])
        for r in hll_sketch(df, "k", lgk=6, hash_method="portable").collect()
    )
    regs: dict[int, int] = {}
    for v in vals:
        h = _py_portable(v, 0)  # already 60-bit
        reg, w = h % 64, h >> 6
        rho = (60 - 6) + 1 - w.bit_length() if w else (60 - 6) + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == sorted(regs.items())


def test_hll_rejects_bad_lgk(spark):
    from halvesting_geometric_spark.operators.sketch import hll_sketch

    df = spark.range(1).selectExpr("'x' AS k")
    with pytest.raises(ValueError):
        hll_sketch(df, "k", lgk=3)
    with pytest.raises(ValueError):
        hll_sketch(df, "k", lgk=17)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_never_false_negative(spark):
    from halvesting_geometric_spark.operators.sketch import (
        bloom_probe,
        bloom_sketch,
    )

    present = spark.range(0, 500).selectExpr("concat('k', id) AS k")
    bloom = bloom_sketch(present, "k", m_bits=4096, k=3)
    probed = bloom_probe(present, "k", bloom, m_bits=4096, k=3)
    assert probed.filter("NOT maybe_present").count() == 0


def test_bloom_false_positive_rate_tracks_theory(spark):
    import math

    from halvesting_geometric_spark.operators.sketch import (
        bloom_probe,
        bloom_sketch,
    )

    m, k, n = 4096, 3, 500
    present = spark.range(0, n).selectExpr("concat('k', id) AS k")
    absent = spark.range(0, 2000).selectExpr("concat('absent', id) AS k")
    bloom = bloom_sketch(present, "k", m_bits=m, k=k)
    fp = (
        bloom_probe(absent, "k", bloom, m_bits=m, k=k)
        .filter("maybe_present")
        .count()
    )
    theory = (1.0 - math.exp(-k * n / m)) ** k  # ~0.029
    rate = fp / 2000
    assert rate < 3 * theory, (rate, theory)


def test_bloom_merge_equals_sketch_of_union(spark):
    from halvesting_geometric_spark.operators.sketch import (
        bloom_merge,
        bloom_sketch,
    )

    a = spark.range(0, 300).selectExpr("concat('k', id) AS k")
    b = spark.range(200, 600).selectExpr("concat('k', id) AS k")
    merged = bloom_merge(
        bloom_sketch(a, "k", m_bits=2048, k=3),
        bloom_sketch(b, "k", m_bits=2048, k=3),
    )
    whole = bloom_sketch(a.union(b), "k", m_bits=2048, k=3)
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in whole.collect()
    )


def test_bloom_grouped_membership_is_per_group(spark):
    from halvesting_geometric_spark.operators.sketch import (
        bloom_probe,
        bloom_sketch,
    )

    rows = [("a", "x1"), ("a", "x2"), ("b", "y1")]
    df = spark.createDataFrame(rows, "g string, k string")
    bloom = bloom_sketch(df, "k", group_cols=("g",), m_bits=1024, k=3)
    probe = spark.createDataFrame(
        [("a", "x1"), ("b", "x1"), ("b", "y1"), ("a", "y1")],
        "g string, k string",
    )
    got = {
        (r["g"], r["k"]): r["maybe_present"]
        for r in bloom_probe(
            probe, "k", bloom, m_bits=1024, k=3, group_cols=("g",)
        ).collect()
    }
    assert got[("a", "x1")] is True and got[("b", "y1")] is True
    assert got[("b", "x1")] is False and got[("a", "y1")] is False


def test_bloom_portable_positions_match_python(spark):
    from halvesting_geometric_spark.operators.sketch import bloom_sketch

    vals = [f"v{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = sorted(
        r["pos"]
        for r in bloom_sketch(
            df, "k", m_bits=512, k=2, hash_method="portable"
        ).collect()
    )
    want = sorted(
        {_py_portable(v, d) % 512 for v in vals for d in range(2)}
    )
    assert got == want


def test_stream_hll_folds_to_batch_sketch(spark, tmp_path):
    from halvesting_geometric_spark.operators.sketch import (
        hll_estimate,
        hll_sketch,
    )
    from halvesting_geometric_spark.streaming.sketch import (
        read_hll,
        stream_hll_available_now,
    )

    in_dir, hll_dir, ck_dir = (
        str(tmp_path / d) for d in ("in", "hll", "ck")
    )
    rows = [(i, f"user_{i % 40}") for i in range(200)]
    spark.createDataFrame(rows, "row_id long, u string").write.parquet(in_dir)
    stream_hll_available_now(
        spark, in_dir, hll_dir, ck_dir, "row_id long, u string", "u", lgk=8
    )
    want = sorted(
        map(tuple, hll_sketch(spark.read.parquet(in_dir), "u", lgk=8).collect())
    )
    assert sorted(map(tuple, read_hll(spark, hll_dir).collect())) == want

    # new files land; re-drain folds only the delta, registers stay exact
    rows2 = [(i, f"user_{i % 90}") for i in range(200, 450)]
    spark.createDataFrame(rows2, "row_id long, u string").write.mode(
        "append"
    ).parquet(in_dir)
    stream_hll_available_now(
        spark, in_dir, hll_dir, ck_dir, "row_id long, u string", "u", lgk=8
    )
    want2 = sorted(
        map(tuple, hll_sketch(spark.read.parquet(in_dir), "u", lgk=8).collect())
    )
    folded = read_hll(spark, hll_dir)
    assert sorted(map(tuple, folded.collect())) == want2
    est = hll_estimate(folded, lgk=8).first()["approx_distinct"]
    assert abs(est - 90) / 90 < 0.25


def test_stream_bloom_folds_to_batch_sketch(spark, tmp_path):
    from halvesting_geometric_spark.operators.sketch import (
        bloom_probe,
        bloom_sketch,
    )
    from halvesting_geometric_spark.streaming.sketch import (
        read_bloom,
        stream_bloom_available_now,
    )

    in_dir, bl_dir, ck_dir = (str(tmp_path / d) for d in ("in", "bl", "ck"))
    rows = [(i, f"key_{i}") for i in range(300)]
    spark.createDataFrame(rows, "row_id long, u string").write.parquet(in_dir)
    stream_bloom_available_now(
        spark, in_dir, bl_dir, ck_dir, "row_id long, u string", "u",
        m_bits=2048, k=3,
    )
    want = sorted(
        r["pos"]
        for r in bloom_sketch(
            spark.read.parquet(in_dir), "u", m_bits=2048, k=3
        ).collect()
    )
    assert sorted(r["pos"] for r in read_bloom(spark, bl_dir).collect()) == want

    # delta batch folds in; probe of the folded filter has no false negatives
    rows2 = [(i, f"key_{i}") for i in range(300, 500)]
    spark.createDataFrame(rows2, "row_id long, u string").write.mode(
        "append"
    ).parquet(in_dir)
    stream_bloom_available_now(
        spark, in_dir, bl_dir, ck_dir, "row_id long, u string", "u",
        m_bits=2048, k=3,
    )
    probe = spark.createDataFrame(
        [(f"key_{i}",) for i in range(500)], "u string"
    )
    hits = bloom_probe(
        probe, "u", read_bloom(spark, bl_dir), m_bits=2048, k=3
    )
    assert hits.filter("NOT maybe_present").count() == 0


def test_bloom_packed_probe_matches_sparse_probe(spark):
    from halvesting_geometric_spark.operators.sketch import (
        bloom_pack,
        bloom_probe,
        bloom_probe_packed,
        bloom_sketch,
    )

    present = spark.range(0, 400).selectExpr("concat('k', id) AS k")
    mixed = spark.range(0, 800).selectExpr("concat('k', id) AS k")
    bloom = bloom_sketch(present, "k", m_bits=4096, k=3)
    packed = bloom_pack(bloom)
    a = sorted(
        map(tuple, bloom_probe(mixed, "k", bloom, m_bits=4096, k=3).collect())
    )
    b = sorted(
        map(
            tuple,
            bloom_probe_packed(
                mixed, "k", packed, m_bits=4096, k=3
            ).collect(),
        )
    )
    assert a == b
    assert all(flag for key, flag in a if int(key[1:]) < 400)


def test_bloom_pack_word_arithmetic(spark):
    from halvesting_geometric_spark.operators.sketch import bloom_pack

    bloom = spark.createDataFrame(
        [(0,), (1,), (63,), (64,), (200,)], "pos long"
    )
    got = {r["word"]: r["bits"] for r in bloom_pack(bloom).collect()}

    def s64(x: int) -> int:  # the packed word is a SIGNED long bitset
        return x - (1 << 64) if x >= (1 << 63) else x

    assert got == {0: s64((1 << 0) | (1 << 1) | (1 << 63)), 1: 1, 3: 1 << 8}
