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
