"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested; the actual codec work is stubbed behind
``decode_backend`` because no image/audio libraries exist in this container —
``deterministic_fake`` produces seeded pseudo-decodes so downstream operators
(resize bookkeeping, feature extraction, frame sampling) have stable, testable
outputs, and ``pillow``/``ffmpeg`` backends raise ``NotImplementedError`` with
the exact integration point documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, feat array<float>"
)
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_hash long"


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: payload bytes → pseudo-pixel array.

    Real integration point: replace with PIL.Image.open(BytesIO(payload)).
    """
    if payload is None or len(payload) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    rng = np.random.default_rng(int(arr[:8].sum()))
    return rng.standard_normal(8).astype(np.float32)


def extract_features(
    media: DataFrame, decode_backend: str = "deterministic_fake"
) -> DataFrame:
    """Per-item feature vectors via mapInPandas (Arrow-batched binary).

    Batch shape: payload arrives as a pandas Series of ``bytes``; output one
    row per input row. Partitioning is preserved (narrow op) — co-locate by
    upstream key before calling if a later join needs it.
    """
    if decode_backend == "pillow":
        raise NotImplementedError(
            "pillow backend: swap _fake_decode for PIL.Image.open; "
            "container lacks the library (marked stub by design)"
        )
    if decode_backend != "deterministic_fake":
        raise ValueError(f"unknown decode_backend {decode_backend!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        0 if p is None else len(p) for p in pdf["payload"]
                    ],
                    "feat": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode_backend: str = "deterministic_fake"
) -> DataFrame:
    """Video frame sampling: one row per sampled frame (hash stands in for
    pixels). Frame count derives from meta.duration_ms — pure plumbing; the
    real decoder slot is the same mapInPandas body.

    Frame expansion is fully vectorized (repeat + cumsum-arange, splitmix64
    frame hash over uint64 arrays); the only per-item step is the codec slot
    itself, which a real backend replaces wholesale."""
    if decode_backend != "deterministic_fake":
        raise NotImplementedError("only the deterministic_fake backend exists here")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = np.maximum(
                pdf["duration_ms"].fillna(0).to_numpy(dtype=np.int64) // every_ms,
                0,
            )
            total = int(n.sum())
            if total == 0:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(dtype=np.int64),
                        "frame_idx": pd.Series(dtype=np.int32),
                        "frame_hash": pd.Series(dtype=np.int64),
                    }
                )
                continue
            # the codec slot — per item by nature; real backends batch inside
            base = np.array(
                [float(_fake_decode(p)[:4].sum()) for p in pdf["payload"]],
                dtype=np.float64,
            )
            ids = np.repeat(pdf["media_id"].to_numpy(dtype=np.int64), n)
            ends = np.cumsum(n)
            idx = (np.arange(total, dtype=np.int64)
                   - np.repeat(ends - n, n)).astype(np.int32)
            # splitmix64 mix of (base bits, frame_idx) — deterministic across
            # processes (unlike Python hash()), no per-frame Python
            x = (np.repeat(base.view(np.uint64), n)
                 + idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idx,
                    "frame_hash": (x & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(
                        np.int64
                    ),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"), "payload")
        .mapInPandas(run, schema=FRAMES_SCHEMA)
    )


def generate_media_fixture(spark, n: int = 50, seed: int = 5) -> DataFrame:
    """Seeded synthetic media table (binary payloads) for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(16, 256))).tolist())
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                    "width": int(rng.integers(16, 512)) if kind == "image" else None,
                    "height": int(rng.integers(16, 512)) if kind == "image" else None,
                    "duration_ms": int(rng.integers(500, 5000))
                    if kind == "video"
                    else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
