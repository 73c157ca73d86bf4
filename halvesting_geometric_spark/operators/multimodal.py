"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested. *Pixel/sample decode* is stubbed behind
``decode_backend`` because no codec libraries exist in this container —
``deterministic_fake`` produces seeded pseudo-decodes so downstream operators
(resize bookkeeping, feature extraction, frame sampling) have stable, testable
outputs, and ``pillow``/``ffmpeg`` backends raise ``NotImplementedError`` with
the exact integration point documented.

*Header metadata* is NOT stubbed: :func:`parse_media_meta` reads real
PNG / JPEG / GIF container bytes (signatures, IHDR, SOFn markers, logical
screen descriptor — all public file-format knowledge, no codec needed)
inside an Arrow-batched ``mapInPandas`` kernel, so ``format/width/height``
come from the payload itself. :func:`png_bytes` / :func:`jpeg_bytes` /
:func:`gif_bytes` build real minimal containers for fixtures and the
correctness gate (the gate synthesizes payloads from table arithmetic,
parses them back with the real kernel, and the oracle checks the parser
inverts the generator byte-exactly).
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


IMAGE_META_SCHEMA = "media_id long, format string, width long, height long"

# JPEG start-of-frame markers that carry dimensions (C0-CF minus C4/C8/CC,
# which are DHT/JPG/DAC)
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}
# standalone markers with no length field
_JPEG_BARE = frozenset({0x01, 0xD8}) | frozenset(range(0xD0, 0xD8))


def parse_image_header(p: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from real container header bytes.

    Pure byte slicing over public file formats — no codec library:
    PNG signature + IHDR (big-endian u32 at offsets 16/20), JPEG marker
    scan to the first SOFn (big-endian u16 height/width), GIF logical
    screen descriptor (little-endian u16 at offsets 6/8). Unknown or
    truncated payloads give (None, None, None); a JPEG whose SOF is
    missing/truncated still identifies as 'jpeg' with null dimensions.
    """
    if not p:
        return (None, None, None)
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        if len(p) >= 24 and p[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"),
            )
        return ("png", None, None)
    if p[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(p) and p[i] == 0xFF:
            marker = p[i + 1]
            if marker in _JPEG_BARE:
                i += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                break
            seglen = int.from_bytes(p[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                if i + 9 <= len(p):
                    return (
                        "jpeg",
                        int.from_bytes(p[i + 7 : i + 9], "big"),
                        int.from_bytes(p[i + 5 : i + 7], "big"),
                    )
                break
            if seglen < 2:
                break
            i += 2 + seglen
        return ("jpeg", None, None)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        if len(p) >= 10:
            return (
                "gif",
                int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"),
            )
        return ("gif", None, None)
    return (None, None, None)


def parse_media_meta(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Real header metadata per item: (media_id, format, width, height).

    Arrow-batched ``mapInPandas`` over the binary column; the per-item step
    is :func:`parse_image_header` (byte slicing — the irreducible per-item
    work of container parsing, same slot a codec would fill). Narrow op:
    no shuffle, upstream partitioning preserved.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [t[0] for t in parsed],
                    "width": pd.array(
                        [t[1] for t in parsed], dtype="Int64"
                    ),
                    "height": pd.array(
                        [t[2] for t in parsed], dtype="Int64"
                    ),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "media_id long, format string, channels long, sample_rate_hz long, "
    "duration_ms long"
)


def parse_audio_header(
    p: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None]:
    """(format, channels, sample_rate_hz, duration_ms) from real RIFF/WAVE
    container bytes — chunk walk over the public WAV layout, no codec.

    Duration is exact integer arithmetic: ``data_bytes * 1000 //
    byte_rate``. Non-RIFF payloads give all-None; a WAV missing fmt/data
    chunks identifies as 'wav' with null fields.
    """
    if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return (None, None, None, None)
    channels = rate = byte_rate = data_size = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(p):
            channels = int.from_bytes(p[i + 10 : i + 12], "little")
            rate = int.from_bytes(p[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(p[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    dur = (
        data_size * 1000 // byte_rate
        if data_size is not None and byte_rate
        else None
    )
    return ("wav", channels, rate, dur)


def parse_audio_meta(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Real audio header metadata per item (Arrow-batched mapInPandas over
    the binary column; narrow op, partitioning preserved)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_audio_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [t[0] for t in parsed],
                    "channels": pd.array([t[1] for t in parsed], dtype="Int64"),
                    "sample_rate_hz": pd.array(
                        [t[2] for t in parsed], dtype="Int64"
                    ),
                    "duration_ms": pd.array(
                        [t[3] for t in parsed], dtype="Int64"
                    ),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = "media_id long, format string, duration_ms long"


def parse_video_header(p: bytes | None) -> tuple[str | None, int | None]:
    """(format, duration_ms) from real ISO BMFF (MP4) bytes: walk the
    top-level boxes to ``moov``, then its children to ``mvhd`` (version-0:
    timescale and duration as big-endian u32 at payload offsets 12/16).
    Exact integer duration ``duration * 1000 // timescale``. Non-BMFF
    payloads give (None, None); an MP4 without a readable mvhd identifies
    as 'mp4' with null duration."""
    if not p or len(p) < 8:
        return (None, None)
    if p[4:8] not in (b"ftyp", b"moov", b"mdat", b"free", b"styp"):
        return (None, None)

    def walk(lo: int, hi: int, target: bytes) -> tuple[int, int] | None:
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(p[i : i + 4], "big")
            if size < 8:
                return None
            if p[i + 4 : i + 8] == target:
                return (i + 8, min(i + size, hi))
            i += size
        return None

    moov = walk(0, len(p), b"moov")
    if moov is None:
        return ("mp4", None)
    mvhd = walk(moov[0], moov[1], b"mvhd")
    if mvhd is None or mvhd[0] + 20 > len(p) or p[mvhd[0]] != 0:
        return ("mp4", None)  # version-1 (64-bit) not emitted by our builder
    timescale = int.from_bytes(p[mvhd[0] + 12 : mvhd[0] + 16], "big")
    duration = int.from_bytes(p[mvhd[0] + 16 : mvhd[0] + 20], "big")
    if not timescale:
        return ("mp4", None)
    return ("mp4", duration * 1000 // timescale)


def parse_video_meta(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Real video container metadata per item (Arrow-batched mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_video_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [t[0] for t in parsed],
                    "duration_ms": pd.array(
                        [t[1] for t in parsed], dtype="Int64"
                    ),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=VIDEO_META_SCHEMA)


def mp4_bytes(timescale: int, duration: int) -> bytes:
    """Minimal real ISO BMFF container: ftyp + moov(mvhd v0)."""
    # ISO BMFF box size includes the 8-byte (size, type) header
    ftyp_payload = b"isom" + (0).to_bytes(4, "big") + b"isom"
    ftyp = (8 + len(ftyp_payload)).to_bytes(4, "big") + b"ftyp" + ftyp_payload
    mvhd_payload = (
        bytes(4)  # version 0 + flags
        + bytes(8)  # ctime, mtime
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + bytes(80)  # rate/volume/matrix/predefined/next_track
    )
    mvhd = (8 + len(mvhd_payload)).to_bytes(4, "big") + b"mvhd" + mvhd_payload
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp + moov


def wav_bytes(
    channels: int, sample_rate: int, n_samples: int, bits: int = 16
) -> bytes:
    """Minimal real RIFF/WAVE container: fmt chunk + silent data chunk."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    # header-only container: declare the data size without carrying the
    # (silent) samples — the parser reads sizes, not samples
    data = b"data" + data_size.to_bytes(4, "little")
    body = b"WAVE" + fmt + data
    return b"RIFF" + (len(body) + data_size).to_bytes(4, "little") + body


def png_bytes(width: int, height: int) -> bytes:
    """Minimal real PNG container: signature + IHDR (dims live here) +
    placeholder CRC. Parses with any PNG reader's header stage."""
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes(
        [8, 6, 0, 0, 0]
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )


def jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal real JPEG: SOI + JFIF APP0 + SOF0 (dims live here) + EOI."""
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0\x00\x11\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_bytes(width: int, height: int) -> bytes:
    """Minimal real GIF89a: header + logical screen descriptor + trailer."""
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\xf7\x00\x00;"
    )


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
    """Seeded synthetic media table (binary payloads) for tests.

    Image payloads are REAL minimal containers (PNG/JPEG/GIF rotating by
    item) whose header dimensions equal the declared ``meta`` — so
    :func:`parse_media_meta` on the fixture must reproduce ``meta``
    exactly. Audio/video payloads stay opaque random bytes (their decode
    is the stubbed codec slot)."""
    rng = np.random.default_rng(seed)
    builders = [("png", png_bytes), ("jpeg", jpeg_bytes), ("gif", gif_bytes)]
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            fmt, build = builders[(i // 3) % 3]
            w = int(rng.integers(16, 512))
            h = int(rng.integers(16, 512))
            payload = build(w, h)
            meta = {"format": fmt, "width": w, "height": h, "duration_ms": None}
        elif kind == "audio":
            ch = int(rng.integers(1, 3))
            rate = int(rng.choice([8000, 16000, 44100]))
            n_samp = int(rng.integers(1000, 50000))
            payload = wav_bytes(ch, rate, n_samp)
            meta = {
                "format": "wav",
                "width": None,
                "height": None,
                "duration_ms": n_samp * 1000 // rate,
            }
        else:
            timescale = int(rng.choice([600, 1000, 90000]))
            dur_ms = int(rng.integers(500, 5000))
            payload = mp4_bytes(timescale, dur_ms * timescale // 1000)
            meta = {
                "format": "mp4",
                "width": None,
                "height": None,
                # what the container's mvhd actually encodes (floor twice)
                "duration_ms": (dur_ms * timescale // 1000) * 1000 // timescale,
            }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
