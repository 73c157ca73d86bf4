"""Real MJPEG-in-AVI video codec: pure-stdlib RIFF/AVI container walk with
per-frame baseline-JPEG decode, plus video_frame_stats / sample_frames
('stdlib' backend) over Spark.

The container layout is pinned against the public RIFF/AVI spec by hand
(header offsets, list nesting, idx1 convention, even-padding rule) so the
encoder and decoder are honest against the format, not merely against each
other; frame pixels are cross-checked against the standalone JPEG decoder
and against the closed-form constant-tile expectation derived from DCT
mathematics.
"""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.multimodal import (
    avi_mjpeg_bytes,
    decode_avi,
    decode_jpeg,
    jpeg_full_bytes,
    sample_frames,
    video_frame_stats,
)


def _tile_expected(width, height, seed):
    tx = np.arange(width // 8, dtype=np.int64)[None, :]
    ty = np.arange(height // 8, dtype=np.int64)[:, None]
    p = (tx * 7 + ty * 13 + seed) % 256
    v = np.clip(np.where(p % 2 == 0, p, np.where(p > 128, p + 1, p - 1)),
                0, 255)
    return np.kron(v, np.ones((8, 8), dtype=np.int64))


# ---------------------------------------------------------------- container


def test_riff_skeleton_pinned():
    """Top-level layout per the AVI spec: RIFF size 'AVI ', LIST hdrl
    whose first subchunk is the 56-byte avih, then LIST movi, then idx1."""
    b = avi_mjpeg_bytes(8, 8, 2, seed=3)
    assert b[:4] == b"RIFF"
    assert int.from_bytes(b[4:8], "little") == len(b) - 8
    assert b[8:12] == b"AVI "
    assert b[12:16] == b"LIST"
    hdrl_len = int.from_bytes(b[16:20], "little")
    assert b[20:24] == b"hdrl"
    assert b[24:28] == b"avih"
    assert int.from_bytes(b[28:32], "little") == 56
    after_hdrl = 20 + hdrl_len + (hdrl_len & 1)
    assert b[after_hdrl : after_hdrl + 4] == b"LIST"
    assert b[after_hdrl + 8 : after_hdrl + 12] == b"movi"
    assert b"idx1" in b


def test_avih_fields_pinned():
    b = avi_mjpeg_bytes(16, 24, 3, seed=0, fps=25)
    avih = b[32 : 32 + 56]  # body right after 'avih' + size at offset 24
    assert int.from_bytes(avih[0:4], "little") == 1_000_000 // 25
    assert int.from_bytes(avih[16:20], "little") == 3  # dwTotalFrames
    assert int.from_bytes(avih[24:28], "little") == 1  # dwStreams
    assert int.from_bytes(avih[32:36], "little") == 16  # dwWidth
    assert int.from_bytes(avih[36:40], "little") == 24  # dwHeight


def test_stream_headers_declare_mjpg():
    b = avi_mjpeg_bytes(8, 8, 1)
    i = b.find(b"strh")
    assert i > 0
    assert b[i + 8 : i + 12] == b"vids"
    assert b[i + 12 : i + 16] == b"MJPG"
    j = b.find(b"strf")
    # BITMAPINFOHEADER: biSize=40 then width/height; biCompression at +16
    assert int.from_bytes(b[j + 8 : j + 12], "little") == 40
    assert b[j + 8 + 16 : j + 8 + 20] == b"MJPG"


def test_movi_chunks_are_standalone_jpegs():
    b = avi_mjpeg_bytes(16, 8, 3, seed=9)
    frames, _ = decode_avi(b)
    pos = b.find(b"movi") + 4
    for f in range(3):
        assert b[pos : pos + 4] == b"00dc"
        clen = int.from_bytes(b[pos + 4 : pos + 8], "little")
        jpeg = b[pos + 8 : pos + 8 + clen]
        assert jpeg[:2] == b"\xff\xd8" and jpeg[-2:] == b"\xff\xd9"
        assert (decode_jpeg(jpeg) == frames[f]).all()
        pos += 8 + clen + (clen & 1)


def test_idx1_offsets_point_at_chunks():
    b = avi_mjpeg_bytes(8, 8, 2)
    movi_data = b.find(b"movi")  # offsets are from this fourcc
    i = b.find(b"idx1")
    n = int.from_bytes(b[i + 4 : i + 8], "little") // 16
    assert n == 2
    for k in range(n):
        e = b[i + 8 + 16 * k : i + 8 + 16 * (k + 1)]
        assert e[:4] == b"00dc"
        off = int.from_bytes(e[8:12], "little")
        ln = int.from_bytes(e[12:16], "little")
        assert b[movi_data + off : movi_data + off + 4] == b"00dc"
        assert int.from_bytes(
            b[movi_data + off + 4 : movi_data + off + 8], "little"
        ) == ln


# ------------------------------------------------------------------- decode


def test_roundtrip_matches_closed_form():
    b = avi_mjpeg_bytes(24, 16, 4, seed=11, fps=5)
    frames, meta = decode_avi(b)
    assert meta == {
        "usec_per_frame": 200000, "n_frames": 4, "width": 24, "height": 16,
    }
    assert len(frames) == 4
    for f, px in enumerate(frames):
        assert px.shape == (16, 24, 1)
        want = _tile_expected(24, 16, 11 + 17 * f)
        assert (px[:, :, 0].astype(np.int64) == want).all()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi(b"nope")
    with pytest.raises(ValueError, match="not AVI"):
        decode_avi(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")


def test_decode_rejects_truncation_and_lies():
    b = bytearray(avi_mjpeg_bytes(8, 8, 2, seed=1))
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(bytes(b[:-10]))
    # header declares 2 frames; drop idx1 AND one movi chunk → mismatch
    full = bytes(b)
    movi = full.find(b"movi")
    first_len = int.from_bytes(full[movi + 8 : movi + 12], "little")
    one = full[: movi + 4 + 8 + first_len + (first_len & 1)]
    # rebuild: RIFF[ AVI hdrl LIST(movi with 1 chunk) ] with sizes fixed
    hdr_end = full.find(b"LIST", 12)
    hdrl_len = int.from_bytes(full[hdr_end + 4 : hdr_end + 8], "little")
    movi_start = hdr_end + 8 + hdrl_len + (hdrl_len & 1)
    movi_body = one[movi_start + 8 :]
    rebuilt_movi = (
        b"LIST" + len(movi_body).to_bytes(4, "little") + movi_body
    )
    body = b"AVI " + full[12:movi_start] + rebuilt_movi
    lied = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(ValueError, match="declares 2 frames"):
        decode_avi(lied)


def test_decode_rejects_non_mjpg_stream():
    b = bytearray(avi_mjpeg_bytes(8, 8, 1))
    i = b.find(b"strh")
    b[i + 12 : i + 16] = b"H264"
    with pytest.raises(ValueError, match="only MJPG"):
        decode_avi(bytes(b))


def test_encoder_rejects_empty_video():
    with pytest.raises(ValueError, match="at least one frame"):
        avi_mjpeg_bytes(8, 8, 0)


def test_every_frame_differs_with_17_seed_step():
    frames, _ = decode_avi(avi_mjpeg_bytes(16, 16, 3, seed=2))
    assert not (frames[0] == frames[1]).all()
    ref = decode_jpeg(jpeg_full_bytes(16, 16, 2 + 17 * 2))
    assert (frames[2] == ref).all()


# -------------------------------------------------------------------- spark


def _media_df(spark, specs):
    rows = [
        (mid, avi_mjpeg_bytes(w, h, nf, seed=s, fps=fps))
        for mid, w, h, nf, s, fps in specs
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_video_frame_stats_matches_closed_form(spark):
    specs = [(1, 16, 8, 3, 4, 10), (2, 8, 24, 2, 30, 25)]
    df = _media_df(spark, specs)
    out = {
        (r.media_id, r.frame_idx): r
        for r in video_frame_stats(df).collect()
    }
    assert len(out) == 5
    for mid, w, h, nf, s, fps in specs:
        for f in range(nf):
            r = out[(mid, f)]
            want = _tile_expected(w, h, s + 17 * f)
            assert (r.width, r.height, r.n_frames) == (w, h, nf)
            assert r.fps_e3 == 1_000_000_000 // (1_000_000 // fps)
            assert r.pixel_sum == int(want.sum())
            assert r.pixel_min == int(want.min())
            assert r.pixel_max == int(want.max())
            pos = (np.arange(w)[None, :] + np.arange(h)[:, None] * w)
            assert r.pos_sum == int((pos * want).sum())


def test_sample_frames_stdlib_decodes_real_pixels(spark):
    rows = [(7, "video", avi_mjpeg_bytes(8, 8, 4, seed=6, fps=10))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    # fps=10 → 100ms/frame; every_ms=200 → stride 2 → frames 0 and 2
    got = {
        r.frame_idx: r.frame_hash
        for r in sample_frames(df, every_ms=200, decode_backend="stdlib").collect()
    }
    assert set(got) == {0, 2}
    for f in (0, 2):
        assert got[f] == int(_tile_expected(8, 8, 6 + 17 * f).sum())


def test_sample_frames_backend_dispatch(spark):
    df = spark.createDataFrame(
        [(1, "video", b"")], "media_id long, kind string, payload binary"
    )
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(df, decode_backend="ffmpeg")
    with pytest.raises(ValueError, match="unknown decode_backend"):
        sample_frames(df, decode_backend="webm")
