"""Media analysis over real decodes: ViT patchify, video frame
differencing, integer audio autocorrelation + pitch.

Every assertion here is against hand-computed or closed-form ground truth
independent of the codecs (tile DC closed form, explicit numpy reference
arrays, brute-force python autocorrelation), so the operators are honest
against the math, not against themselves.
"""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.media_analysis import (
    audio_autocorr,
    frame_diff_stats,
    patchify,
    pitch_estimate,
)
from halvesting_geometric_spark.operators.multimodal import (
    avi_mjpeg_bytes,
    encode_png,
    jpeg_full_bytes,
    wav_full_bytes,
)


def _tile_v(tx, ty, s):
    p = (tx * 7 + ty * 13 + s) % 256
    v = p if p % 2 == 0 else (p + 1 if p > 128 else p - 1)
    return max(0, min(255, v))


# ------------------------------------------------------------------ patchify


def test_patchify_png_hand_computed(spark):
    # 4x4 grayscale, patch=2: four patches with known sums
    px = np.array(
        [[0, 1, 2, 3],
         [4, 5, 6, 7],
         [8, 9, 10, 11],
         [12, 13, 14, 15]], dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, encode_png(px))], "media_id long, payload binary"
    )
    got = {(r.py, r.px): r for r in patchify(df, patch=2).collect()}
    assert set(got) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert got[(0, 0)].patch_sum == 0 + 1 + 4 + 5
    assert got[(1, 1)].patch_sum == 10 + 11 + 14 + 15
    assert got[(0, 1)].patch_min == 2 and got[(0, 1)].patch_max == 7
    # mean_e6 round-half-up: (10*1e6 + 2) // 4
    assert got[(0, 0)].mean_e6 == (10 * 1_000_000 + 2) // 4


def test_patchify_jpeg_quads_match_closed_form(spark):
    w, h, s = 32, 32, 21
    df = spark.createDataFrame(
        [(9, jpeg_full_bytes(w, h, s))], "media_id long, payload binary"
    )
    got = {(r.py, r.px): r for r in patchify(df, patch=16).collect()}
    assert len(got) == 4
    for gy in range(2):
        for gx in range(2):
            vs = [_tile_v(2 * gx + dx, 2 * gy + dy, s)
                  for dx in (0, 1) for dy in (0, 1)]
            r = got[(gy, gx)]
            assert r.patch_sum == 64 * sum(vs)
            assert r.patch_min == min(vs) and r.patch_max == max(vs)


def test_patchify_rejects_misaligned_dims(spark):
    df = spark.createDataFrame(
        [(1, encode_png(np.zeros((6, 6), np.uint8)))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="not multiples"):
        patchify(df, patch=4).collect()


# ------------------------------------------------------------------- frames


def test_frame_diff_stats_closed_form(spark):
    w, h, nf, s = 16, 8, 3, 5
    df = spark.createDataFrame(
        [(3, avi_mjpeg_bytes(w, h, nf, seed=s))],
        "media_id long, payload binary",
    )
    got = {r.frame_idx: r for r in frame_diff_stats(df).collect()}
    assert set(got) == {1, 2}
    for f in (1, 2):
        diffs = [
            abs(_tile_v(tx, ty, s + 17 * f) - _tile_v(tx, ty, s + 17 * (f - 1)))
            for ty in range(h // 8) for tx in range(w // 8)
        ]
        assert got[f].diff_sum == 64 * sum(diffs)
        assert got[f].changed_px == 64 * sum(d != 0 for d in diffs)
        assert got[f].max_px_diff == max(diffs)


def test_frame_diff_identical_frames_zero(spark):
    # seed arithmetic is mod 256: a 256/17-periodic collision is impossible
    # inside one video, so build identity by re-muxing the same frame twice
    from halvesting_geometric_spark.operators.multimodal import (
        _riff_chunk, _riff_list, jpeg_full_bytes as jfb,
    )
    fr = jfb(8, 8, 4)
    avih = _riff_chunk(
        b"avih",
        (100000).to_bytes(4, "little") + b"\x00" * 12
        + (2).to_bytes(4, "little") + b"\x00" * 4
        + (1).to_bytes(4, "little") + b"\x00" * 4
        + (8).to_bytes(4, "little") + (8).to_bytes(4, "little")
        + b"\x00" * 16,
    )
    strh = _riff_chunk(b"strh", b"vids" + b"MJPG" + b"\x00" * 48)
    strf = _riff_chunk(b"strf", (40).to_bytes(4, "little") + b"\x00" * 36)
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi = _riff_list(b"movi", _riff_chunk(b"00dc", fr) * 2)
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    r = frame_diff_stats(df).first()
    assert (r.diff_sum, r.changed_px, r.max_px_diff) == (0, 0, 0)


# -------------------------------------------------------------------- audio


def _wave(t, c, seed):
    return ((t * 37 + c * 1009 + seed * 131) % 4001) - 2000


def test_audio_autocorr_bruteforce(spark):
    ch, n, s = 2, 64, 7
    df = spark.createDataFrame(
        [(4, wav_full_bytes(ch, 8000, n, s))], "media_id long, payload binary"
    )
    got = {r.lag: r.r for r in audio_autocorr(df, max_lag=5).collect()}
    assert set(got) == set(range(6))
    for k in range(6):
        want = sum(
            _wave(t, c, s) * _wave(t + k, c, s)
            for t in range(n - k) for c in range(ch)
        )
        assert got[k] == want, k


def test_pitch_estimate_finds_planted_period(spark):
    # build a perfectly periodic PCM16 signal with period 4 via raw WAV
    import struct
    vals = [1000, -1000, 500, -500] * 32
    data = b"".join(struct.pack("<h", v) for v in vals)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
        + (16000).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    df = spark.createDataFrame([(8, wav)], "media_id long, payload binary")
    r = pitch_estimate(df, max_lag=6).first()
    assert r.pitch_lag == 4
    assert r.r0 == sum(v * v for v in vals)
    assert r.r_peak == sum(
        vals[t] * vals[t + 4] for t in range(len(vals) - 4)
    )


def test_pitch_tie_breaks_to_smallest_lag(spark):
    # constant signal: R(k) strictly decreases with k... use all-equal
    # values so R(k) = (n-k)*v^2 → max at k=1 among lags >= 1
    df = spark.createDataFrame(
        [(2, wav_full_bytes(1, 8000, 32, 0))], "media_id long, payload binary"
    )
    rows = {r.lag: r.r for r in audio_autocorr(df, max_lag=3).collect()}
    best = pitch_estimate(df, max_lag=3).first()
    want_lag = max(
        (k for k in range(1, 4)), key=lambda k: (rows[k], -k)
    )
    assert best.pitch_lag == want_lag and best.r_peak == rows[want_lag]
