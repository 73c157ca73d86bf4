"""Pure-stdlib WAV PCM16 codec: encoder/decoder round-trip, closed-form
sample values, malformed-payload rejection, and the Spark-side audio_stats
kernel against a numpy recomputation."""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.multimodal import (
    audio_stats,
    decode_wav,
    wav_bytes,
    wav_full_bytes,
)


def _expected(channels, n_samples, seed):
    t = np.arange(n_samples, dtype=np.int64)[:, None]
    c = np.arange(channels, dtype=np.int64)[None, :]
    return (t * 37 + c * 1009 + seed * 131) % 4001 - 2000


@pytest.mark.parametrize("channels,n,seed", [(1, 1, 0), (1, 97, 3), (2, 200, 11), (4, 33, 255)])
def test_roundtrip_matches_closed_form(channels, n, seed):
    v, rate = decode_wav(wav_full_bytes(channels, 16000, n, seed))
    assert rate == 16000
    assert v.shape == (n, channels)
    assert (v.astype(np.int64) == _expected(channels, n, seed)).all()


def test_decoder_reads_header_only_fixture_as_empty_error():
    # wav_bytes declares a data size but carries no samples -> truncated
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_wav(wav_bytes(2, 8000, 100))


def test_decode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFF" + b"\x04\x00\x00\x00" + b"AVI ")
    good = bytearray(wav_full_bytes(1, 8000, 4, 1))
    good[20] = 3  # codec id -> IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(good))


def test_encoder_validates_channels():
    with pytest.raises(ValueError, match="channels"):
        wav_full_bytes(0, 8000, 10)


def test_zero_frame_clip_decodes_empty():
    v, rate = decode_wav(wav_full_bytes(2, 8000, 0, 5))
    assert v.shape == (0, 2) and rate == 8000


def test_audio_stats_matches_numpy(spark):
    rows = [(i, wav_full_bytes(1 + i % 2, 8000 + i * 1000, 60 + i * 13, i)) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in audio_stats(df).collect()}
    for i in range(6):
        v = _expected(1 + i % 2, 60 + i * 13, i)
        neg = v[:, 0] < 0
        r = got[i]
        assert r["channels"] == 1 + i % 2
        assert r["sample_rate_hz"] == 8000 + i * 1000
        assert r["n_samples"] == 60 + i * 13
        assert r["sample_sum"] == int(v.sum())
        assert r["sample_min"] == int(v.min())
        assert r["sample_max"] == int(v.max())
        assert r["energy"] == int((v * v).sum())
        assert r["zero_crossings"] == int(np.count_nonzero(neg[1:] != neg[:-1]))
