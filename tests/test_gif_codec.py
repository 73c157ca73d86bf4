"""Real GIF codec: pure-stdlib LZW encode/decode roundtrip (variable code
width, clear/EOI, dictionary growth + full-table reset, palette mapping) +
gif_pixel_stats operator. The tiny-image cases pin the EXACT spec-derived
byte stream by hand so encoder and decoder are each checked against the GIF
LZW spec independently, not merely against each other."""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif,
    gif_full_bytes,
    gif_pixel_stats,
    parse_image_header,
)


def _expected(width, height, seed, palette_bits=3):
    p = 1 << palette_bits
    idx = np.array(
        [[(x * 7 + y * 13 + seed) % p for x in range(width)]
         for y in range(height)]
    )
    pal = np.array(
        [[(i * 37 + seed) % 256, (i * 59 + 2 * seed) % 256,
          (i * 83 + 3 * seed) % 256] for i in range(p)],
        dtype=np.uint8,
    )
    return pal[idx]


# --- hand-derived spec cases ------------------------------------------------
# Pixels [0, 1, 2, 3], min code size 2: clear=4, EOI=5, first free code 6.
# Encoder emits CLEAR(4), 0, 1, 2 at 3 bits; adding the third table entry
# assigns value 8 == 1<<3, so the width bumps to 4 bits for the remaining
# codes 3 and EOI(5). LSB-first packing of
# (4,3b)(0,3b)(1,3b)(2,3b)(3,4b)(5,4b) gives bytes 44 34 05.
_HAND_LZW = b"\x44\x34\x05"


def test_lzw_encoder_matches_hand_derived_spec_bytes():
    assert _gif_lzw_encode(np.array([0, 1, 2, 3]), 2) == _HAND_LZW


def test_lzw_decoder_matches_hand_derived_spec_bytes():
    assert _gif_lzw_decode(_HAND_LZW, 2, 4).tolist() == [0, 1, 2, 3]


def test_decode_gif_hand_built_container():
    # Full GIF built byte-by-byte from the spec (no encoder involved),
    # including a graphic-control extension the decoder must skip.
    pal = b"".join(bytes([10 * i, 20 * i, 30 * i]) for i in range(4))
    payload = (
        b"GIF89a"
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x80 | 0x70 | 0x01, 0, 0])  # GCT, 4 entries
        + pal
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # graphic control extension
        + b"\x2c" + bytes(4)  # image at (0,0)
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + b"\x00"  # no LCT, no interlace
        + b"\x02"  # LZW min code size
        + bytes([len(_HAND_LZW)]) + _HAND_LZW + b"\x00"
        + b"\x3b"
    )
    px = decode_gif(payload)
    assert px.shape == (2, 2, 3)
    expected = np.array(
        [[[0, 0, 0], [10, 20, 30]], [[20, 40, 60], [30, 60, 90]]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, expected)


# --- roundtrips --------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,seed,bits",
    [(1, 1, 0, 3), (8, 8, 5, 3), (31, 17, 11, 3), (9, 30, 2, 1),
     (16, 16, 7, 8), (255, 3, 1, 2)],
)
def test_roundtrip_shapes_and_palettes(w, h, seed, bits):
    px = decode_gif(gif_full_bytes(w, h, seed=seed, palette_bits=bits))
    assert px.shape == (h, w, 3)
    assert np.array_equal(px, _expected(w, h, seed, bits))


def test_header_parser_reads_full_gif():
    assert parse_image_header(gif_full_bytes(33, 21, seed=1)) == (
        "gif", 33, 21,
    )


def test_lzw_roundtrip_forces_full_table_reset():
    # 256-symbol pseudo-random stream long enough that the dictionary hits
    # the 4096-entry ceiling several times, exercising the clear/reset path
    # on both sides.
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 256, size=60_000, dtype=np.int64)
    data = _gif_lzw_encode(idx, 8)
    out = _gif_lzw_decode(data, 8, idx.size)
    assert np.array_equal(out, idx)
    # sanity: stream really was long enough to overflow one 12-bit table
    assert idx.size > 4096


def test_lzw_final_code_width_bump_before_eoi():
    # Regression: when the decoder's dictionary reaches exactly 1 << width
    # while processing the FINAL data code (the decoder appends an entry for
    # every code, even though the encoder adds none after its loop ends),
    # the decoder bumps the code width before reading EOI — the encoder must
    # write EOI at the bumped width. The 64x48 gradient image hit this:
    # its 249th (last) code grew the decoder table to 256 == 1 << 8.
    px = decode_gif(gif_full_bytes(64, 48, seed=0))
    assert np.array_equal(px, _expected(64, 48, 0))
    # raw-codec fuzz across lengths straddling power-of-two table sizes
    rng = np.random.default_rng(1)
    for _ in range(40):
        mcs = int(rng.integers(2, 9))
        ln = int(rng.integers(200, 5000))
        idx = rng.integers(0, 1 << mcs, size=ln, dtype=np.int64)
        out = _gif_lzw_decode(_gif_lzw_encode(idx, mcs), mcs, ln)
        assert np.array_equal(out, idx)


def test_lzw_roundtrip_repetitive_stream():
    # highly compressible input drives deep dictionary phrases (cScSc hits)
    idx = np.tile(np.array([0, 0, 1, 0, 0, 1, 1]), 3000)
    data = _gif_lzw_decode(_gif_lzw_encode(idx, 2), 2, idx.size)
    assert np.array_equal(data, idx)


# --- error paths --------------------------------------------------------------


def test_decode_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\nrest")


def test_decode_rejects_interlaced():
    payload = bytearray(gif_full_bytes(4, 4))
    # image descriptor starts right after 13-byte header + 24-byte GCT
    assert payload[13 + 24] == 0x2C
    payload[13 + 24 + 9] |= 0x40  # set interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(payload))


def test_decode_rejects_truncated_stream():
    good = gif_full_bytes(16, 16, seed=3)
    # drop the trailer AND the last data bytes: LZW ends before EOI
    with pytest.raises(ValueError):
        decode_gif(good[:-6] + b"\x00\x3b")


def test_decode_rejects_wrong_pixel_count():
    with pytest.raises(ValueError, match="expected"):
        _gif_lzw_decode(_HAND_LZW, 2, 5)


# --- operator ----------------------------------------------------------------


def test_gif_pixel_stats_matches_closed_form(spark):
    rows = [(i, gif_full_bytes(6 + i, 5 + 2 * i, seed=i)) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in gif_pixel_stats(df).collect()}
    for i in range(4):
        px = _expected(6 + i, 5 + 2 * i, i).astype(np.int64)
        h, w, _ = px.shape
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["palette_size"] == 8
        assert r["n_px"] == w * h
        assert r["pixel_sum"] == int(px.sum())
        assert r["pixel_min"] == int(px.min())
        assert r["pixel_max"] == int(px.max())
        pos = (
            np.arange(w, dtype=np.int64)[None, :]
            + np.arange(h, dtype=np.int64)[:, None] * w
        )
        assert r["pos_sum"] == int((pos * px.sum(axis=2)).sum())
        nv = int(px.size)
        assert r["mean_e6"] == (int(px.sum()) * 1_000_000 + nv // 2) // nv
