"""Real baseline JPEG codec: pure-stdlib encode/decode (marker walk,
declared-table canonical Huffman, byte stuffing, DC prediction, run/size AC,
uniform quantization, orthonormal DCT/IDCT, YCbCr) + jpeg_pixel_stats.

Three independent anchors keep encoder and decoder honest against the spec
rather than merely against each other: (1) the canonical Huffman code
values are pinned to the T.81 construction by hand, (2) a single-tile
image's ENTIRE entropy segment is pinned to hand-derived bytes (MSB-first
bit order, category coding, EOB, 1-padding), (3) the constant-tile fixture
decodes to a closed form derived from DCT mathematics, not from the codec.
"""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.multimodal import (
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    _jpeg_huff_codes,
    _jpeg_zigzag,
    decode_jpeg,
    encode_jpeg,
    jpeg_full_bytes,
    jpeg_pixel_stats,
    parse_image_header,
)


def _tile_expected(width, height, seed):
    tx = np.arange(width // 8, dtype=np.int64)[None, :]
    ty = np.arange(height // 8, dtype=np.int64)[:, None]
    p = (tx * 7 + ty * 13 + seed) % 256
    # constant block ⇒ DC-only DCT ⇒ decoded = clamp(2·round((p−128)/2)+128):
    # p when even, p+1 when odd above 128, p−1 when odd below
    v = np.clip(np.where(p % 2 == 0, p, np.where(p > 128, p + 1, p - 1)),
                0, 255)
    return np.kron(v, np.ones((8, 8), dtype=np.int64))


# --- spec anchors -------------------------------------------------------------


def test_canonical_huffman_construction_matches_spec():
    dc = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    # 12 categories at length 4: canonical codes are simply 0..11
    assert dc == {i: (i, 4) for i in range(12)}
    ac = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    assert ac[0x00] == (0, 9)  # first 9-bit code
    assert ac[0xFE] == (254, 9)  # last 9-bit code
    assert ac[0xFF] == (510, 10)  # (254+1) << 1 per T.81 C.2
    # all-ones codes remain unassigned (reserved)
    assert (0b1111, 4) not in {v for v in dc.values()}
    assert (0b1111111111, 10) not in {v for v in ac.values()}


def test_zigzag_order_spec_prefix():
    zz = _jpeg_zigzag()
    # the first diagonals of the standard scan, in (row·8 + col) indices
    assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(zz.tolist()) == list(range(64))


def test_entropy_segment_hand_derived_bytes():
    # Single 8×8 tile, seed 0 ⇒ p=0 ⇒ DC=−64, diff=−64: category 7
    # (DC code 0111), value bits −64+127=63 (0111111), then EOB
    # (9-bit code 0), padded with four 1-bits:
    # 0111 0111111 000000000 1111 → 0x77 0xE0 0x0F
    payload = jpeg_full_bytes(8, 8, seed=0)
    sos = payload.index(b"\xff\xda")
    sos_len = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    entropy = payload[sos + 2 + sos_len : -2]
    assert entropy == bytes([0x77, 0xE0, 0x0F])


# --- closed-form tiles ---------------------------------------------------------


@pytest.mark.parametrize("seed,w,h", [(0, 8, 8), (7, 24, 16), (19, 40, 32),
                                      (128, 32, 32)])
def test_tile_fixture_decodes_to_closed_form(seed, w, h):
    px = decode_jpeg(jpeg_full_bytes(w, h, seed=seed))
    assert px.shape == (h, w, 1)
    assert np.array_equal(px[:, :, 0].astype(np.int64),
                          _tile_expected(w, h, seed))


def test_tile_fixture_rejects_unaligned_dims():
    with pytest.raises(ValueError, match="multiple-of-8"):
        jpeg_full_bytes(12, 8)


# --- roundtrips (lossy: bounded error) -----------------------------------------


def test_gray_roundtrip_q1_near_lossless():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(41, 53), dtype=np.uint8)  # pads to 8×8
    out = decode_jpeg(encode_jpeg(img, quant=1))
    assert out.shape == (41, 53, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_gray_roundtrip_q16_bounded():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=16))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    # worst-case IDCT of quantization error: sum_uv |ΔF·basis| ≤ 64·(Q/2)/8
    assert err.max() <= 64
    assert err.mean() < 8


def test_rgb_roundtrip_q1():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quant=1))
    assert out.shape == (24, 31, 3)
    # q=1 keeps DCT error ≤ ~1; YCbCr forward+inverse rounding adds ≤ ~2
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_header_parser_reads_full_jpeg():
    assert parse_image_header(jpeg_full_bytes(24, 16, seed=3)) == (
        "jpeg", 24, 16,
    )


# --- error paths ----------------------------------------------------------------


def test_decode_rejects_non_jpeg():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a + junk")


def test_decode_rejects_progressive():
    payload = bytearray(jpeg_full_bytes(8, 8))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # SOF2: progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_decode_rejects_subsampled():
    payload = bytearray(jpeg_full_bytes(8, 8))
    i = payload.index(b"\xff\xc0")
    # from FF C0: len(2) precision(1) h(2) w(2) nf(1) id(1) then samp
    payload[i + 11] = 0x22  # 2x2 sampling on component 1
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(payload))


def test_decode_rejects_truncated_entropy():
    payload = jpeg_full_bytes(40, 32, seed=5)
    with pytest.raises(ValueError, match="ended early"):
        decode_jpeg(payload[:-20] + b"\xff\xd9")


def test_extract_features_stdlib_backend_dispatches_all_codecs(spark):
    from halvesting_geometric_spark.operators.multimodal import (
        extract_features,
        gif_full_bytes,
        png_full_bytes,
    )

    rows = [
        (0, "image", png_full_bytes(16, 16, seed=1)),
        (1, "image", gif_full_bytes(16, 16, seed=2)),
        (2, "image", jpeg_full_bytes(16, 16, seed=3)),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: r
        for r in extract_features(df, decode_backend="stdlib").collect()
    }
    for i in range(3):
        feat = got[i]["feat"]
        assert len(feat) == 8
        assert abs(sum(feat) - 1.0) < 1e-6  # normalized float32 histogram


# --- operator --------------------------------------------------------------------


def test_jpeg_pixel_stats_matches_closed_form(spark):
    rows = [
        (i, jpeg_full_bytes(8 * (1 + i), 8 * (1 + (i % 2)), seed=3 * i))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in jpeg_pixel_stats(df).collect()}
    for i in range(4):
        w, h = 8 * (1 + i), 8 * (1 + (i % 2))
        exp = _tile_expected(w, h, 3 * i)
        r = got[i]
        assert (r["width"], r["height"], r["n_px"]) == (w, h, w * h)
        assert r["pixel_sum"] == int(exp.sum())
        assert r["pixel_min"] == int(exp.min())
        assert r["pixel_max"] == int(exp.max())
        pos = (
            np.arange(w, dtype=np.int64)[None, :]
            + np.arange(h, dtype=np.int64)[:, None] * w
        )
        assert r["pos_sum"] == int((pos * exp).sum())
        nv = exp.size
        assert r["mean_e6"] == (int(exp.sum()) * 1_000_000 + nv // 2) // nv
