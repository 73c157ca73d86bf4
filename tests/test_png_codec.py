"""Real PNG codec: pure-stdlib encode/decode roundtrip (zlib IDAT, CRC
chunks, all five PNG scanline filters) + pixel_stats operator."""

import zlib

import numpy as np
import pytest

from halvesting_geometric_spark.operators.multimodal import (
    _PNG_SIG,
    decode_png,
    extract_features,
    parse_image_header,
    pixel_stats,
    png_full_bytes,
)


def _expected(width, height, seed, ch):
    return np.array(
        [
            [[(x * 7 + y * 13 + seed + c) % 256 for c in range(ch)]
             for x in range(width)]
            for y in range(height)
        ],
        dtype=np.uint8,
    )


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_roundtrip_all_color_types(color_type, ch):
    # height 10 > 5 rows exercises every filter type (row y uses y % 5)
    px = decode_png(png_full_bytes(9, 10, seed=3, color_type=color_type))
    assert px.shape == (10, 9, ch)
    assert np.array_equal(px, _expected(9, 10, 3, ch))


def test_header_parser_reads_full_png():
    p = png_full_bytes(33, 21, seed=1)
    assert parse_image_header(p) == ("png", 33, 21)


def test_decode_concatenated_idat_chunks():
    # spec: IDAT data is one zlib stream split across consecutive chunks
    p = png_full_bytes(6, 6, seed=2)
    # re-split the IDAT payload into two chunks
    pos, parts, idat = 8, [], None
    while pos + 8 <= len(p):
        clen = int.from_bytes(p[pos:pos + 4], "big")
        ctype = p[pos + 4:pos + 8]
        data = p[pos + 8:pos + 8 + clen]
        if ctype == b"IDAT":
            idat = data
        else:
            parts.append((ctype, data))
        pos += 12 + clen
    def chunk(ctype, data):
        return (len(data).to_bytes(4, "big") + ctype + data
                + zlib.crc32(ctype + data).to_bytes(4, "big"))
    rebuilt = (_PNG_SIG + chunk(*parts[0])
               + chunk(b"IDAT", idat[:7]) + chunk(b"IDAT", idat[7:])
               + chunk(*parts[1]))
    assert np.array_equal(decode_png(rebuilt), _expected(6, 6, 2, 1))


def test_decode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK")
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(None)
    # 16-bit depth unsupported
    p = bytearray(png_full_bytes(4, 4))
    p[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(p))


def test_encoder_validates_color_type():
    with pytest.raises(ValueError, match="color_type"):
        png_full_bytes(4, 4, color_type=3)


def test_pixel_stats_matches_closed_form(spark):
    rows = [(i, png_full_bytes(4 + i, 5 + i, seed=i)) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in pixel_stats(df).collect()}
    for i in range(4):
        exp = _expected(4 + i, 5 + i, i, 1)
        tot, n = int(exp.sum()), exp.size
        r = got[i]
        assert (r["width"], r["height"], r["n_px"]) == (4 + i, 5 + i, n)
        assert r["pixel_sum"] == tot
        assert r["pixel_min"] == int(exp.min())
        assert r["pixel_max"] == int(exp.max())
        assert r["mean_e6"] == (tot * 1_000_000 + n // 2) // n


def test_extract_features_png_stdlib_backend(spark):
    p = png_full_bytes(8, 8, seed=0)
    df = spark.createDataFrame(
        [(0, "image", p)], "media_id long, kind string, payload binary"
    )
    row = extract_features(df, decode_backend="png_stdlib").collect()[0]
    exp = _expected(8, 8, 0, 1)
    hist = np.bincount(exp.reshape(-1) >> 5, minlength=8) / exp.size
    assert row["n_bytes"] == len(p)
    assert np.allclose(row["feat"], hist)
