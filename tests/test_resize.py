"""Real image resize: signature-dispatch decode → exact integer box
downscale → lossless general PNG re-encode, plus the composed
resize_images → pixel_stats Spark pipeline.

box_resize's arithmetic is pinned against hand-computed block means
(round-half-up integer division), encode_png against decode_png exactness
and against the PNG spec's container rules (CRC, IHDR fields, filter-0
scanlines), and the pipeline against the DC-only closed form of the JPEG
tile fixtures — so all three stages are honest against independent ground
truth, not merely against each other.
"""

import numpy as np
import pytest

from halvesting_geometric_spark.operators.multimodal import (
    box_resize,
    decode_image,
    decode_png,
    encode_png,
    gif_full_bytes,
    jpeg_full_bytes,
    parse_image_header,
    pixel_stats,
    png_full_bytes,
    resize_images,
)


# ---------------------------------------------------------------- box_resize


def test_box_resize_hand_computed():
    px = np.array(
        [[0, 10, 20, 30],
         [40, 50, 60, 70],
         [255, 255, 0, 0],
         [255, 255, 0, 0]],
        dtype=np.uint8,
    )
    out = box_resize(px, 2)
    # blocks: (0+10+40+50+2)//4=25, (20+30+60+70+2)//4=45, 255, 0
    assert out.shape == (2, 2, 1)
    assert out[:, :, 0].tolist() == [[25, 45], [255, 0]]


def test_box_resize_round_half_up():
    # sum 1+0+0+0 = 1 → (1+2)//4 = 0; sum 2 → (2+2)//4 = 1 (half rounds up)
    a = np.zeros((2, 2), dtype=np.uint8); a[0, 0] = 1
    b = np.zeros((2, 2), dtype=np.uint8); b[0, 0] = 2
    assert int(box_resize(a, 2)[0, 0, 0]) == 0
    assert int(box_resize(b, 2)[0, 0, 0]) == 1


def test_box_resize_per_channel():
    px = np.stack(
        [np.full((4, 4), 10, np.uint8), np.full((4, 4), 200, np.uint8),
         np.full((4, 4), 7, np.uint8)], axis=2)
    out = box_resize(px, 4)
    assert out.shape == (1, 1, 3)
    assert out[0, 0].tolist() == [10, 200, 7]


def test_box_resize_factor_one_identity():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (box_resize(px, 1) == px).all()


def test_box_resize_rejects_non_multiples():
    with pytest.raises(ValueError, match="not multiples"):
        box_resize(np.zeros((6, 6), np.uint8), 4)
    with pytest.raises(ValueError, match="factor"):
        box_resize(np.zeros((4, 4), np.uint8), 0)


# ---------------------------------------------------------------- encode_png


def test_encode_png_lossless_roundtrip_all_channel_counts():
    rng = np.random.default_rng(3)
    for ch in (1, 3, 4):
        px = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
        back = decode_png(encode_png(px))
        assert back.shape == (5, 7, ch)
        assert (back == px).all()


def test_encode_png_container_is_spec_valid():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = encode_png(px)
    fmt, w, h = parse_image_header(b)
    assert (fmt, w, h) == ("png", 4, 3)
    # IHDR body starts at 16 (sig 8 + len 4 + type 4); depth/color at +8/+9
    assert b[16 + 8] == 8 and b[16 + 9] == 0
    import zlib
    ihdr_body = b[16:29]
    crc = int.from_bytes(b[29:33], "big")
    assert crc == zlib.crc32(b"IHDR" + ihdr_body)


def test_encode_png_2d_equals_hw1():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert encode_png(px) == encode_png(px[:, :, None])


def test_encode_png_rejects_bad_shapes():
    with pytest.raises(ValueError, match="1\\|3\\|4"):
        encode_png(np.zeros((4, 4, 2), np.uint8))


# -------------------------------------------------------------- decode_image


def test_decode_image_dispatches_all_three_codecs():
    assert decode_image(jpeg_full_bytes(16, 8, 1)).shape == (8, 16, 1)
    assert decode_image(png_full_bytes(5, 4, 2)).shape == (4, 5, 1)
    assert decode_image(gif_full_bytes(6, 3, 7)).shape[:2] == (3, 6)
    with pytest.raises(ValueError, match="unknown image signature"):
        decode_image(b"\x00" * 32)
    with pytest.raises(ValueError, match="too short"):
        decode_image(b"abc")


# -------------------------------------------------------------------- spark


def test_resize_images_pipeline_matches_closed_form(spark):
    def tile_v(tx, ty, s):
        p = (tx * 7 + ty * 13 + s) % 256
        v = p if p % 2 == 0 else (p + 1 if p > 128 else p - 1)
        return max(0, min(255, v))

    specs = [(1, 32, 16, 9), (2, 48, 48, 40), (3, 16, 32, 0)]
    rows = [(mid, jpeg_full_bytes(w, h, s)) for mid, w, h, s in specs]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    resized = resize_images(df, factor=16)
    out = {r.media_id: r for r in pixel_stats(resized).collect()}
    assert len(out) == 3
    for mid, w, h, s in specs:
        ow, oh = w // 16, h // 16
        vals = [
            (sum(tile_v(2 * ox + dx, 2 * oy + dy, s)
                 for dx in (0, 1) for dy in (0, 1)) + 2) // 4
            for oy in range(oh) for ox in range(ow)
        ]
        r = out[mid]
        assert (r.width, r.height, r.n_px) == (ow, oh, ow * oh)
        assert r.pixel_sum == sum(vals)
        assert r.pixel_min == min(vals)
        assert r.pixel_max == max(vals)


def test_resize_images_payloads_are_consumable_pngs(spark):
    df = spark.createDataFrame(
        [(5, png_full_bytes(8, 8, 3))], "media_id long, payload binary"
    )
    row = resize_images(df, factor=2).first()
    assert (row.out_w, row.out_h) == (4, 4)
    px = decode_png(bytes(row.payload))
    want = box_resize(decode_png(png_full_bytes(8, 8, 3)), 2)
    assert (px == want).all()
