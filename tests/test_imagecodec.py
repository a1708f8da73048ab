"""Pure-Python PPM/BMP codec + integer box-filter resize.

Reference behavior: the reference processes images through PIL-backed
stages (marker models / qwen_processor.py); this sandbox has no PIL, so
the real in-repo decode path covers the two trivially-specified public
formats (Netpbm P6, Windows 24-bit DIB) with exact integer semantics.
"""

import numpy as np
import pytest

from pdf_extractor_ray.kernel.imagecodec import (
    box_resize,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    gradient_image,
    pixel_checksum,
)


def test_ppm_round_trip():
    px = gradient_image(7, 13, 9)
    out = decode_ppm(encode_ppm(px))
    assert np.array_equal(out, px)


def test_ppm_comment_and_split_header():
    px = gradient_image(1, 4, 2)
    raw = b"P6\n# a comment line\n4\n2\n# another\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(raw), px)


def test_bmp_round_trip_padded_rows():
    # w=5 -> row_bytes=15, pad=1: exercises the 4-byte stride padding
    px = gradient_image(3, 5, 6)
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    out = decode_bmp(data)
    assert np.array_equal(out, px)


def test_bmp_top_down_negative_height():
    px = gradient_image(9, 4, 4)
    data = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse stored row order
    h = 4
    data[22:26] = (-h).to_bytes(4, "little", signed=True)
    stride = (4 * 3 + 3) & ~3
    off = 54
    body = bytes(data[off:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
    data[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), px)


def test_decode_image_sniffs_magic():
    px = gradient_image(2, 3, 3)
    assert np.array_equal(decode_image(encode_ppm(px)), px)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG....")


def test_box_resize_matches_naive():
    px = gradient_image(5, 17, 11)
    tw, th = 6, 4
    out = box_resize(px, tw, th)
    sh, sw, _ = px.shape
    for i in range(th):
        for j in range(tw):
            y0, y1 = i * sh // th, (i + 1) * sh // th
            x0, x1 = j * sw // tw, (j + 1) * sw // tw
            box = px[y0:y1, x0:x1].astype(np.int64)
            want = box.reshape(-1, 3).sum(axis=0) // ((y1 - y0) * (x1 - x0))
            assert np.array_equal(out[i, j], want.astype(np.uint8))


def test_box_resize_identity():
    px = gradient_image(4, 8, 8)
    assert np.array_equal(box_resize(px, 8, 8), px)


def test_pixel_checksum_order_sensitive():
    px = gradient_image(6, 7, 5)
    base = pixel_checksum(px)
    assert base == pixel_checksum(px.copy())
    # swapping two unequal pixels must change the checksum
    flipped = px.copy()
    flipped[0, 0], flipped[4, 6] = px[4, 6].copy(), px[0, 0].copy()
    assert not np.array_equal(flipped, px)
    assert pixel_checksum(flipped) != base
    # channel swap must change it too
    assert pixel_checksum(px[:, :, ::-1]) != base


def test_resize_then_checksum_sql_replayable():
    # the exact values the media_resize oracle replays: box boundaries
    # via floor division, box-sum floor-divided by area
    mid = 11
    w, h = 16 + (mid * 37) % 48, 16 + (mid * 53) % 48
    px = gradient_image(mid, w, h)
    tw = max(1, w * 8 // max(w, h))
    th = max(1, h * 8 // max(w, h))
    out = box_resize(px, tw, th)
    total = 0
    for i in range(th):
        for j in range(tw):
            for c in range(3):
                total += int(out[i, j, c]) * (1 + j + i * tw + c * tw * th)
    assert pixel_checksum(out) == total


def test_grayscale_integer_luma():
    from pdf_extractor_ray.kernel.imagecodec import grayscale

    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]]],
                  dtype=np.uint8)
    g = grayscale(px)
    assert g.tolist() == [[76, 149, 29, (299 * 10 + 587 * 20 + 114 * 30) // 1000]]


def test_dhash_matches_naive():
    from pdf_extractor_ray.kernel.imagecodec import (
        box_resize,
        dhash_bits,
        dhash_hex,
        grayscale,
    )

    px = gradient_image(9, 33, 27)
    g = grayscale(box_resize(px, 9, 8))
    want = [(1 if g[i, j + 1] > g[i, j] else 0) for i in range(8) for j in range(8)]
    assert dhash_bits(px).tolist() == want
    hx = dhash_hex(px)
    assert len(hx) == 16
    assert int(hx, 16) == int("".join(map(str, want)), 2)


def test_dhash_near_dup_small_distance_exact_dup_zero():
    from pdf_extractor_ray.kernel.imagecodec import dhash_hex, hamming64

    def img(b, w, h):
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        return (
            (3 * x + 7 * y + 11 * c + b + (x * y + b * x * x) % 251) % 256
        ).astype(np.uint8)

    a = img(7, 31, 29)
    assert hamming64(dhash_hex(a), dhash_hex(a.copy())) == 0
    p = a.copy()
    p[4, 6, :] = 255
    d = hamming64(dhash_hex(a), dhash_hex(p))
    assert 0 <= d <= 3  # a blasted pixel moves at most a few bits
    # a different base is far away
    assert hamming64(dhash_hex(a), dhash_hex(img(8, 31, 29))) > 3
