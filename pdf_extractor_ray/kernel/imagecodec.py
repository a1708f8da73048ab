"""Pure-Python image codecs (PPM P6 + 24-bit BMP) and an exact
integer box-filter resize.

Both formats are public and trivially specified, which makes real
pixel decoding possible in this no-PIL/no-ffmpeg sandbox:

  - PPM "P6": ASCII header ``P6\\n<w> <h>\\n255\\n`` followed by raw
    RGB bytes, row-major top-down (Netpbm spec).
  - BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp,
    BI_RGB (uncompressed), rows stored BOTTOM-UP in BGR order and
    padded to 4-byte boundaries (Windows DIB spec).

The resize is an integer "adaptive" box filter: output pixel (i, j)
averages (floor division) the source box
``[i*sh//th, (i+1)*sh//th) x [j*sw//tw, (j+1)*sw//tw)`` — every step
is integer arithmetic, so a SQL oracle replays resized pixels bit for
bit on synthetic gradients.

Pixels everywhere are ``np.ndarray (h, w, 3) uint8`` RGB.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_ppm",
    "decode_ppm",
    "encode_bmp",
    "decode_bmp",
    "decode_image",
    "box_resize",
    "pixel_checksum",
    "gradient_image",
    "grayscale",
    "dhash_bits",
    "dhash_hex",
    "hamming64",
]


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace-separated with
    # optional '#' comment lines (Netpbm allows them before maxval)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = w * h * 3
    raw = data[pos : pos + need]
    if len(raw) != need:
        raise ValueError(f"truncated PPM: want {need} bytes, got {len(raw)}")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = b"BM" + (off + img_size).to_bytes(4, "little") + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive: bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    # bottom-up rows, BGR, padded
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    return header + info + body.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = data[off : off + stride * h]
    if len(raw) != stride * h:
        raise ValueError("truncated BMP body")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


def decode_image(data: bytes) -> np.ndarray:
    """Sniff-and-decode: P6 PPM or 24-bit BMP."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ValueError(f"unknown image magic {data[:2]!r}")


def box_resize(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Integer adaptive box filter to (th, tw): each output pixel is
    ``sum(source box) // box_area`` with boundaries
    ``[i*sh//th, (i+1)*sh//th)`` — all-integer, SQL-replayable.
    Vectorized via a summed-area table (one cumsum, O(1) per box)."""
    sh, sw, _ = pixels.shape
    if not (1 <= tw and 1 <= th):
        raise ValueError("target dims must be >= 1")
    # summed-area table per channel, int64 (no overflow: 255*4096^2)
    sat = np.zeros((sh + 1, sw + 1, 3), dtype=np.int64)
    np.cumsum(np.cumsum(pixels, axis=0, dtype=np.int64), axis=1, out=sat[1:, 1:])
    ys = (np.arange(th + 1, dtype=np.int64) * sh) // th
    xs = (np.arange(tw + 1, dtype=np.int64) * sw) // tw
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    # box sums via SAT inclusion-exclusion, broadcast (th, tw, 3)
    s = (
        sat[y1][:, x1]
        - sat[y0][:, x1]
        - sat[y1][:, x0]
        + sat[y0][:, x0]
    )
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[:, :, None]
    return (s // area).astype(np.uint8)


def pixel_checksum(pixels: np.ndarray) -> int:
    """Order-sensitive integer checksum:
    ``sum v[y, x, c] * (1 + x + y*w + c*w*h)`` — catches any layout or
    channel-order bug, exactly replayable in SQL.

    Computed via the separable decomposition
    ``S + dot(x, sum_x) + w*dot(y, sum_y) + w*h*dot(c, sum_c)`` —
    three axis-sums instead of materializing an (h, w, 3) int64
    weight array per call (same exact value, ~9x less transient
    memory; measured stage wall unchanged — the decode stage is
    plumbing-bound, not checksum-bound)."""
    h, w, c = pixels.shape
    px = pixels.astype(np.int64, copy=False)
    sum_x = px.sum(axis=(0, 2), dtype=np.int64)  # per-column
    sum_y = px.sum(axis=(1, 2), dtype=np.int64)  # per-row
    sum_c = px.sum(axis=(0, 1), dtype=np.int64)  # per-channel
    total = int(sum_c.sum())
    return (
        total
        + int(np.arange(w, dtype=np.int64) @ sum_x)
        + w * int(np.arange(h, dtype=np.int64) @ sum_y)
        + w * h * int(np.arange(c, dtype=np.int64) @ sum_c)
    )


def gradient_image(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic RGB gradient:
    ``pixel[y, x, c] = (3x + 7y + 11c + media_id) % 256`` — the SQL
    oracle rebuilds every pixel from this formula without touching the
    binary payload."""
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((3 * x + 7 * y + 11 * c + int(media_id)) % 256).astype(np.uint8)


def grayscale(pixels: np.ndarray) -> np.ndarray:
    """Integer ITU-R 601 luma: ``(299*R + 587*G + 114*B) // 1000`` —
    the classic coefficients kept in exact integer permille form so a
    SQL oracle replays every value. -> ``(h, w) int64``."""
    px = pixels.astype(np.int64, copy=False)
    return (
        299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    ) // 1000


def dhash_bits(pixels: np.ndarray) -> np.ndarray:
    """Difference hash (dHash, public algorithm): box-resize to 9x8,
    integer grayscale, bit (i, j) = 1 iff g[i, j+1] > g[i, j] — 64
    horizontal-gradient bits robust to re-encoding and scaling.
    -> ``(64,) uint8`` of 0/1, row-major."""
    g = grayscale(box_resize(pixels, 9, 8))
    return (g[:, 1:] > g[:, :-1]).astype(np.uint8).reshape(64)


def dhash_hex(pixels: np.ndarray) -> str:
    """:func:`dhash_bits` packed MSB-first into 8 bytes, as a 16-char
    lowercase hex string (string form avoids int64 sign traps in both
    Arrow columns and SQL oracles)."""
    return np.packbits(dhash_bits(pixels)).tobytes().hex()


def hamming64(a: str, b: str) -> int:
    """Hamming distance between two :func:`dhash_hex` strings."""
    return int(
        bin(int(a, 16) ^ int(b, 16)).count("1")
    )
