"""Pure-Python YUV4MPEG2 (C444) container codec."""

import numpy as np
import pytest

from pdf_extractor_ray.kernel.videocodec import (
    decode_y4m,
    encode_y4m,
    frame_iter_y4m,
)


def _gradient_frames(mid: int, nf: int, h: int, w: int) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)[None, None, :, None]
    y = np.arange(h, dtype=np.int64)[None, :, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    return ((3 * x + 7 * y + 11 * c + 19 * f + mid) % 256).astype(np.uint8)


def test_y4m_round_trip():
    frames = _gradient_frames(5, 4, 9, 12)
    data = encode_y4m(frames, fps=(30, 1))
    assert data.startswith(b"YUV4MPEG2 W12 H9 F30:1")
    out, fps = decode_y4m(data)
    assert fps == (30, 1)
    assert np.array_equal(out, frames)


def test_frame_iter_indices_and_order():
    frames = _gradient_frames(2, 6, 4, 4)
    got = list(frame_iter_y4m(encode_y4m(frames)))
    assert [i for i, _f in got] == list(range(6))
    for i, f in got:
        assert np.array_equal(f, frames[i])


def test_y4m_rejects_subsampled_and_garbage():
    frames = _gradient_frames(1, 1, 4, 4)
    data = encode_y4m(frames).replace(b"C444", b"C420jpeg")
    with pytest.raises(ValueError):
        decode_y4m(data)
    with pytest.raises(ValueError):
        decode_y4m(b"\x00\x01\x02")


def test_y4m_truncated_frame():
    frames = _gradient_frames(3, 2, 4, 4)
    data = encode_y4m(frames)
    with pytest.raises(ValueError):
        decode_y4m(data[:-5])


def test_y4m_header_without_colorspace_defaults_420():
    # spec default colorspace is 4:2:0 -> must be rejected, not misread
    frames = _gradient_frames(1, 1, 2, 2)
    data = encode_y4m(frames).replace(b" C444", b"")
    with pytest.raises(ValueError):
        decode_y4m(data)


def test_y4m_zero_frames():
    frames = np.zeros((0, 3, 3, 3), dtype=np.uint8)
    out, _fps = decode_y4m(encode_y4m(frames))
    assert out.shape == (0, 3, 3, 3)
