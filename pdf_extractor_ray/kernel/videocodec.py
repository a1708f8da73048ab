"""Pure-Python YUV4MPEG2 (.y4m) container codec.

Y4M is the public, trivially specified uncompressed-video container
(mjpegtools spec): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<colorspace>\\n`` followed by
frames, each ``FRAME[ params]\\n`` + raw planes. With ``C444`` every
plane is full resolution, so the three planes carry exact per-pixel
integer data — no chroma subsampling to approximate — which makes real
frame decoding possible in this no-ffmpeg/no-pyav sandbox, the video
counterpart of ``kernel/imagecodec.py``. Planes are stored
plane-major per frame (all of plane 0, then 1, then 2).

Frames everywhere are ``np.ndarray (n_frames, h, w, 3) uint8``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_y4m", "decode_y4m", "frame_iter_y4m"]


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    nf, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (w, h, *fps)
    parts = [head]
    for f in range(nf):
        parts.append(b"FRAME\n")
        # pixel-interleaved (h, w, 3) -> plane-major (3, h, w)
        parts.append(frames[f].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def _parse_header(data: bytes) -> tuple[int, int, tuple[int, int], int]:
    """-> (w, h, (fps_num, fps_den), body_offset). Requires C444."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    cspace = b"420jpeg"  # the spec default when C is absent
    for tok in data[9:nl].split():
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif key == b"C":
            cspace = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cspace != b"444":
        raise ValueError(f"only C444 supported, got {cspace.decode()!r}")
    return w, h, fps, nl + 1


def frame_iter_y4m(data: bytes):
    """Yield ``(frame_idx, (h, w, 3) uint8)`` without materializing all
    frames — the streaming shape a sampler wants (skipped frames cost a
    slice bound, not a decode)."""
    w, h, _fps, pos = _parse_header(data)
    fsize = w * h * 3
    idx = 0
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        start = nl + 1
        raw = data[start : start + fsize]
        if len(raw) != fsize:
            raise ValueError(f"truncated frame {idx}")
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(3, h, w)
        yield idx, planes.transpose(1, 2, 0)
        pos = start + fsize
        idx += 1


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """-> (frames ``(n, h, w, 3) uint8``, (fps_num, fps_den))."""
    w, h, fps, _pos = _parse_header(data)
    frames = [f for _i, f in frame_iter_y4m(data)]
    if not frames:
        return np.zeros((0, h, w, 3), dtype=np.uint8), fps
    return np.stack(frames), fps
