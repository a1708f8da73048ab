"""Pure-Python PCM WAV codec and exact integer 1-D box resample.

RIFF/WAVE with 16-bit signed little-endian PCM is a public, trivially
specified format (Microsoft/IBM RIFF spec), so real audio decoding is
possible in this no-librosa/no-ffmpeg sandbox — the audio counterpart
of ``kernel/imagecodec.py``. The reference routes media through model
stages (``qwen_processor.py``); here the decode itself is the real,
in-sandbox implementation for the formats that need no codec library.

Layout: ``RIFF <size> WAVE`` + ``fmt `` chunk (PCM, mono/stereo,
16 bps) + ``data`` chunk of interleaved int16 LE samples. The decoder
walks chunks (tolerating extras like ``LIST``) rather than assuming
fixed offsets.

The resample is the 1-D integer adaptive box filter — output sample
``j`` floor-averages the source slice ``[j*n//m, (j+1)*n//m)`` — every
step integer arithmetic, so a SQL oracle replays resampled values bit
for bit on synthetic waveforms.

Samples everywhere are ``np.ndarray (n, ch) int16``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_wav",
    "decode_wav",
    "box_resample",
    "sample_checksum",
    "synth_wave",
]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    assert samples.dtype == np.int16
    body = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits per sample
    )
    data = b"data" + len(body).to_bytes(4, "little") + body
    riff_size = 4 + len(fmt) + len(data)
    return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> (samples ``(n, ch) int16``, sample_rate). Chunk-walking
    parser: requires PCM (format tag 1) at 16 bits; skips unknown
    chunks (word-aligned per RIFF)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(data), 8 + int.from_bytes(data[4:8], "little"))
    rate = ch = None
    samples = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bps = int.from_bytes(body[14:16], "little")
            if tag != 1 or bps != 16:
                raise ValueError(f"only 16-bit PCM supported (tag={tag}, bps={bps})")
        elif cid == b"data":
            if ch is None:
                raise ValueError("data chunk before fmt chunk")
            usable = (len(body) // (2 * ch)) * 2 * ch
            samples = (
                np.frombuffer(body[:usable], dtype="<i2")
                .reshape(-1, ch)
                .astype(np.int16)
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def box_resample(samples: np.ndarray, m: int) -> np.ndarray:
    """Integer adaptive box filter to ``m`` output samples per channel:
    ``out[j] = sum(samples[j*n//m : (j+1)*n//m]) // box_len`` (floor
    division toward -inf, matching SQL ``//``). Vectorized via one
    cumsum; O(1) per output sample."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if m < 1:
        raise ValueError("target length must be >= 1")
    csum = np.zeros((n + 1, ch), dtype=np.int64)
    np.cumsum(samples, axis=0, dtype=np.int64, out=csum[1:])
    bounds = (np.arange(m + 1, dtype=np.int64) * n) // m
    lo, hi = bounds[:-1], bounds[1:]
    sums = csum[hi] - csum[lo]
    # floor division toward -inf on possibly-negative sums: numpy //
    # on int64 already floors, matching DuckDB's // on BIGINT
    out = sums // (hi - lo)[:, None]
    return out.astype(np.int16)


def sample_checksum(samples: np.ndarray) -> int:
    """Order- and channel-sensitive integer checksum:
    ``sum s[i, c] * (1 + i + c*n)`` — exactly replayable in SQL.
    Separable decomposition (``S + dot(i, sum_i) + n*dot(c, sum_c)``)
    instead of materializing an (n, ch) weight array."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    s = samples.astype(np.int64, copy=False)
    sum_i = s.sum(axis=1, dtype=np.int64)
    sum_c = s.sum(axis=0, dtype=np.int64)
    return (
        int(sum_c.sum())
        + int(np.arange(n, dtype=np.int64) @ sum_i)
        + n * int(np.arange(ch, dtype=np.int64) @ sum_c)
    )


def synth_wave(media_id: int, n: int, ch: int = 1) -> np.ndarray:
    """Deterministic synthetic int16 waveform:
    ``s[i, c] = ((13*i + 17*media_id + 5*c) % 65536) - 32768`` — the
    SQL oracle rebuilds every sample from this formula without touching
    the binary payload."""
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    return (((13 * i + 17 * int(media_id) + 5 * c) % 65536) - 32768).astype(
        np.int16
    )
