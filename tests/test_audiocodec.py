"""Pure-Python RIFF/WAVE PCM codec + integer 1-D box resample.

The audio twin of test_imagecodec.py: real chunk-walking decode of a
public trivially-specified format, exact integer resample semantics.
"""

import numpy as np
import pytest

from pdf_extractor_ray.kernel.audiocodec import (
    box_resample,
    decode_wav,
    encode_wav,
    sample_checksum,
    synth_wave,
)


def test_wav_round_trip_mono():
    s = synth_wave(7, 1234)
    data = encode_wav(s, 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    out, rate = decode_wav(data)
    assert rate == 8000
    assert np.array_equal(out, s)


def test_wav_round_trip_stereo():
    s = synth_wave(3, 500, ch=2)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert out.shape == (500, 2)
    assert np.array_equal(out, s)


def test_wav_skips_unknown_chunks():
    s = synth_wave(1, 100)
    data = encode_wav(s, 8000)
    # splice a LIST chunk (odd size -> exercises word alignment)
    # between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    riff_size = len(spliced) - 8
    spliced = spliced[:4] + riff_size.to_bytes(4, "little") + spliced[8:]
    out, rate = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_rejects_non_pcm():
    s = synth_wave(1, 10)
    data = bytearray(encode_wav(s, 8000))
    data[20:22] = (3).to_bytes(2, "little")  # IEEE float tag
    with pytest.raises(ValueError):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_box_resample_matches_naive():
    s = synth_wave(11, 103)
    m = 17
    out = box_resample(s, m)
    n = s.shape[0]
    for j in range(m):
        lo, hi = j * n // m, (j + 1) * n // m
        want = int(s[lo:hi, 0].astype(np.int64).sum()) // (hi - lo)
        assert out[j, 0] == want


def test_box_resample_floors_negative_sums():
    # all-negative signal: floor(-7/2) = -4, truncation would give -3
    s = np.full((4, 1), -7, dtype=np.int16)
    out = box_resample(s, 2)
    assert out[0, 0] == -7  # sum -14 // 2
    s2 = np.array([[-7], [0]], dtype=np.int16)
    assert box_resample(s2, 1)[0, 0] == -4  # floor(-7/2), not -3


def test_box_resample_identity():
    s = synth_wave(2, 64)
    assert np.array_equal(box_resample(s, 64), s)


def test_sample_checksum_order_and_channel_sensitive():
    s = synth_wave(5, 50, ch=2)
    base = sample_checksum(s)
    assert base == sample_checksum(s.copy())
    flipped = s.copy()
    flipped[0], flipped[10] = s[10].copy(), s[0].copy()
    assert not np.array_equal(flipped, s)
    assert sample_checksum(flipped) != base
    assert sample_checksum(s[:, ::-1]) != base


def test_synth_wave_range():
    s = synth_wave(9, 2000)
    assert s.dtype == np.int16
    assert s.min() >= -32768 and s.max() <= 32767
