"""Real-decode multimodal stages, called directly on Arrow batches.

The actor-pool classes are plain callables; exercising __call__ off-Ray
pins the exact integer semantics the SQL oracles replay.
"""

import numpy as np
import pyarrow as pa

from pdf_extractor_ray.functions.multimodal import (
    AudioFeatureExtractor,
    AudioResampler,
    FrameSampler,
    ImagePixelDecoder,
    MediaResizer,
)
from pdf_extractor_ray.kernel.audiocodec import (
    box_resample,
    encode_wav,
    sample_checksum,
    synth_wave,
)
from pdf_extractor_ray.kernel.imagecodec import (
    box_resize,
    encode_bmp,
    encode_ppm,
    gradient_image,
    pixel_checksum,
)
from pdf_extractor_ray.kernel.videocodec import encode_y4m


def test_image_pixel_decoder_both_formats():
    px0 = gradient_image(0, 20, 10)  # even id -> ppm in the corpus
    px1 = gradient_image(1, 7, 5)
    batch = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [encode_ppm(px0), encode_bmp(px1)], pa.binary()
            ),
        }
    )
    out = ImagePixelDecoder()(batch).to_pylist()
    assert out[0]["width"] == 20 and out[0]["height"] == 10
    assert out[0]["checksum"] == pixel_checksum(px0)
    assert out[1]["checksum"] == pixel_checksum(px1)
    n = 7 * 5
    sums = px1.reshape(-1, 3).astype(np.int64).sum(axis=0)
    assert out[1]["mean_g"] == sums[1] // n


def test_media_resizer_real_matches_kernel():
    px = gradient_image(4, 40, 24)
    batch = pa.table(
        {
            "media_id": pa.array([4], pa.int64()),
            "payload": pa.array([encode_ppm(px)], pa.binary()),
        }
    )
    out = MediaResizer(target=8, decoder="real")(batch).to_pylist()[0]
    w = max(1, 40 * 8 // 40)
    h = max(1, 24 * 8 // 40)
    assert (out["width"], out["height"]) == (w, h)
    assert out["checksum"] == pixel_checksum(box_resize(px, w, h))
    assert out["payload"].startswith(b"P6")


def test_audio_feature_extractor_matches_kernel():
    s = synth_wave(9, 777)
    batch = pa.table(
        {
            "media_id": pa.array([9], pa.int64()),
            "payload": pa.array([encode_wav(s, 8000)], pa.binary()),
        }
    )
    out = AudioFeatureExtractor()(batch).to_pylist()[0]
    s64 = s.astype(np.int64)
    assert out["n_samples"] == 777
    assert out["duration_ms"] == 777 * 1000 // 8000
    assert out["peak"] == int(np.abs(s64).max())
    assert out["energy"] == int((s64 * s64).sum())
    nonneg = s[:, 0] >= 0
    assert out["zero_crossings"] == int((nonneg[1:] != nonneg[:-1]).sum())
    assert out["checksum"] == sample_checksum(s)


def test_audio_resampler_matches_kernel():
    s = synth_wave(2, 1003)
    batch = pa.table(
        {
            "media_id": pa.array([2], pa.int64()),
            "payload": pa.array([encode_wav(s, 8000)], pa.binary()),
        }
    )
    out = AudioResampler(target_rate=2000)(batch).to_pylist()[0]
    m = 1003 * 2000 // 8000
    assert out["n_out"] == m
    assert out["checksum"] == sample_checksum(box_resample(s, m))
    assert out["payload"][:4] == b"RIFF"


def test_frame_sampler_real_samples_every_n():
    nf, h, w = 7, 6, 5
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    frames = (
        (gradient_image(3, w, h)[None].astype(np.int64) + 19 * f) % 256
    ).astype(np.uint8)
    batch = pa.table(
        {
            "media_id": pa.array([3], pa.int64()),
            "payload": pa.array([encode_y4m(frames)], pa.binary()),
        }
    )
    out = FrameSampler(every_n=3, decoder="real")(batch).to_pylist()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    for r in out:
        assert r["frame_crc"] == pixel_checksum(frames[r["frame_idx"]])


def _poison_batch(payloads):
    return pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def test_on_error_skip_drops_only_poison_rows():
    import pytest

    px = gradient_image(1, 6, 6)
    s = synth_wave(1, 64)
    f = np.arange(2, dtype=np.int64)[:, None, None, None]
    frames = ((gradient_image(2, 4, 4)[None].astype(np.int64) + f) % 256).astype(np.uint8)

    cases = [
        (ImagePixelDecoder, {}, [encode_ppm(px), b"\x89PNG poison", encode_bmp(px)]),
        (MediaResizer, {"target": 4, "decoder": "real"},
         [encode_ppm(px), b"", encode_bmp(px)]),
        (AudioFeatureExtractor, {}, [encode_wav(s, 8000), b"ID3 poison", encode_wav(s, 8000)]),
        (AudioResampler, {"target_rate": 2000},
         [encode_wav(s, 8000), b"RIFFxxxx", encode_wav(s, 8000)]),
        (FrameSampler, {"every_n": 1, "decoder": "real"},
         [encode_y4m(frames), encode_y4m(frames)[:-3], encode_y4m(frames)]),
    ]
    for cls, kwargs, payloads in cases:
        batch = _poison_batch(payloads)
        # default: the poison row raises
        with pytest.raises(ValueError):
            cls(**kwargs)(batch)
        # skip: only rows 0 and 2 survive
        out = cls(**kwargs, on_error="skip")(batch)
        assert sorted(set(out["media_id"].to_pylist())) == [0, 2], cls.__name__


def test_on_error_rejects_unknown_mode():
    import pytest

    with pytest.raises(ValueError):
        ImagePixelDecoder(on_error="ignore")
