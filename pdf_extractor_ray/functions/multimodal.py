"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages. Three decode
modes:

  - ``decoder="real"``    -> REAL pixel decoding of PPM (P6) / 24-bit
    BMP payloads via the pure-Python codecs in
    ``kernel/imagecodec.py`` — genuine width/height/pixels, integer
    box-filter resize, SQL-replayable checksums. The in-sandbox real
    path (no PIL/ffmpeg needed for these public formats).
  - ``decoder="fake"``    -> deterministic fake decode: byte-level
    features (size, crc32, per-chunk hashes, a fake width/height pair
    derived from the content hash) for payloads in formats the
    sandbox can't decode (JPEG/MP4/...).
  - ``decoder="strict"``  -> NotImplementedError (clearly marked stub
    for codec-library formats).

At scale this stage is the canonical heavy actor pool
(SURVEY.md §2.2 M19 / A4 pattern): model/codec state in ``__init__``,
small ``batch_size`` because rows are megabytes, ``num_cpus``/``num_gpus``
sized per decoder.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "MediaFeatureExtractor",
    "MediaResizer",
    "ImagePixelDecoder",
    "AudioFeatureExtractor",
    "AudioResampler",
    "FrameSampler",
    "media_features",
    "media_resize",
    "image_decode",
    "audio_features",
    "audio_resample",
    "frame_sample",
]

def _check_on_error(on_error: str) -> None:
    """Poison-payload contract for the REAL decode stages: at corpus
    scale a corrupt payload must not kill a 100-TB job. ``"raise"``
    (default, the oracle-checked queries) propagates the codec's
    ValueError; ``"skip"`` drops the undecodable row — dropped ids are
    recoverable by an anti-join of output vs input."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"unknown on_error {on_error!r}")


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake (width, height) for a media payload.

    md5-derived (NOT crc32) so the derivation is expressible as a
    DuckDB oracle: ``('0x' || substr(md5(text), 1, 16))::UBIGINT``
    equals the big-endian first 8 digest bytes used here, which lets
    the driver value-check the resize stage end to end.
    """
    h64 = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return 16 + h64 % 1024, 16 + (h64 >> 10) % 1024


MEDIA_FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("n_bytes", pa.int64()),
        pa.field("crc32", pa.int64()),
        pa.field("n_chunks", pa.int32()),
        pa.field("fake_width", pa.int32()),
        pa.field("fake_height", pa.int32()),
    ]
)


class MediaFeatureExtractor:
    """Actor-pool stage: decode/feature-extract opaque media bytes.

    ``__init__`` is where a real build loads the codec/model once per
    actor. ``__call__`` processes one small Arrow batch of binary rows.
    """

    def __init__(self, decoder: str = "fake", chunk_size: int = 65536):
        if decoder not in ("fake", "strict"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.chunk_size = chunk_size
        # real build: self.codec = load_image_codec() / torch model etc.

    def _decode(self, payload: bytes) -> tuple[int, int]:
        if self.decoder == "strict":
            # STUB: real image/audio decoding needs PIL/ffmpeg, which
            # this container does not ship.
            raise NotImplementedError(
                "media decoding requires an image/audio library; "
                "use decoder='fake' for the deterministic stand-in"
            )
        return _fake_dims(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = []
        for mid, payload in zip(ids, payloads):
            payload = payload or b""
            w, h = self._decode(payload)
            chunks = [
                payload[i : i + self.chunk_size]
                for i in range(0, max(len(payload), 1), self.chunk_size)
            ]
            rows.append(
                {
                    "media_id": mid,
                    "n_bytes": len(payload),
                    "crc32": zlib.crc32(payload),
                    "n_chunks": len(chunks),
                    "fake_width": w,
                    "fake_height": h,
                }
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_FEATURE_SCHEMA)


def media_features(
    ds: ray.data.Dataset,
    decoder: str = "fake",
    batch_size: int = 16,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Run the media feature actor pool over a (media_id, payload)
    dataset. Small batch_size because media rows are large."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


PIXEL_DECODE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("width", pa.int64()),
        pa.field("height", pa.int64()),
        pa.field("checksum", pa.int64()),
        pa.field("mean_r", pa.int64()),
        pa.field("mean_g", pa.int64()),
        pa.field("mean_b", pa.int64()),
    ]
)


class ImagePixelDecoder:
    """Actor-pool stage: REAL pixel decode of PPM/BMP payloads.

    Codec dispatch tables build once per actor (``__init__``); each
    ``__call__`` decodes one small Arrow batch of binary rows into
    integer pixel statistics — width/height from the actual header,
    an order-sensitive pixel checksum, and floor-mean per channel.
    Every output is integer arithmetic over real decoded bytes, so a
    SQL oracle replays it exactly on synthetic gradient images."""

    def __init__(self, on_error: str = "raise"):
        from pdf_extractor_ray.kernel.imagecodec import (
            decode_image,
            pixel_checksum,
        )

        _check_on_error(on_error)
        self.on_error = on_error
        self._decode = decode_image
        self._checksum = pixel_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                px = self._decode(payload or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            h, w, _ = px.shape
            sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            n = h * w
            rows.append(
                {
                    "media_id": mid,
                    "width": w,
                    "height": h,
                    "checksum": self._checksum(px),
                    "mean_r": int(sums[0] // n),
                    "mean_g": int(sums[1] // n),
                    "mean_b": int(sums[2] // n),
                }
            )
        return pa.Table.from_pylist(rows, schema=PIXEL_DECODE_SCHEMA)


def image_decode(
    ds: ray.data.Dataset,
    batch_size: int = 16,
    concurrency=(1, 4),
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Real PPM/BMP pixel-decode actor pool over (media_id, payload)."""
    return ds.map_batches(
        ImagePixelDecoder,
        fn_constructor_kwargs={"on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


RESIZE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("payload", pa.binary()),
    ]
)


RESIZE_REAL_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("width", pa.int64()),
        pa.field("height", pa.int64()),
        pa.field("checksum", pa.int64()),
        pa.field("payload", pa.binary()),
    ]
)


class MediaResizer:
    """Actor-pool resize stage (decode -> scale -> re-encode).

    ``decoder="real"``: decode actual PPM/BMP pixels, resize with the
    exact integer box filter (aspect preserved via integer arithmetic:
    ``w = max(1, src_w * target // max(src_w, src_h))``), re-encode as
    PPM, and emit the order-sensitive pixel checksum — every value
    SQL-replayable on synthetic gradients.

    Fake path: output dims are the requested target box preserving the
    fake source aspect ratio, and the "re-encoded" payload is a
    deterministic digest-chain of the input bytes sized proportionally
    to the output area — so downstream size-based logic (chunking,
    batch sizing, skew bucketing) sees realistic byte volumes for
    formats the sandbox can't decode. ``strict`` raises (codec stub).
    """

    def __init__(self, target: int = 256, decoder: str = "fake",
                 on_error: str = "raise"):
        if decoder not in ("fake", "strict", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        _check_on_error(on_error)
        self.target = target
        self.decoder = decoder
        self.on_error = on_error
        if decoder == "real":
            from pdf_extractor_ray.kernel.imagecodec import (
                box_resize,
                decode_image,
                encode_ppm,
                pixel_checksum,
            )

            self._decode = decode_image
            self._resize = box_resize
            self._encode = encode_ppm
            self._checksum = pixel_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "strict":
            raise NotImplementedError(
                "image resizing requires PIL/libvips; use decoder='fake'"
            )
        if self.decoder == "real":
            rows = []
            for mid, payload in zip(
                batch["media_id"].to_pylist(), batch["payload"].to_pylist()
            ):
                try:
                    px = self._decode(payload or b"")
                except ValueError:
                    if self.on_error == "skip":
                        continue
                    raise
                sh, sw, _ = px.shape
                maxd = max(sw, sh)
                w = max(1, sw * self.target // maxd)
                h = max(1, sh * self.target // maxd)
                out = self._resize(px, w, h)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "checksum": self._checksum(out),
                        "payload": self._encode(out),
                    }
                )
            return pa.Table.from_pylist(rows, schema=RESIZE_REAL_SCHEMA)
        rows = []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            src_w, src_h = _fake_dims(payload)
            # integer-only scaling: exactly reproducible in ANSI SQL
            # (float scaling would invite last-ulp divergence vs the
            # DuckDB oracle)
            maxd = max(src_w, src_h)
            w = max(1, src_w * self.target // maxd)
            h = max(1, src_h * self.target // maxd)
            out_len = max(16, (w * h) // 8)  # ~realistic compressed size
            seed = hashlib.md5(payload).digest()
            reps = out_len // len(seed) + 1
            rows.append(
                {
                    "media_id": mid,
                    "width": w,
                    "height": h,
                    "payload": (seed * reps)[:out_len],
                }
            )
        return pa.Table.from_pylist(rows, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("frame_idx", pa.int32()),
        pa.field("frame_crc", pa.int64()),
    ]
)


class FrameSampler:
    """Actor-pool frame-sampling stage for video-like payloads.

    The in-batch explode (one media row -> every_n sampled frames)
    never leaves the task — the flat_map shape for media.

    ``decoder="real"``: REAL frame decode of YUV4MPEG2 (C444) payloads
    via ``kernel/videocodec.py`` — every every_n-th frame is parsed
    from actual container bytes and contributes the order-sensitive
    integer pixel checksum (SQL-replayable on synthetic gradients).
    Fake path: the payload is treated as a container of fixed-size
    virtual frames; each sampled frame contributes its byte-range crc
    (for compressed formats the sandbox can't decode). ``strict``
    raises (codec stub).
    """

    def __init__(self, every_n: int = 5, frame_bytes: int = 4096,
                 decoder: str = "fake", on_error: str = "raise"):
        if decoder not in ("fake", "strict", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        _check_on_error(on_error)
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        self.decoder = decoder
        self.on_error = on_error
        if decoder == "real":
            from pdf_extractor_ray.kernel.imagecodec import pixel_checksum
            from pdf_extractor_ray.kernel.videocodec import frame_iter_y4m

            self._frames = frame_iter_y4m
            self._checksum = pixel_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "strict":
            raise NotImplementedError(
                "frame extraction requires ffmpeg/pyav; use decoder='fake'"
            )
        if self.decoder == "real":
            rows = []
            for mid, payload in zip(
                batch["media_id"].to_pylist(), batch["payload"].to_pylist()
            ):
                # a mid-container truncation invalidates the whole
                # clip: buffer its rows, commit only on clean EOF
                clip_rows = []
                try:
                    for idx, frame in self._frames(payload or b""):
                        if idx % self.every_n:
                            continue
                        clip_rows.append(
                            {
                                "media_id": mid,
                                "frame_idx": idx,
                                "frame_crc": self._checksum(frame),
                            }
                        )
                except ValueError:
                    if self.on_error == "skip":
                        continue
                    raise
                rows.extend(clip_rows)
            return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)
        rows = []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            n_frames = max(1, len(payload) // self.frame_bytes)
            for idx in range(0, n_frames, self.every_n):
                chunk = payload[idx * self.frame_bytes:(idx + 1) * self.frame_bytes]
                rows.append(
                    {
                        "media_id": mid,
                        "frame_idx": idx,
                        "frame_crc": zlib.crc32(chunk),
                    }
                )
        return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)


def media_resize(ds, target: int = 256, batch_size: int = 16,
                 concurrency=(1, 4), decoder: str = "fake",
                 on_error: str = "raise"):
    """Resize actor pool over (media_id, payload) rows."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target": target, "decoder": decoder,
                               "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(ds, every_n: int = 5, batch_size: int = 8, concurrency=(1, 4),
                 decoder: str = "fake", on_error: str = "raise"):
    """Frame-sampling actor pool over (media_id, payload) rows."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "decoder": decoder,
                               "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("sample_rate", pa.int64()),
        pa.field("n_samples", pa.int64()),
        pa.field("duration_ms", pa.int64()),
        pa.field("peak", pa.int64()),
        pa.field("energy", pa.int64()),
        pa.field("zero_crossings", pa.int64()),
        pa.field("checksum", pa.int64()),
    ]
)


class AudioFeatureExtractor:
    """Actor-pool stage: REAL PCM decode of WAV payloads.

    The audio twin of ``ImagePixelDecoder``: sample rate and count come
    from the actual RIFF chunks, and every feature is integer
    arithmetic over the decoded int16 samples — duration in
    floor-milliseconds, peak |amplitude|, total energy (sum of
    squares; int64-safe to ~8.5e9 samples/clip), channel-0
    zero-crossing count (sign-bit transitions, the classic
    voiced/unvoiced heuristic), and the order-sensitive checksum — so
    a SQL oracle replays the stage exactly on synthetic waveforms."""

    def __init__(self, on_error: str = "raise"):
        from pdf_extractor_ray.kernel.audiocodec import (
            decode_wav,
            sample_checksum,
        )

        _check_on_error(on_error)
        self.on_error = on_error
        self._decode = decode_wav
        self._checksum = sample_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                s, rate = self._decode(payload or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            n = s.shape[0]
            s64 = s.astype(np.int64)
            nonneg = s[:, 0] >= 0
            rows.append(
                {
                    "media_id": mid,
                    "sample_rate": rate,
                    "n_samples": n,
                    "duration_ms": n * 1000 // rate,
                    "peak": int(np.abs(s64).max()) if n else 0,
                    "energy": int((s64 * s64).sum()),
                    "zero_crossings": int(
                        (nonneg[1:] != nonneg[:-1]).sum()
                    ),
                    "checksum": self._checksum(s),
                }
            )
        return pa.Table.from_pylist(rows, schema=AUDIO_FEATURE_SCHEMA)


def audio_features(
    ds: ray.data.Dataset, batch_size: int = 16, concurrency=(1, 4),
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Real WAV PCM-decode actor pool over (media_id, payload)."""
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


AUDIO_RESAMPLE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("out_rate", pa.int64()),
        pa.field("n_out", pa.int64()),
        pa.field("checksum", pa.int64()),
        pa.field("payload", pa.binary()),
    ]
)


class AudioResampler:
    """Actor-pool resample stage: decode WAV -> exact integer 1-D box
    filter to ``target_rate`` (``m = n * target_rate // src_rate``,
    min 1) -> re-encode WAV. The audio twin of the real
    ``MediaResizer`` path; every output value SQL-replayable."""

    def __init__(self, target_rate: int = 8000, on_error: str = "raise"):
        from pdf_extractor_ray.kernel.audiocodec import (
            box_resample,
            decode_wav,
            encode_wav,
            sample_checksum,
        )

        _check_on_error(on_error)
        self.on_error = on_error
        self.target_rate = target_rate
        self._decode = decode_wav
        self._encode = encode_wav
        self._resample = box_resample
        self._checksum = sample_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                s, rate = self._decode(payload or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            m = max(1, s.shape[0] * self.target_rate // rate)
            out = self._resample(s, m)
            rows.append(
                {
                    "media_id": mid,
                    "out_rate": self.target_rate,
                    "n_out": m,
                    "checksum": self._checksum(out),
                    "payload": self._encode(out, self.target_rate),
                }
            )
        return pa.Table.from_pylist(rows, schema=AUDIO_RESAMPLE_SCHEMA)


def audio_resample(
    ds: ray.data.Dataset,
    target_rate: int = 8000,
    batch_size: int = 16,
    concurrency=(1, 4),
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Resample actor pool over (media_id, payload) WAV rows."""
    return ds.map_batches(
        AudioResampler,
        fn_constructor_kwargs={"target_rate": target_rate,
                               "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


DHASH_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("dhash", pa.string()),
        pa.field("sig", pa.int64()),
    ]
)


class ImageDHasher:
    """Actor-pool stage: perceptual difference hash (dHash) over REAL
    decoded pixels — box-resize to 9x8, integer grayscale, 64
    horizontal-gradient bits. Emits both the 16-hex string (the
    human/SQL-friendly form) and the signature as an int64 bit pattern
    ready for :func:`pdf_extractor_ray.functions.dedup.hash64_pairs`
    banded near-dup pairing."""

    def __init__(self, on_error: str = "raise"):
        from pdf_extractor_ray.kernel.imagecodec import (
            decode_image,
            dhash_hex,
        )

        _check_on_error(on_error)
        self.on_error = on_error
        self._decode = decode_image
        self._dhash = dhash_hex

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                px = self._decode(payload or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            hx = self._dhash(px)
            # int64 bit pattern of the uint64 hash (hashes >= 2^63
            # must wrap, not overflow)
            sig = int(
                np.array([int(hx, 16)], dtype=np.uint64).view(np.int64)[0]
            )
            rows.append({"media_id": mid, "dhash": hx, "sig": sig})
        return pa.Table.from_pylist(rows, schema=DHASH_SCHEMA)


def image_dhash(
    ds: ray.data.Dataset,
    batch_size: int = 64,
    concurrency=(1, 4),
    on_error: str = "raise",
) -> ray.data.Dataset:
    """dHash actor pool over (media_id, payload) image rows."""
    return ds.map_batches(
        ImageDHasher,
        fn_constructor_kwargs={"on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
