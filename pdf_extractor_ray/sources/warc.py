"""WARC web-archive source for Ray Data.

The raw input of every web-text pipeline is WARC (ISO 28500 — the
format Common Crawl publishes). The reference engine ingests already-
extracted per-page parquet (`/root/reference/src/pdf_extractor/`
never touches crawl archives), so this is a corpus-scale extension
source (SURVEY.md §8.4): it turns `.warc` / `.warc.gz` files into a
``ray.data.Dataset`` of one row per record, streaming — a read task
never holds more than one output batch of payloads in memory.

Ray shape: ``FileBasedDatasource`` subclass → files are the natural
shards (Common Crawl segments are ~1 GiB each), Ray schedules one read
task per file group, and downstream ``map_batches`` stages pipeline
against the read. Gzip members decompress inside the read task
(Python's gzip handles the per-record concatenated members WARC uses),
so only parsed Arrow blocks enter the object store.

Writer + parser are both here so tests and the driver query can
round-trip deterministically without any external archive.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource

__all__ = ["WarcDatasource", "read_warc", "write_warc", "WARC_SCHEMA"]

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_type", pa.string()),
        ("warc_date", pa.string()),
        ("record_id", pa.string()),
        ("content_type", pa.string()),
        ("http_status", pa.int32()),
        ("body", pa.binary()),
        ("payload_len", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)

_CRLF = b"\r\n"
# flush an output block once accumulated bodies reach this many bytes —
# keeps blocks bounded regardless of record sizes (a 100 MiB video
# payload still yields, alone, in its own block)
_BATCH_BYTES = 8 << 20
_BATCH_RECORDS = 256


class _LineReader:
    """Buffered reader over a raw ``read(n)``-only stream: exact-size
    reads plus CRLF line reads, no seeking (works on gzip + pyarrow
    NativeFile alike)."""

    def __init__(self, raw, chunk: int = 1 << 16):
        self._raw = raw
        self._chunk = chunk
        self._buf = bytearray()

    def _fill(self) -> bool:
        data = self._raw.read(self._chunk)
        if not data:
            return False
        self._buf += data
        return True

    def readline(self) -> bytes | None:
        """One CRLF-terminated line without the terminator; None at EOF."""
        while True:
            i = self._buf.find(_CRLF)
            if i >= 0:
                line = bytes(self._buf[:i])
                del self._buf[: i + 2]
                return line
            if not self._fill():
                if not self._buf:
                    return None
                line = bytes(self._buf)  # unterminated tail
                self._buf.clear()
                return line

    def read_exact(self, n: int) -> bytes:
        """Up to n bytes (short only at EOF)."""
        while len(self._buf) < n and self._fill():
            pass
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def _parse_http_payload(payload: bytes) -> tuple[int | None, bytes]:
    """Split an application/http payload into (status, body); payloads
    that don't start with an HTTP status line pass through whole."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, payload
    try:
        status = int(head.split(None, 2)[1])
    except (IndexError, ValueError):
        return None, payload
    return status, body


def _iter_records(stream) -> Iterator[dict]:
    """Parse one WARC stream into record dicts. A record truncated by
    EOF is still emitted, flagged ``truncated=True`` — at 100 TB a
    chopped final record per shard is data, not an exception."""
    r = _LineReader(stream)
    while True:
        # skip inter-record blank lines, find the version line
        line = r.readline()
        if line is None:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            # garbage between records: scan forward to the next header
            continue
        headers: dict[str, str] = {}
        while True:
            h = r.readline()
            if h is None or not h:
                break
            name, _, value = h.partition(b":")
            headers[name.decode("latin-1").strip().lower()] = value.decode(
                "latin-1"
            ).strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = 0
        payload = r.read_exact(length)
        ctype = headers.get("content-type", "")
        if ctype.startswith("application/http"):
            status, body = _parse_http_payload(payload)
        else:
            status, body = None, payload
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_type": headers.get("warc-type", ""),
            "warc_date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "content_type": ctype,
            "http_status": status,
            "body": body,
            "payload_len": len(payload),
            "truncated": len(payload) < length,
        }


def _records_to_table(recs: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(recs, schema=WARC_SCHEMA)


class WarcDatasource(FileBasedDatasource):
    """One row per WARC record; see WARC_SCHEMA. ``warc_types`` filters
    at the parser (e.g. ("response",) skips request/metadata records
    before their payloads ever reach an Arrow block)."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, *, warc_types: tuple[str, ...] | None = None, **kw):
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS, **kw)
        self._warc_types = tuple(warc_types) if warc_types else None

    def _open_input_source(self, filesystem, path, **open_args):
        """Open RAW bytes — the base class would hand Arrow's gzip
        stream for ``.gz`` paths, but WARC gzips each record as its own
        member and zlib-style streaming stops at the first member
        boundary; Python's gzip reads concatenated members, so the
        decompression happens in ``_read_stream`` instead."""
        buffer_size = open_args.pop("buffer_size", None)
        if buffer_size is None:
            buffer_size = self._data_context.streaming_read_buffer_size
        open_args.pop("compression", None)
        # compression=None, NOT the pyarrow default 'detect' — detect
        # would transparently gunzip and stop at the first member
        return filesystem.open_input_stream(
            path, buffer_size=buffer_size, compression=None, **open_args
        )

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        stream = (
            gzip.GzipFile(fileobj=io.BufferedReader(_Raw(f)))
            if path.endswith(".gz")
            else f
        )
        batch: list[dict] = []
        nbytes = 0
        for rec in _iter_records(stream):
            if self._warc_types and rec["warc_type"] not in self._warc_types:
                continue
            batch.append(rec)
            nbytes += rec["payload_len"]
            if len(batch) >= _BATCH_RECORDS or nbytes >= _BATCH_BYTES:
                yield _records_to_table(batch)
                batch, nbytes = [], 0
        if batch:
            yield _records_to_table(batch)


class _Raw(io.RawIOBase):
    """Minimal RawIOBase over a pyarrow NativeFile so BufferedReader /
    GzipFile can wrap it."""

    def __init__(self, f):
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._f.read(len(b))
        n = len(data)
        b[:n] = data
        return n


def read_warc(paths, *, warc_types: tuple[str, ...] | None = None, **kw):
    """``ray.data`` entry point: Dataset of WARC records."""
    import ray.data

    return ray.data.read_datasource(
        WarcDatasource(paths, warc_types=warc_types), **kw
    )


# ------------------------------------------------------------- writer


def _record_bytes(
    warc_type: str,
    *,
    url: str | None,
    date: str,
    record_id: str,
    content_type: str,
    payload: bytes,
) -> bytes:
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
    ]
    if url is not None:
        h.append(b"WARC-Target-URI: " + url.encode())
    h += [
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return _CRLF.join(h) + _CRLF * 2 + payload + _CRLF * 2


def _http_response(body: bytes, content_type: str = "text/plain") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + content_type.encode()
        + b"\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )


def write_warc(
    path: str,
    docs: list[tuple[int, str]],
    *,
    compress: bool = False,
    date: str = "2026-01-01T00:00:00Z",
) -> None:
    """One WARC file: a warcinfo record then one HTTP response record
    per (doc_id, text); url is ``https://warc.example.com/doc/<id>``.
    Deterministic given its inputs (fixed date, ids derived from
    doc_id) so oracles can recompute every parsed field."""
    out = io.BytesIO()
    out.write(
        _record_bytes(
            "warcinfo",
            url=None,
            date=date,
            record_id="<urn:uuid:00000000-0000-0000-0000-000000000000>",
            content_type="application/warc-fields",
            payload=b"software: pdf-extractor-ray-warc-writer\r\n",
        )
    )
    for doc_id, text in docs:
        out.write(
            _record_bytes(
                "response",
                url=f"https://warc.example.com/doc/{doc_id}",
                date=date,
                record_id=f"<urn:uuid:{doc_id:032x}>",
                content_type="application/http; msgtype=response",
                payload=_http_response((text or "").encode("utf-8")),
            )
        )
    raw = out.getvalue()
    if compress:
        raw = gzip.compress(raw, mtime=0)
    with open(path, "wb") as fh:
        fh.write(raw)
