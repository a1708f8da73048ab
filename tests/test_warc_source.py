"""WARC source (sources/warc.py): writer→parser round trip, gzip
members, record-type filtering, truncation tolerance, and the Ray
Datasource lane."""

import gzip
import hashlib
import io
import os

import pyarrow as pa
import pytest

from pdf_extractor_ray.sources.warc import (
    WARC_SCHEMA,
    _iter_records,
    read_warc,
    write_warc,
)


def _docs(n=7):
    return [(i, f"body text number {i} with some words") for i in range(n)]


class TestRoundTrip:
    def test_plain_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.warc")
        write_warc(p, _docs())
        recs = list(_iter_records(open(p, "rb")))
        assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["response"] * 7
        for i, r in enumerate(recs[1:]):
            assert r["url"] == f"https://warc.example.com/doc/{i}"
            assert r["http_status"] == 200
            assert r["body"] == f"body text number {i} with some words".encode()
            assert r["truncated"] is False
            # payload = http headers + body
            assert r["payload_len"] > len(r["body"])

    def test_gzip_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.warc.gz")
        write_warc(p, _docs(3), compress=True)
        recs = list(_iter_records(gzip.open(p, "rb")))
        assert len(recs) == 4
        assert recs[2]["body"] == b"body text number 1 with some words"

    def test_multi_member_gzip(self, tmp_path):
        # Common Crawl style: concatenated gzip members
        a, b = io.BytesIO(), io.BytesIO()
        p1, p2 = str(tmp_path / "m1.warc"), str(tmp_path / "m2.warc")
        write_warc(p1, _docs(2))
        write_warc(p2, [(9, "late member body")])
        merged = gzip.compress(open(p1, "rb").read(), mtime=0) + gzip.compress(
            open(p2, "rb").read(), mtime=0
        )
        p = str(tmp_path / "cat.warc.gz")
        open(p, "wb").write(merged)
        recs = list(_iter_records(gzip.open(p, "rb")))
        assert [r["url"] for r in recs if r["warc_type"] == "response"] == [
            "https://warc.example.com/doc/0",
            "https://warc.example.com/doc/1",
            "https://warc.example.com/doc/9",
        ]

    def test_truncated_final_record_flagged_not_raised(self, tmp_path):
        p = str(tmp_path / "t.warc")
        write_warc(p, _docs(2))
        raw = open(p, "rb").read()
        chopped = raw[: len(raw) - 25]  # cut into the last payload
        recs = list(_iter_records(io.BytesIO(chopped)))
        assert len(recs) == 3
        assert recs[-1]["truncated"] is True
        assert recs[-2]["truncated"] is False

    def test_non_http_payload_passthrough(self):
        recs = list(
            _iter_records(
                io.BytesIO(
                    b"WARC/1.0\r\nWARC-Type: metadata\r\n"
                    b"Content-Type: application/json\r\n"
                    b"Content-Length: 2\r\n\r\n{}\r\n\r\n"
                )
            )
        )
        assert recs[0]["http_status"] is None
        assert recs[0]["body"] == b"{}"

    def test_unicode_body_utf8(self, tmp_path):
        p = str(tmp_path / "u.warc")
        write_warc(p, [(1, "café — naïve")])
        recs = list(_iter_records(open(p, "rb")))
        assert recs[1]["body"].decode("utf-8") == "café — naïve"
        # Content-Length counted bytes, not chars
        assert recs[1]["truncated"] is False


class TestRayLane:
    def test_read_warc_dataset(self, ray_session, tmp_path):
        for part in range(3):
            gz = part % 2 == 0
            write_warc(
                str(tmp_path / (f"p{part}.warc" + (".gz" if gz else ""))),
                [(part * 10 + j, f"text {part} {j}") for j in range(4)],
                compress=gz,
            )
        # mixed .warc / .warc.gz extensions in one directory read
        ds = read_warc(str(tmp_path))
        t = ds.to_pandas()
        assert len(t) == 15  # 3 warcinfo + 12 responses
        assert set(ds.schema().names) == set(WARC_SCHEMA.names)
        resp = t[t.warc_type == "response"]
        assert sorted(resp.url) == sorted(
            f"https://warc.example.com/doc/{p * 10 + j}"
            for p in range(3)
            for j in range(4)
        )

    def test_ray_lane_reads_multi_member_gz(self, ray_session, tmp_path):
        """Per-record gzip members (the Common Crawl layout). Arrow's
        'detect' decompression stops at the first member — this pins
        the raw-bytes _open_input_source override."""
        p1, p2 = str(tmp_path / "m1.warc"), str(tmp_path / "m2.warc")
        write_warc(p1, _docs(2))
        write_warc(p2, [(9, "late member body")])
        merged = gzip.compress(open(p1, "rb").read(), mtime=0) + gzip.compress(
            open(p2, "rb").read(), mtime=0
        )
        p = str(tmp_path / "cat.warc.gz")
        open(p, "wb").write(merged)
        t = read_warc(p, warc_types=("response",)).to_pandas()
        assert sorted(t.url) == [
            "https://warc.example.com/doc/0",
            "https://warc.example.com/doc/1",
            "https://warc.example.com/doc/9",
        ]

    def test_warc_types_filter_drops_payload_early(self, ray_session, tmp_path):
        write_warc(str(tmp_path / "f.warc"), _docs(5))
        ds = read_warc(str(tmp_path / "f.warc"), warc_types=("response",))
        t = ds.to_pandas()
        assert len(t) == 5
        assert (t.warc_type == "response").all()
