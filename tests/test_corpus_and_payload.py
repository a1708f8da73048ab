"""Corpus generator determinism + payload routing (FIXTURES.md F1/F4)."""

import json

from pdf_extractor_ray.kernel.extract import extract_document
from pdf_extractor_ray.kernel.payload import route_payload
from pdf_extractor_ray.sources.corpus import make_page_row, pages_table


class TestRouting:
    def test_empty(self):
        assert route_payload(b"").kind == "empty"
        assert route_payload(None).kind == "empty"
        assert route_payload(b"   \n ").kind == "empty"

    def test_html_doctype(self):
        assert route_payload(b"<!DOCTYPE html><html></html>").kind == "html"

    def test_html_tag_sniff(self):
        assert route_payload(b"<div>hi</div>").kind == "html"

    def test_pdf_shaped(self):
        raw = json.dumps({"kind": "pdf", "pages": []}).encode()
        assert route_payload(raw).kind == "pdf"

    def test_generic_json(self):
        r = route_payload(b'{"a": [1, 2]}')
        assert r.kind == "json"
        assert r.json_obj == {"a": [1, 2]}

    def test_plain_text(self):
        assert route_payload("just text café".encode()).kind == "text"

    def test_latin1_bytes(self):
        raw = "série".encode("latin-1")
        r = route_payload(raw)
        assert r.kind == "text"
        assert r.text == "série"

    def test_broken_json_falls_through_to_text(self):
        assert route_payload(b"{not json").kind == "text"


class TestLoaderMatrix:
    """Port of the corpus_utils 12-case table (FIXTURES.md F4)."""

    def test_json_pretty_dumped(self):
        obj = {"b": 1, "a": [1, 2]}
        out = extract_document("u", "t", json.dumps(obj).encode(), "", "en")
        assert out["kind"] == "json"
        assert out["extracted_text"] == json.dumps(obj, indent=2, ensure_ascii=False)

    def test_empty_payload_not_error(self):
        out = extract_document("u", "t", b"", "", "en")
        assert out["status"] == "ok"
        assert out["kind"] == "empty"
        assert out["n_elements"] == 0

    def test_empty_payload_with_text_column(self):
        out = extract_document("u", "t", b"", "pre-extracted text", "en")
        assert out["kind"] == "text"
        assert out["extracted_text"] == "pre-extracted text"

    def test_latin1_fallback(self):
        raw = "Vallée: série à thème".encode("latin-1")
        out = extract_document("u", "t", raw, "", "fr")
        assert out["status"] == "ok"
        assert "Vallée" in out["extracted_text"]

    def test_markdown_identity_lane(self):
        out = extract_document("u", "t", b"# h\n\npara", "", "en")
        assert out["n_heading"] == 1
        assert out["n_text"] == 1


class TestCorpusGenerator:
    def test_row_deterministic(self):
        a = make_page_row(123)
        b = make_page_row(123)
        assert a == b

    def test_batch_independent(self):
        t1 = pages_table(0, 50)
        t2 = pages_table(25, 50)
        assert t1.slice(25, 25).to_pylist() == t2.to_pylist()

    def test_kind_mix(self):
        kinds = {}
        for i in range(100):
            row = make_page_row(i)
            out = extract_document(
                row["url"], row["warc_ts"], row["html"], row["text"], row["lang"]
            )
            kinds[out["kind"]] = kinds.get(out["kind"], 0) + 1
            assert out["status"] == "ok", out["error"]
        assert kinds.get("html", 0) >= 60
        assert kinds.get("pdf", 0) == 20

    def test_script_never_leaks(self):
        for i in range(0, 70, 7):
            row = make_page_row(i)
            out = extract_document(
                row["url"], row["warc_ts"], row["html"], row["text"], row["lang"]
            )
            assert f"tracker-{i}" not in out["extracted_text"]

    def test_pdf_merge_parity(self):
        # even pdf rows: identical headers across pages -> merged table
        row = make_page_row(8)
        out = extract_document(
            row["url"], row["warc_ts"], row["html"], row["text"], row["lang"]
        )
        recs = [
            json.loads(e["metadata_json"]).get("record")
            for e in out["elements"]
            if e["type"] == "table"
        ]
        assert any(r and r["is_multi_page"] for r in recs)

    def test_giant_row_exists(self):
        row = make_page_row(39)  # i%10==9, (i//10)%4==3 -> giant
        assert len(row["html"]) > 500_000
