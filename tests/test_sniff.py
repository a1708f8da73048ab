"""Charset sniffing / content-type detection kernel (kernel/sniff.py).

Priority cascade: magic numbers > BOM > meta declaration > utf-8 with
latin-1 fallback (the reference's rule, corpus_utils.py:150-156).
"""

from pdf_extractor_ray.kernel.sniff import sniff_payload


class TestMagic:
    def test_pdf_png_gif_zip(self):
        for data, want in (
            (b"%PDF-1.4\nxx", "application/pdf"),
            (b"\x89PNG\r\n\x1a\n123", "image/png"),
            (b"GIF89a....", "image/gif"),
            (b"PK\x03\x04....", "application/zip"),
        ):
            r = sniff_payload(data)
            assert (r.content_type, r.charset, r.text) == (want, "", "")

    def test_empty(self):
        for data in (b"", None):
            r = sniff_payload(data)
            assert r.content_type == "application/octet-stream"


class TestBom:
    def test_utf8_bom_stripped_and_beats_meta(self):
        s = '<html><head><meta charset="iso-8859-1"></head><body>é</body></html>'
        r = sniff_payload(b"\xef\xbb\xbf" + s.encode("utf-8"))
        assert r.charset == "utf-8"
        assert r.text == s  # BOM not in text, bytes decoded as utf-8
        assert r.content_type == "text/html"

    def test_utf16_both_endians(self):
        s = "<html><body>café</body></html>"
        le = sniff_payload(b"\xff\xfe" + s.encode("utf-16-le"))
        be = sniff_payload(b"\xfe\xff" + s.encode("utf-16-be"))
        assert (le.charset, le.text) == ("utf-16-le", s)
        assert (be.charset, be.text) == ("utf-16-be", s)


class TestMetaDeclaration:
    def test_cp1252_smart_quotes_require_detection(self):
        s = '<html><head><meta charset="windows-1252"></head><body>“q”</body></html>'
        r = sniff_payload(s.encode("windows-1252"))
        assert r.charset == "windows-1252"
        assert r.text == s  # 0x93/0x94 decoded as smart quotes, not C1

    def test_http_equiv_form(self):
        s = (
            '<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=ISO-8859-1"></head>'
            "<body>caf\xe9</body></html>"
        )
        r = sniff_payload(s.encode("latin-1"))
        assert r.charset == "latin-1"
        assert "café" in r.text

    def test_mislabeled_charset_falls_through(self):
        # declares latin-1 but the alias table has no entry for the
        # label -> fallback; and a declared codec that fails to decode
        # also falls back to utf-8
        s = '<html><head><meta charset="bogus-charset"></head><body>x</body></html>'
        r = sniff_payload(s.encode("utf-8"))
        assert r.charset == "utf-8"

    def test_declared_ascii(self):
        s = '<html><head><meta charset=us-ascii></head><body>x</body></html>'
        r = sniff_payload(s.encode("ascii"))
        assert r.charset == "us-ascii"


class TestFallback:
    def test_plain_utf8_text(self):
        r = sniff_payload("just words café".encode("utf-8"))
        assert (r.content_type, r.charset) == ("text/plain", "utf-8")

    def test_invalid_utf8_falls_to_latin1(self):
        r = sniff_payload(b"caf\xe9 plain")
        assert (r.charset, r.text) == ("latin-1", "café plain")

    def test_html_tag_without_doctype_is_html(self):
        r = sniff_payload(b"some <p>tagged</p> body")
        assert r.content_type == "text/html"


class TestSniffBodiesPassthrough:
    def test_emit_text_and_extra_columns(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pdf_extractor_ray.functions.webclean import sniff_bodies

        s = "plain café text"
        ds = ray.data.from_arrow(pa.table({
            "doc_id": [7],
            "url": ["https://x.example/a"],
            "html": pa.array([b"\xef\xbb\xbf" + s.encode("utf-8")],
                             pa.binary()),
        }))
        df = sniff_bodies(ds, emit_text=True).to_pandas()
        r = df.iloc[0]
        assert r.doc_id == 7 and r.url == "https://x.example/a"
        assert (r.charset, r.text) == ("utf-8", s)
        assert "html" not in df.columns
