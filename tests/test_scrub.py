"""PII redaction and paragraph-level dedup (functions/scrub.py)."""

import pyarrow as pa

from pdf_extractor_ray.functions.scrub import redact_pii_batch


def _redact(text):
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
    out = redact_pii_batch(t)
    return {c: out[c][0].as_py() for c in out.column_names}


class TestRedactPii:
    def test_email(self):
        r = _redact("mail me at jane.doe+spam@sub.example.co.uk thanks")
        assert r["text"] == "mail me at <EMAIL> thanks"
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 0, 0)

    def test_phone(self):
        r = _redact("call +1 555 1234 now")
        assert "<PHONE>" in r["text"] and "555" not in r["text"]
        assert r["n_phones"] == 1

    def test_ipv4(self):
        r = _redact("server at 192.168.0.17 responded")
        assert r["text"] == "server at <IP> responded"
        assert r["n_ips"] == 1

    def test_email_not_half_eaten_by_phone(self):
        # digits@domain: email must win because it is replaced first
        r = _redact("contact 123 456 7890@example.com")
        assert r["n_emails"] == 1
        assert "@" not in r["text"]

    def test_clean_text_untouched(self):
        text = "no personal data in this perfectly ordinary sentence"
        r = _redact(text)
        assert r["text"] == text
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 0, 0)

    def test_multiple_occurrences_counted(self):
        r = _redact("a@b.io c@d.io 10.0.0.1 10.0.0.2")
        assert r["n_emails"] == 2 and r["n_ips"] == 2


class TestParagraphHashCounts:
    def test_finds_only_repeated_paragraphs(self, ray_session):
        from pdf_extractor_ray.functions.scrub import paragraph_hash_counts

        footer = "shared footer"
        docs = [
            f"unique body {i}" + ("\n\n" + footer if i % 2 == 0 else "")
            for i in range(20)
        ]
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(20)), pa.int64()),
                    "text": docs,
                }
            )
        ).repartition(4)
        out = paragraph_hash_counts(ds, min_count=2).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["n_docs"] == 10
        import hashlib

        assert out.iloc[0]["para_hash"] == hashlib.md5(footer.encode()).hexdigest()

    def test_empty_paragraphs_ignored(self, ray_session):
        from pdf_extractor_ray.functions.scrub import paragraph_hash_counts

        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": ["a\n\n\n\n \n\nb", "c\n\n \n\nd"],
                }
            )
        )
        out = paragraph_hash_counts(ds, min_count=2).to_pandas()
        # the whitespace-only paragraph must not count as repeated
        assert len(out) == 0


class TestStripBoilerplate:
    def test_detect_then_strip_roundtrip(self, ray_session):
        from pdf_extractor_ray.functions.scrub import (
            paragraph_hash_counts,
            strip_boilerplate,
        )

        footer = "cookie banner text"
        bodies = [
            f"unique body {i}" + ("\n\n" + footer if i % 2 == 0 else "")
            for i in range(20)
        ]

        def mk():
            return ray_session.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(list(range(20)), pa.int64()),
                        "text": bodies,
                    }
                )
            ).repartition(4)

        inv = paragraph_hash_counts(mk(), min_count=2)
        out = strip_boilerplate(mk(), inv).to_pandas().sort_values("doc_id")
        assert out["n_removed"].tolist() == [1 if i % 2 == 0 else 0 for i in range(20)]
        assert out["text"].tolist() == [f"unique body {i}" for i in range(20)]

    def test_empty_inventory_is_identity(self, ray_session):
        import pandas as pd

        from pdf_extractor_ray.functions.scrub import strip_boilerplate

        ds = ray_session.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([1], pa.int64()), "text": ["a\n\nb"]}
            )
        )
        inv = ray_session.data.from_pandas(
            pd.DataFrame({"para_hash": pd.Series([], dtype="str")})
        )
        out = strip_boilerplate(ds, inv).to_pandas()
        assert out.iloc[0]["text"] == "a\n\nb" and out.iloc[0]["n_removed"] == 0


class TestBoundedInventory:
    def test_max_inventory_keeps_exact_top_n(self, ray_session):
        """Degenerate all-repeated corpus: the inventory is bounded to
        EXACTLY max_inventory rows — the most-repeated paragraphs — so
        the strip_boilerplate broadcast can never scale with the
        number of distinct repeated paragraphs."""
        from pdf_extractor_ray.functions.scrub import paragraph_hash_counts

        docs = []
        for i in range(30):
            parts = [f"unique body {i}", "mega common"]  # 30x
            if i < 20:
                parts.append("common twenty")  # 20x
            if i < 10:
                parts.append("common ten")  # 10x
            docs.append("\n\n".join(parts))
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(30)), pa.int64()),
                    "text": docs,
                }
            )
        ).repartition(4)
        inv = paragraph_hash_counts(ds, min_count=2, max_inventory=2).to_pandas()
        assert len(inv) == 2
        import hashlib

        got = set(inv["para_hash"])
        assert got == {
            hashlib.md5(b"mega common").hexdigest(),
            hashlib.md5(b"common twenty").hexdigest(),
        }
        assert sorted(inv["n_docs"].tolist(), reverse=True) == [30, 20]

    def test_unbounded_matches_bounded_when_cap_does_not_bind(self, ray_session):
        from pdf_extractor_ray.functions.scrub import paragraph_hash_counts

        docs = [
            "body %d\n\nshared footer" % i if i % 2 == 0 else "body %d" % i
            for i in range(12)
        ]
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(12)), pa.int64()),
                    "text": docs,
                }
            )
        )
        a = paragraph_hash_counts(ds, min_count=2).to_pandas()
        b = paragraph_hash_counts(ds, min_count=2, max_inventory=100).to_pandas()
        pd_sort = lambda d: d.sort_values("para_hash").reset_index(drop=True)
        assert pd_sort(a).equals(pd_sort(b))


class TestLuhnCards:
    def test_luhn_known_vectors(self):
        from pdf_extractor_ray.functions.scrub import luhn_valid

        for good in ("4532015112830366", "5425233430109903",
                     "374245455400126", "79927398713"):
            assert luhn_valid(good), good
        for bad in ("4532015112830367", "5425233430109904",
                    "374245455400127", "79927398710"):
            assert not luhn_valid(bad), bad

    def test_redact_only_valid_and_groupings(self):
        import pyarrow as pa
        from pdf_extractor_ray.functions.scrub import redact_cards_batch

        texts = [
            "pay 4532015112830366 now",            # valid plain
            "pay 4532 0151 1283 0366 now",          # valid spaced
            "pay 4532-0151-1283-0366 now",          # valid hyphen
            "pay 3742 454554 00126 now",            # valid amex 4-6-5
            "pay 4532015112830367 now",             # broken check digit
            "order 123456789012 id",                # 12 digits: too short
            "no digits at all",
        ]
        out = redact_cards_batch(pa.table({"text": texts}))
        got = out["text"].to_pylist()
        n = out["n_cards"].to_pylist()
        assert got[:4] == ["pay <CARD> now"] * 4 and n[:4] == [1] * 4
        assert got[4:] == texts[4:] and n[4:] == [0, 0, 0]

    def test_multiple_cards_one_row(self):
        import pyarrow as pa
        from pdf_extractor_ray.functions.scrub import redact_cards_batch

        out = redact_cards_batch(
            pa.table({"text": ["a 4532015112830366 b 374245455400126 c"]})
        )
        assert out["text"].to_pylist() == ["a <CARD> b <CARD> c"]
        assert out["n_cards"].to_pylist() == [2]


class TestPiiSpans:
    def test_offsets_overlap_ownership_and_codepoints(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.scrub import pii_spans

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    # café before the IP: byte offsets would be +1 off
                    "x café a@b.co and 10.1.2.3 end",
                    # phone digits inside an email must NOT double-claim
                    "mail 555-123-4567@ex.org only",
                    "",
                ],
            }
        )
        out = pii_spans(_ray.data.from_pandas(df)).to_pandas()
        d0 = out[out.doc_id == 0].sort_values("span_idx")
        t0 = df.text[0]
        for _, r in d0.iterrows():
            seg = t0[int(r.start_cp):int(r.end_cp)]
            if r.kind == "email":
                assert seg == "a@b.co"
            if r.kind == "ip":
                assert seg == "10.1.2.3"
        assert set(d0.kind) == {"email", "ip"}
        d1 = out[out.doc_id == 1]
        # the email claims the span; no phone row overlaps it
        assert d1.kind.tolist() == ["email"]
        seg = df.text[1][int(d1.start_cp.iloc[0]):int(d1.end_cp.iloc[0])]
        assert seg == "555-123-4567@ex.org"
        assert 2 not in set(out.doc_id)
