"""Overlapping-window document chunking (functions/chunking.py)."""

import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.chunking import chunk_documents_batch


def _chunks(text, chunk_words=8, overlap=3):
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
    out = chunk_documents_batch(t, chunk_words=chunk_words, overlap=overlap)
    return out.to_pylist()


class TestChunking:
    def test_overlap_and_coverage(self):
        words = [f"w{i}" for i in range(20)]
        rows = _chunks(" ".join(words))  # stride 5
        assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
        assert rows[0]["chunk_text"].split() == words[0:8]
        assert rows[1]["chunk_text"].split() == words[5:13]
        # every consecutive pair shares exactly `overlap` words
        assert rows[0]["chunk_text"].split()[-3:] == rows[1]["chunk_text"].split()[:3]
        # full coverage: union of chunks == document words
        seen = []
        for r in rows:
            seen.extend(r["chunk_text"].split())
        assert set(seen) == set(words)

    def test_short_doc_single_chunk(self):
        rows = _chunks("a b c")
        assert len(rows) == 1
        assert rows[0]["n_words_chunk"] == 3

    def test_empty_doc_no_chunks(self):
        assert _chunks("") == []
        assert _chunks("   \n  ") == []

    def test_exact_multiple_no_phantom_chunk(self):
        # 10 words, stride 5 -> exactly 2 chunks (starts 0, 5)
        rows = _chunks(" ".join(f"w{i}" for i in range(10)))
        assert len(rows) == 2
        assert rows[1]["n_words_chunk"] == 5

    def test_invalid_overlap_raises(self):
        with pytest.raises(ValueError):
            _chunks("a b", chunk_words=5, overlap=5)

    def test_dataset_fingerprints(self, ray_session):
        from pdf_extractor_ray.functions.chunking import chunk_documents

        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": [" ".join(f"w{i}" for i in range(50)), "short doc"],
                }
            )
        )
        out = chunk_documents(
            ds, chunk_words=20, overlap=5, with_fingerprint=True
        ).to_pandas()
        import hashlib

        for _, r in out.iterrows():
            assert r["chunk_fp"] == hashlib.md5(
                r["chunk_text"].encode()
            ).hexdigest()


class TestSentenceSplit:
    def test_rule_edges(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.chunking import sentence_split

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "One. Two!! Three? tail no dot",
                    "!!!leading bare terminators. ok.",
                    "",
                    None,
                ],
            }
        )
        out = sentence_split(_ray.data.from_pandas(df)).to_pandas()
        d0 = out[out.doc_id == 0].sort_values("sent_idx")
        assert d0.sentence.tolist() == [
            "One.", "Two!!", "Three?", "tail no dot",
        ]
        assert d0.n_words.tolist() == [1, 1, 1, 3]
        d1 = out[out.doc_id == 1].sort_values("sent_idx")
        # leading bare terminators never form a sentence (contract)
        assert d1.sentence.tolist() == ["leading bare terminators.", "ok."]
        assert d1.sent_idx.tolist() == [0, 1]
        assert set(out.doc_id) == {0, 1}  # empty/None emit nothing
