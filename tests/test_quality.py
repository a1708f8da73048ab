"""Gopher-style quality gate (functions/quality.py)."""

import pyarrow as pa

from pdf_extractor_ray.functions.quality import gopher_stats_batch


def _stats(text, **kw):
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
    out = gopher_stats_batch(t, **kw)
    return {c: out[c][0].as_py() for c in out.column_names}


class TestGopherStats:
    def test_clean_document_passes(self):
        text = (
            "the quick brown fox jumps over the lazy dog and that "
            "sentence continues with plenty of normal english words "
        ) * 5
        s = _stats(text)
        assert s["passes"] is True
        assert s["n_words"] >= 50
        assert 300 <= s["mean_word_len_c"] <= 1000
        assert s["alpha_frac_c"] == 100
        assert s["n_stopwords"] >= 2

    def test_short_document_fails_word_floor(self):
        s = _stats("the and of that have with words here")
        assert s["passes"] is False and s["n_words"] < 50

    def test_numeric_soup_fails_alpha_fraction(self):
        text = " ".join(str(i) for i in range(200)) + " the and of"
        s = _stats(text)
        assert s["alpha_frac_c"] < 80
        assert s["passes"] is False

    def test_duplicate_lines_fraction(self):
        line = "the same exact line with and of that words repeated"
        text = "\n".join([line] * 9 + ["one unique closing line of the text"])
        s = _stats(text)
        # 10 lines, 2 distinct -> dup fraction 0.8
        assert s["dup_line_frac_c"] == 80
        assert s["passes"] is False

    def test_empty_and_whitespace_docs_are_zero_not_nan(self):
        for t in ("", "   \n\t  "):
            s = _stats(t)
            assert s["n_words"] == 0
            assert s["mean_word_len_c"] == 0
            assert s["alpha_frac_c"] == 0
            assert s["dup_line_frac_c"] == 0
            assert s["passes"] is False

    def test_stopword_distinctness_not_frequency(self):
        s = _stats("the " * 100)
        assert s["n_stopwords"] == 1

    def test_threshold_overrides(self):
        text = "plain words " * 30  # 60 words, no stop-words
        assert _stats(text)["passes"] is False
        assert _stats(text, min_stopwords=0)["passes"] is True

    def test_long_word_mean_length_bound(self):
        s = _stats(("antidisestablishmentarianism " * 60) + "the and")
        assert s["mean_word_len_c"] > 1000
        assert s["passes"] is False
