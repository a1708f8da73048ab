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


class TestRepetitionStats:
    @staticmethod
    def _rep(text, **kw):
        from pdf_extractor_ray.functions.quality import repetition_stats_batch

        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
        out = repetition_stats_batch(t, **kw)
        return {c: out[c][0].as_py() for c in out.column_names}

    def test_repeated_bigram_dominates(self):
        r = self._rep("the cat sat on the cat sat here")
        # 'the cat' and 'cat sat' both appear twice (6 chars x 2 = 12 of
        # 24); 'the cat sat' x2 = 18/24
        assert r["top2_frac_c"] == 50
        assert r["top3_frac_c"] == 75
        assert r["rep_passes"] is False

    def test_unique_text_passes(self):
        r = self._rep("every single word appears exactly once in here")
        assert r["top2_frac_c"] == 0 and r["dup5_frac_c"] == 0
        assert r["rep_passes"] is True

    def test_duplicated_five_gram(self):
        phrase = "one two three four five"
        r = self._rep(f"{phrase} filler {phrase}")
        # the 5-gram repeats twice: 2 * 18 chars / (18+18+6)
        assert r["dup5_frac_c"] == round(2 * 18 / 42 * 100)
        assert r["rep_passes"] is False

    def test_empty_and_short_docs_zero(self):
        for t in ("", "one", "one two"):
            r = self._rep(t)
            assert r["dup5_frac_c"] == 0

    def test_threshold_override(self):
        r = self._rep("the cat sat on the cat sat here", max_top2=0.6, max_top3=0.8)
        assert r["rep_passes"] is True
