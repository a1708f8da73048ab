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


class TestScriptStats:
    def test_dominant_script_per_branch(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.textstats import script_counts_batch

        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "text": pa.array(
                    [
                        "plain english text",
                        "русский текст про dataset",   # cyrillic-dominant
                        "日本語のテキストです",            # cjk
                        "نص عربي قصير",                 # arabic (latin 0)
                        "1234 :-) 5678",                # none
                        "λλ ab",                        # tie 2-2 -> latin wins
                    ],
                    pa.string(),
                ),
            }
        )
        out = script_counts_batch(batch).to_pandas().set_index("doc_id")
        assert out.loc[1, "script"] == "latin"
        assert out.loc[2, "script"] == "cyrillic"
        assert out.loc[3, "script"] == "cjk"
        assert out.loc[4, "script"] == "arabic"
        assert out.loc[5, "script"] == "none"
        assert out.loc[6, "script"] == "latin"
        assert int(out.loc[2, "n_cyrillic"]) > int(out.loc[2, "n_latin"]) > 0

    def test_matches_duck_case_replay(self, ray_session):
        import duckdb
        import pandas as pd

        import ray.data

        from pdf_extractor_ray.functions.textstats import script_counts_batch

        sf = "/root/testdata/sf0.001"
        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        got = (
            docs.map_batches(script_counts_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "script"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{sf}/documents.parquet')"
        )
        want = con.execute(
            "WITH c AS (SELECT doc_id, "
            "len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) AS latin, "
            "len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS cyrillic, "
            "len(regexp_extract_all(text, '[Ͱ-Ͽ]')) AS greek, "
            "len(regexp_extract_all(text, '[一-鿿぀-ヿ]')) AS cjk, "
            "len(regexp_extract_all(text, '[؀-ۿ]')) AS arabic FROM documents) "
            "SELECT doc_id, CASE "
            "WHEN latin=0 AND cyrillic=0 AND greek=0 AND cjk=0 AND arabic=0 THEN 'none' "
            "WHEN latin >= cyrillic AND latin >= greek AND latin >= cjk AND latin >= arabic THEN 'latin' "
            "WHEN cyrillic >= greek AND cyrillic >= cjk AND cyrillic >= arabic THEN 'cyrillic' "
            "WHEN greek >= cjk AND greek >= arabic THEN 'greek' "
            "WHEN cjk >= arabic THEN 'cjk' ELSE 'arabic' END AS script "
            "FROM c ORDER BY doc_id"
        ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestLexiconHits:
    def test_boundary_case_and_counts(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pdf_extractor_ray.functions.quality import lexicon_hits

        ds = ray.data.from_arrow(pa.table({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "clean text nothing here",
                "one Zorblex mention",                      # case-insensitive
                "zorblex then quimvat twice zorblex",       # 3 hits, 2 terms
                "zorblexify embedded does not count",       # boundary
            ],
        }))
        df = (
            lexicon_hits(ds, ["zorblex", "quimvat"], flag_threshold=2)
            .to_pandas().sort_values("doc_id")
        )
        assert df["n_hits"].tolist() == [0, 1, 3, 0]
        assert df["n_terms"].tolist() == [0, 1, 2, 0]
        assert df["flagged"].tolist() == [0, 0, 1, 0]


class TestReadabilityScores:
    def test_known_text_and_edges(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.quality import readability_scores

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "The cat sat. The dog ran!",  # 6 words, 2 sents
                    "",                            # wordless
                    "rhythm gym",                  # y-vowels, no [.!?]
                ],
            }
        )
        out = (
            readability_scores(_ray.data.from_pandas(df))
            .to_pandas()
            .set_index("doc_id")
        )
        r0 = out.loc[0]
        assert int(r0.n_words) == 6 and int(r0.n_sents) == 2
        # syllables: the=1 cat=1 sat=1 the=1 dog=1 ran=1 -> 6
        assert int(r0.n_syll) == 6
        want = 206_835 - (1_015 * 6) // 2 - (84_600 * 6) // 6
        assert int(r0.fre_m) == want
        assert out.loc[1].tolist() == [0, 0, 0, 0]
        r2 = out.loc[2]
        # rhythm: runs 'y' -> 1; gym: 'y' -> 1; sentences floor to 1
        assert int(r2.n_syll) == 2 and int(r2.n_sents) == 1


class TestGarbledStats:
    def _one(self, text):
        import pyarrow as pa

        from pdf_extractor_ray.functions.quality import garbled_stats_batch

        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
        out = garbled_stats_batch(t)
        return {c: out[c][0].as_py() for c in out.column_names}

    def test_clean_text_is_all_zero(self):
        s = self._one("the quick brown fox jumps over a lazy dog")
        assert (s["n_mixed"], s["n_consrun"], s["n_repl"], s["n_nonascii"]) == (
            0, 0, 0, 0,
        )
        assert s["n_words"] == 9

    def test_mixed_alnum_counts_maximal_runs_once(self):
        # one token with several switches still counts once; pure-digit
        # and pure-letter tokens never count
        s = self._one("a1b2c3 hello 12345 l0rem")
        assert s["n_mixed"] == 2

    def test_consonant_run_maximal_munch(self):
        # a 10-consonant run is ONE artifact, not six overlapping ones
        s = self._one("bcdfghjklm ok zzzzz")
        assert s["n_consrun"] == 2

    def test_replacement_and_nonascii(self):
        s = self._one("café �� naïve")
        assert s["n_repl"] == 2
        assert s["n_nonascii"] == 4  # é, �, �, ï

    def test_empty_and_none_are_total(self):
        import pyarrow as pa

        from pdf_extractor_ray.functions.quality import garbled_stats_batch

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["", None], pa.string()),
            }
        )
        out = garbled_stats_batch(t).to_pandas()
        assert out["n_words"].tolist() == [0, 0]
        assert out["n_nonascii"].tolist() == [0, 0]


class TestLexicalDiversity:
    def _one(self, text):
        import pyarrow as pa

        from pdf_extractor_ray.functions.textstats import lexical_diversity_batch

        t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": [text]})
        out = lexical_diversity_batch(t)
        return {c: out[c][0].as_py() for c in out.column_names}

    def test_known_counts(self):
        s = self._one("the cat the cat dog")
        assert s["n_tokens"] == 5 and s["n_types"] == 3
        # simpson numerator: the:2 -> 2, cat:2 -> 2, dog:1 -> 0
        assert s["simpson_num"] == 4 and s["top_count"] == 2

    def test_all_repeats(self):
        s = self._one("x x x x")
        assert s["n_types"] == 1 and s["simpson_num"] == 4 * 3
        assert s["top_count"] == 4

    def test_zero_token_doc_is_total(self):
        s = self._one("!!! ...")
        assert (s["n_tokens"], s["n_types"], s["simpson_num"], s["top_count"]) == (
            0, 0, 0, 0,
        )

    def test_case_fold_and_digits(self):
        s = self._one("Ab ab AB 99")
        assert s["n_types"] == 2 and s["top_count"] == 3

    def test_batch_mix_zero_and_nonzero(self):
        import pyarrow as pa

        from pdf_extractor_ray.functions.textstats import lexical_diversity_batch

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a b a", None, "c"], pa.string()),
            }
        )
        out = lexical_diversity_batch(t).to_pandas()
        assert out["n_tokens"].tolist() == [3, 0, 1]
        assert out["n_types"].tolist() == [2, 0, 1]
        assert out["simpson_num"].tolist() == [2, 0, 0]
