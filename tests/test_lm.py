"""Char n-gram LM quality scoring (functions/lm.py)."""

import pyarrow as pa

from pdf_extractor_ray.functions.lm import (
    CharLmScorer,
    _score_text,
    train_char_lm,
)

_CLEAN = [
    "the quick brown fox jumps over the lazy dog",
    "a sentence made of ordinary english words flows naturally",
    "training corpora contain normal prose like this line here",
] * 10


class TestCharLm:
    def test_training_is_deterministic(self):
        a = train_char_lm(_CLEAN)
        b = train_char_lm(_CLEAN)
        assert a == b

    def test_scoring_is_deterministic(self):
        m = train_char_lm(_CLEAN)
        s1 = _score_text(m, "the quick brown fox")
        s2 = _score_text(m, "the quick brown fox")
        assert s1 == s2

    def test_clean_text_beats_gibberish(self):
        m = train_char_lm(_CLEAN)
        clean_lp, n1 = _score_text(m, "the lazy dog jumps over the brown fox")
        gib_lp, n2 = _score_text(m, "zxq jjw qqz vkx zzj wqx kkz jqx vv qq")
        assert (-clean_lp / n1) < (-gib_lp / n2)

    def test_in_domain_beats_out_of_domain(self):
        m = train_char_lm(_CLEAN)
        in_lp, n1 = _score_text(m, _CLEAN[0])
        out_lp, n2 = _score_text(m, "0x7f3a 0x99b2 0xdead 0xbeef 0x1234")
        assert (-in_lp / n1) < (-out_lp / n2)

    def test_empty_text_scores_finite(self):
        m = train_char_lm(_CLEAN)
        lp, n = _score_text(m, "")
        assert n >= 1  # the end-of-text symbol is scored


class TestLmScoreDataset:
    def test_scorer_matches_reference_fn_and_is_deterministic(self, ray_session):
        import ray as raymod

        m = train_char_lm(_CLEAN)
        ref = raymod.put(m)
        scorer = CharLmScorer(ref)
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["the quick brown fox", "zxq jjw qqz"],
            }
        )
        out = scorer(batch)
        import math

        for row, text in zip(range(2), ["the quick brown fox", "zxq jjw qqz"]):
            lp, n = _score_text(m, text)
            expect = int(math.floor((-lp / n) * 1000 + 0.5))
            assert out["bits_per_char_m"][row].as_py() == expect

    def test_end_to_end_actor_pool(self, ray_session):
        from pdf_extractor_ray.functions.lm import lm_score

        docs = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(40)), pa.int64()),
                    "text": [_CLEAN[i % 3] for i in range(40)],
                }
            )
        ).repartition(4)
        train = ray_session.data.from_arrow(
            pa.table({"text": _CLEAN})
        )
        out = lm_score(docs, train, train_rows=30, concurrency=2).to_pandas()
        assert len(out) == 40
        # identical texts score identically everywhere
        assert out.groupby(out.doc_id % 3)["bits_per_char_m"].nunique().max() == 1
