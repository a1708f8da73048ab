"""DSIR-shaped importance scoring (functions/importance.py)."""

import numpy as np
import pyarrow as pa


def _docs(ray, texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)


class TestDsirImportance:
    def test_target_like_docs_score_higher(self, ray_session):
        from pdf_extractor_ray.functions.importance import dsir_importance

        medical = "patient dose clinical trial symptom therapy"
        webspam = "click here buy cheap viagra casino jackpot"
        texts = [medical] * 10 + [webspam] * 10 + [medical] * 5
        ds = _docs(ray_session, texts)
        target = ds.filter(expr="doc_id < 10")  # the medical block
        out = (
            dsir_importance(ds, target)
            .to_pandas()
            .set_index("doc_id")["dsir_score"]
        )
        med_scores = [out[i] for i in list(range(10)) + [20, 21, 22, 23, 24]]
        spam_scores = [out[i] for i in range(10, 20)]
        assert min(med_scores) > max(spam_scores)

    def test_matches_serial_integer_reference(self, ray_session):
        """Distributed scores equal a from-scratch serial replay of the
        integer weight derivation."""
        import re

        from pdf_extractor_ray.functions.importance import (
            _word_bin,
            dsir_importance,
        )

        rng = np.random.RandomState(5)
        vocab = [f"w{i}" for i in range(40)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.randint(3, 30)))
            for _ in range(60)
        ]
        ds = _docs(ray_session, texts)
        target = ds.filter(expr="doc_id < 15")
        out = (
            dsir_importance(ds, target, n_bins=64)
            .to_pandas()
            .sort_values("doc_id")["dsir_score"]
            .tolist()
        )
        # serial replay
        word_re = re.compile(r"[a-z0-9]+")
        tgt = np.zeros(64, dtype=object)
        src = np.zeros(64, dtype=object)
        for i, t in enumerate(texts):
            for w in word_re.findall(t.lower()):
                b = _word_bin(w, 64)
                src[b] += 1
                if i < 15:
                    tgt[b] += 1
        tt, st = int(sum(tgt)), int(sum(src))
        wts = [
            ((int(tgt[b]) + 1) * (st + 64) * 1000)
            // ((int(src[b]) + 1) * (tt + 64))
            for b in range(64)
        ]
        want = [
            sum(wts[_word_bin(w, 64)] for w in word_re.findall(t.lower()))
            for t in texts
        ]
        assert out == want

    def test_empty_doc_scores_zero(self, ray_session):
        from pdf_extractor_ray.functions.importance import dsir_importance

        ds = _docs(ray_session, ["hello world", "", "hello"])
        out = (
            dsir_importance(ds, ds.filter(expr="doc_id < 1"))
            .to_pandas()
            .set_index("doc_id")["dsir_score"]
        )
        assert out[1] == 0
