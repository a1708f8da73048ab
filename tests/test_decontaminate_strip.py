"""Contamination span removal (decontaminate.strip_contaminated_spans)."""

import pandas as pd
import pytest

from pdf_extractor_ray.functions.decontaminate import (
    strip_contaminated_spans,
)


def _mk(ray_session, rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


class TestStripContaminated:
    def test_exact_span_cut(self, ray_session):
        bench = _mk(
            ray_session,
            [{"doc_id": 0, "text": "q1 q2 q3 q4"}],
        )
        corpus = _mk(
            ray_session,
            [
                # the benchmark 4-gram sits in the middle: only its
                # 4 covered words get cut
                {"doc_id": 10, "text": "a b q1 q2 q3 q4 c d"},
                # clean doc passes untouched
                {"doc_id": 11, "text": "x y z w v"},
                # two overlapping hits merge into one maximal span
                {"doc_id": 12, "text": "q1 q2 q3 q4 q1 q2 q3 q4"},
            ],
        )
        out = (
            strip_contaminated_spans(corpus, bench, n=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[10, "kept_text"] == "a b c d"
        assert out.loc[10, "n_removed"] == 4
        assert out.loc[11, "kept_text"] == "x y z w v"
        assert out.loc[11, "n_removed"] == 0
        # doc 12: hits at 0 and 4, plus the straddling 4-grams
        # ("q3 q4 q1 q2" etc.) are NOT benchmark grams, but [0,4) and
        # [4,8) cover everything
        assert out.loc[12, "kept_text"] == ""
        assert out.loc[12, "n_removed"] == 8

    def test_short_docs_and_case_sensitivity(self, ray_session):
        bench = _mk(ray_session, [{"doc_id": 0, "text": "A B C D"}])
        corpus = _mk(
            ray_session,
            [
                {"doc_id": 1, "text": "a b c d"},  # different case
                {"doc_id": 2, "text": "A B C"},    # shorter than n
                {"doc_id": 3, "text": "A B C D"},  # exact
            ],
        )
        out = (
            strip_contaminated_spans(corpus, bench, n=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "n_removed"] == 0  # the module is case-exact
        assert out.loc[2, "n_removed"] == 0
        assert out.loc[3, "kept_text"] == ""
