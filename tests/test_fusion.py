"""RRF hybrid fusion (functions/fusion.py).

Reference semantics: score(doc) = sum over legs of 1/(k + rank),
dedup by doc, top-n (arangodb/search_api/hybrid.py:154-226) — here in
exact integer micro-units.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _leg(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "rank"]).astype("int64")
    )


class TestRrfFuse:
    def test_exact_integer_scores_and_order(self, ray_session):
        from pdf_extractor_ray.functions.fusion import rrf_fuse

        # doc 1 is rank 1 in both legs; doc 2 only in leg A (rank 2);
        # doc 3 only in leg B (rank 2); doc 4 deep in both.
        a = _leg([(1, 1), (2, 2), (4, 3)])
        b = _leg([(1, 1), (3, 2), (4, 3)])
        out = rrf_fuse([a, b], rrf_k=60, top_n=10).to_pandas()
        exp = {
            1: 2 * (1_000_000 // 61),
            2: 1_000_000 // 62,
            3: 1_000_000 // 62,
            4: 2 * (1_000_000 // 63),
        }
        got = dict(zip(out["doc_id"], out["rrf_score_u"]))
        assert got == exp
        # order: score desc, doc_id asc — doc 4 (2 contributions)
        # beats docs 2/3 (one each); 2 precedes 3 on the id tie
        assert out["doc_id"].tolist() == [1, 4, 2, 3]
        assert out["rank"].tolist() == [1, 2, 3, 4]

    def test_top_n_cut(self, ray_session):
        from pdf_extractor_ray.functions.fusion import rrf_fuse

        a = _leg([(i, i) for i in range(1, 9)])
        out = rrf_fuse([a], top_n=3).to_pandas()
        assert out["doc_id"].tolist() == [1, 2, 3]

    def test_empty_legs_raise(self, ray_session):
        from pdf_extractor_ray.functions.fusion import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([])

    def test_rank_from_scores(self, ray_session):
        from pdf_extractor_ray.functions.fusion import rank_from_scores

        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"doc_id": [7, 3, 9], "score_m": [10, 30, 10]}
            ).astype("int64")
        )
        out = rank_from_scores(ds, "score_m").to_pandas()
        m = dict(zip(out["doc_id"], out["rank"]))
        # score desc, id asc: 3 (30), then 7 and 9 tie at 10 -> id order
        assert m == {3: 1, 7: 2, 9: 3}
