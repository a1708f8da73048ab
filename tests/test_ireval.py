"""nDCG evaluation (functions/ireval.py)."""

import numpy as np
import pandas as pd

from pdf_extractor_ray.functions.ireval import discount_milli, ndcg_at_k


def _mk_gains(ray_session, gains: dict, parts=4):
    import ray.data

    df = pd.DataFrame(
        {"doc_id": list(gains), "gain": [gains[d] for d in gains]}
    )
    return ray.data.from_pandas(df).repartition(parts)


class TestNdcg:
    def test_discount_constants(self):
        # the published table for k=10, pinned as integers
        assert discount_milli(10) == [
            1000, 631, 500, 431, 387, 356, 333, 315, 301, 289,
        ]

    def test_perfect_ranking_is_million(self, ray_session):
        gains = {i: max(0, 3 - i) for i in range(20)}  # ideal = 0,1,2,...
        run = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4]})
        out = ndcg_at_k(run, _mk_gains(ray_session, gains), k=5)
        assert out["ndcg_pm"].iloc[0] == 1_000_000
        assert out["dcg_milli"].iloc[0] == out["idcg_milli"].iloc[0]

    def test_hand_arithmetic(self, ray_session):
        gains = {10: 3, 11: 2, 12: 1, 13: 0, 14: 3}
        run = pd.DataFrame({"doc_id": [13, 10, 99]})  # 99 unjudged -> 0
        out = ndcg_at_k(run, _mk_gains(ray_session, gains), k=3)
        d = discount_milli(3)
        dcg = 0 * d[0] + 3 * d[1] + 0 * d[2]
        idcg = 3 * d[0] + 3 * d[1] + 2 * d[2]
        assert out["dcg_milli"].iloc[0] == dcg
        assert out["idcg_milli"].iloc[0] == idcg
        assert out["ndcg_pm"].iloc[0] == 1_000_000 * dcg // idcg

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(5)
        gains = {int(i): int(rng.randint(0, 4)) for i in range(500)}
        run = pd.DataFrame({"doc_id": rng.permutation(500)[:10]})
        a = ndcg_at_k(run, _mk_gains(ray_session, gains, 2), k=10)
        b = ndcg_at_k(run, _mk_gains(ray_session, gains, 13), k=10)
        pd.testing.assert_frame_equal(a, b)
