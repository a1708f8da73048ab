"""Fill-in-the-middle transform (functions/fim.py)."""

import hashlib

import numpy as np
import pandas as pd

from pdf_extractor_ray.functions.fim import fim_transform


def _selected(cid: int, rate: int) -> bool:
    return int(hashlib.md5(str(cid).encode()).hexdigest()[:8], 16) % 100 < rate


def _mk(ray_session, rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)


class TestFim:
    def test_psm_layout_hand_check(self, ray_session):
        # one chunk forced into the transform (rate 100)
        ds = _mk(ray_session, [{"chunk_id": 0, "ids": list(range(9))}])
        out = fim_transform(ds, rate_pct=100).to_pandas()
        # n=9 -> a=3, b=6: [PRE] 0 1 2 [SUF] 6 7 8 [MID] 3 4 5
        assert out["fim_applied"].iloc[0]
        assert list(out["ids"].iloc[0]) == [
            32001, 0, 1, 2, 32002, 6, 7, 8, 32003, 3, 4, 5,
        ]
        assert out["n_tokens"].iloc[0] == 12

    def test_rate_selection_matches_hash(self, ray_session):
        rows = [
            {"chunk_id": c, "ids": list(range(10))} for c in range(60)
        ]
        out = (
            fim_transform(_mk(ray_session, rows), rate_pct=40)
            .to_pandas()
            .set_index("chunk_id")
        )
        for c in range(60):
            assert out.loc[c, "fim_applied"] == _selected(c, 40)

    def test_short_chunk_passthrough(self, ray_session):
        ds = _mk(ray_session, [{"chunk_id": 0, "ids": [5, 6]}])
        out = fim_transform(ds, rate_pct=100).to_pandas()
        assert not out["fim_applied"].iloc[0]
        assert list(out["ids"].iloc[0]) == [5, 6]

    def test_token_multiset_preserved(self, ray_session):
        rows = [
            {"chunk_id": c, "ids": list(np.arange(c, c + 50) % 32000)}
            for c in range(20)
        ]
        out = fim_transform(_mk(ray_session, rows), rate_pct=100).to_pandas()
        for _, r in out.iterrows():
            body = [t for t in r["ids"] if t < 32000]
            want = sorted(np.arange(r["chunk_id"], r["chunk_id"] + 50) % 32000)
            assert sorted(body) == list(want)
            assert sum(1 for t in r["ids"] if t >= 32001) == 3


class TestSpanCorrupt:
    def test_hand_layout(self, ray_session):
        from pdf_extractor_ray.functions.fim import span_corrupt

        # n=12, span_len=2, stride=5: spans at [0,2) and [5,7) and
        # [10,12) -> inputs: S0 2 3 4 S1 7 8 9 S2, targets:
        # S0 0 1 S1 5 6 S2 10 11
        ds = _mk(ray_session, [{"chunk_id": 0, "ids": list(range(12))}])
        out = span_corrupt(
            ds, span_len=2, stride=5, sentinel_base=900
        ).to_pandas()
        assert list(out["inputs"].iloc[0]) == [
            900, 2, 3, 4, 901, 7, 8, 9, 902,
        ]
        assert list(out["targets"].iloc[0]) == [
            900, 0, 1, 901, 5, 6, 902, 10, 11,
        ]
        assert out["n_inputs"].iloc[0] == 9
        assert out["n_targets"].iloc[0] == 9

    def test_partial_tail_span(self, ray_session):
        from pdf_extractor_ray.functions.fim import span_corrupt

        # n=11 with stride 5: the third span [10,12) clips to [10,11)
        ds = _mk(ray_session, [{"chunk_id": 1, "ids": list(range(11))}])
        out = span_corrupt(
            ds, span_len=2, stride=5, sentinel_base=900
        ).to_pandas()
        assert list(out["targets"].iloc[0]) == [
            900, 0, 1, 901, 5, 6, 902, 10,
        ]

    def test_union_reconstructs_multiset(self, ray_session):
        from pdf_extractor_ray.functions.fim import span_corrupt

        rows = [
            {"chunk_id": c, "ids": list((np.arange(100) * 7 + c) % 32000)}
            for c in range(10)
        ]
        out = span_corrupt(_mk(ray_session, rows)).to_pandas()
        for _, r in out.iterrows():
            body = [t for t in r["inputs"] if t < 32000] + [
                t for t in r["targets"] if t < 32000
            ]
            want = sorted((np.arange(100) * 7 + r["chunk_id"]) % 32000)
            assert sorted(body) == list(want)
