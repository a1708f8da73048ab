"""Skew-aware hash join (functions/relational.py::skew_join)."""

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.functions.relational import skew_join


@pytest.fixture(scope="module")
def sides():
    rng = np.random.RandomState(9)
    n = 20_000
    # 30% of rows on key 0 (the hot key), rest uniform over 1..499
    keys = np.where(
        rng.rand(n) < 0.3, 0, rng.randint(1, 500, size=n)
    ).astype(np.int64)
    big = pd.DataFrame(
        {"k": keys, "v": np.arange(n, dtype=np.int64)}
    )
    # build side: one row per key 0..399 (keys 400+ dangle -> dropped)
    small = pd.DataFrame(
        {
            "k": np.arange(400, dtype=np.int64),
            "w": (np.arange(400, dtype=np.int64) * 3 + 1),
        }
    )
    want = big.merge(small, on="k", how="inner")
    return big, small, want


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["k", "v", "w"]]
        .sort_values(["k", "v"])
        .reset_index(drop=True)
        .astype(np.int64)
    )


class TestSkewJoin:
    def test_matches_pandas_merge(self, ray_session, sides):
        import ray.data

        big, small, want = sides
        got = skew_join(
            ray.data.from_pandas(big).repartition(8).materialize(),
            ray.data.from_pandas(small).repartition(2).materialize(),
            on="k",
            hot_permille=100,
        ).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(want))

    def test_threshold_only_affects_routing(self, ray_session, sides):
        """Same joined rows whether everything is 'hot', nothing is,
        or only the true heavy key — the split is pure routing."""
        import ray.data

        big, small, want = sides
        outs = []
        for pm in (1, 100, 999):
            got = skew_join(
                ray.data.from_pandas(big).repartition(4).materialize(),
                ray.data.from_pandas(small).materialize(),
                on="k",
                hot_permille=pm,
            ).to_pandas()
            outs.append(_canon(got))
        for o in outs[1:]:
            pd.testing.assert_frame_equal(outs[0], o)
        pd.testing.assert_frame_equal(outs[0], _canon(want))

    def test_no_hot_keys_at_all(self, ray_session):
        import ray.data

        big = pd.DataFrame(
            {"k": np.arange(1000, dtype=np.int64) % 97,
             "v": np.arange(1000, dtype=np.int64)}
        )
        small = pd.DataFrame(
            {"k": np.arange(97, dtype=np.int64),
             "w": np.arange(97, dtype=np.int64) + 7}
        )
        got = skew_join(
            ray.data.from_pandas(big).materialize(),
            ray.data.from_pandas(small).materialize(),
            on="k",
            hot_permille=999,  # nothing qualifies
        ).to_pandas()
        want = big.merge(small, on="k")
        pd.testing.assert_frame_equal(_canon(got), _canon(want))
