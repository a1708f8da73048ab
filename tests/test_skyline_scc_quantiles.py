"""Skyline domination semantics, SCC membership on a hand graph, and
quantile interpolation vs numpy's 'linear' method."""

import numpy as np
import pandas as pd
import pytest

import ray

from pdf_extractor_ray.functions.grouped_stats import group_quantiles
from pdf_extractor_ray.functions.skyline import skyline_2d
from pdf_extractor_ray.functions.graph import scc_members


def test_skyline_vs_bruteforce(ray_session):
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "id": np.arange(300),
            "lo": rng.randint(0, 40, 300).astype(np.int64),
            "hi": rng.randint(0, 40, 300).astype(np.int64),
        }
    )
    got = skyline_2d(ray.data.from_pandas(df).repartition(8), "id", "lo", "hi")

    lo, hi = df["lo"].to_numpy(), df["hi"].to_numpy()
    keep = []
    for i in range(len(df)):
        dominated = np.any(
            (lo <= lo[i]) & (hi >= hi[i]) & ((lo < lo[i]) | (hi > hi[i]))
        )
        if not dominated:
            keep.append(i)
    assert sorted(got["id"].tolist()) == keep


def test_skyline_exact_ties_all_kept(ray_session):
    # identical points do not dominate each other
    df = pd.DataFrame({"id": [1, 2, 3], "lo": [5, 5, 9], "hi": [7, 7, 9]})
    got = skyline_2d(ray.data.from_pandas(df).repartition(3), "id", "lo", "hi")
    assert sorted(got["id"].tolist()) == [1, 2, 3]


def test_scc_cycle_with_tail(ray_session):
    # 0->1->2->0 is the SCC; 2->3 dangles (3 unreachable back to 0)
    edges = pd.DataFrame({"src": [0, 1, 2, 2], "dst": [1, 2, 0, 3]})
    out = scc_members(ray.data.from_pandas(edges), seed=0).to_pandas()
    assert sorted(out["node"].tolist()) == [0, 1, 2]


def test_group_quantiles_matches_numpy(ray_session):
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 101),
            "v": rng.randint(0, 1000, 202).astype(np.int64),
        }
    )
    out = group_quantiles(
        ray.data.from_pandas(df).repartition(6), "g", "v", qs=(0.5, 0.9, 0.99)
    ).to_pandas()
    for g in ("a", "b"):
        vals = df.loc[df["g"] == g, "v"].to_numpy()
        for qpm in (500, 900, 990):
            got = out[(out["g"] == g) & (out["q_pm"] == qpm)]["value"].iloc[0]
            want = np.quantile(vals, qpm / 1000.0, method="linear")
            assert got == pytest.approx(want, abs=1e-9), (g, qpm)
