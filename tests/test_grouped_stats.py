"""group_median / group_mode semantics the gate can't see: even-count
interpolation, odd-count exactness, mode tie-break, and partial-count
folding when one group's values are split across batches."""

import numpy as np
import pandas as pd
import pytest

import ray

from pdf_extractor_ray.functions.grouped_stats import group_median, group_mode


def _ds(df, parts=4):
    return ray.data.from_pandas(df).repartition(parts)


def test_median_odd_even(ray_session):
    df = pd.DataFrame(
        {
            "g": ["a"] * 3 + ["b"] * 4,
            "v": [1, 5, 9, 2, 4, 6, 100],
        }
    )
    out = (
        group_median(_ds(df), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["median"].tolist() == [5.0, 5.0]  # odd: middle; even: (4+6)/2


def test_median_duplicate_values_fold(ray_session):
    # duplicates of one value split across batches must fold into one
    # histogram row before the cumulative walk
    df = pd.DataFrame({"g": ["x"] * 6, "v": [7, 7, 7, 7, 1, 9]})
    out = group_median(_ds(df, parts=6), "g", "v").to_pandas()
    assert out["median"].tolist() == [7.0]


def test_mode_tie_breaks_to_smallest(ray_session):
    df = pd.DataFrame({"g": ["a"] * 4, "v": [3, 3, 1, 1]})
    out = group_mode(_ds(df), "g", "v").to_pandas()
    assert out["mode_value"].tolist() == [1]
    assert out["n"].tolist() == [2]


def test_mode_counts_fold_across_batches(ray_session):
    # value 5 appears once per batch; value 2 twice in one batch —
    # the exchange must sum partials (5 -> 3) before the argmax
    df = pd.DataFrame({"g": ["a"] * 5, "v": [5, 5, 5, 2, 2]})
    out = group_mode(_ds(df, parts=5), "g", "v").to_pandas()
    assert out["mode_value"].tolist() == [5]
    assert out["n"].tolist() == [3]
