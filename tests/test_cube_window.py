"""CUBE lattice completeness and running-total ordering semantics."""

import numpy as np
import pandas as pd
import pytest

import ray

from pdf_extractor_ray.functions.relational import cube_counts, running_totals


def test_cube_lattice_levels(ray_session):
    df = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            "lang": ["en", "de", "en"],
            "n_chars": [10, 20, 40],
        }
    )
    out = cube_counts(ray.data.from_pandas(df).repartition(3))
    # 3 finest + 2 per-source + 2 per-lang + 1 grand = 8 rows
    assert len(out) == 8
    grand = out[(out["source"] == "(all)") & (out["lang"] == "(all)")]
    assert grand["sum_value"].tolist() == [70]
    by_lang = out[(out["source"] == "(all)") & (out["lang"] == "en")]
    assert by_lang["sum_value"].tolist() == [50]
    by_src = out[(out["source"] == "a") & (out["lang"] == "(all)")]
    assert by_src["n_rows"].tolist() == [2]


def test_running_totals_tie_break_and_split_batches(ray_session):
    # same user, same ts for events 2 and 3 -> order by event_id;
    # user history split across partitions must still fold into one
    # cumulative series
    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 11:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": [1, 3, 2],
            "user_id": [7, 7, 7],
            "ts": ts,
            "value": [1.00, 0.50, 0.25],
        }
    )
    out = (
        running_totals(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # order: e1 (10:00) -> e2 (11:00, lower id) -> e3
    assert out["running_c"].tolist() == [100, 125, 175]


def test_max_concurrency_carry_across_windows(ray_session):
    from pdf_extractor_ray.functions.relational import max_concurrency

    # three events starting just before a window boundary, held long
    # enough to overlap into the next window: the peak (3) happens in
    # window 1 only if the carry from window 0 is applied
    ts = pd.to_datetime(
        [
            "2024-01-01 23:55:00",  # win 0, holds into win 1
            "2024-01-01 23:58:00",  # win 0, holds into win 1
            "2024-01-02 00:01:00",  # win 1
        ]
    )
    ev = pd.DataFrame({"ts": ts})
    out = max_concurrency(
        ray.data.from_pandas(ev).repartition(3), hold_s=600
    )
    assert out["max_concurrent"].tolist() == [3]
    # earliest peak instant = third event's start
    assert out["at_ts_us"].tolist() == [
        int(pd.Timestamp("2024-01-02 00:01:00").value // 1000)
    ]


def test_max_concurrency_end_before_start(ray_session):
    from pdf_extractor_ray.functions.relational import max_concurrency

    # second event starts EXACTLY when the first ends: half-open
    # intervals never overlap -> peak 1
    ts = pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:10:00"])
    out = max_concurrency(
        ray.data.from_pandas(pd.DataFrame({"ts": ts})), hold_s=600
    )
    assert out["max_concurrent"].tolist() == [1]
