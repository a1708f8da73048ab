"""Exact global top-K selection (functions/selection.py) vs a pandas
replay of the rank (score DESC, md5(str(id)) ASC, id ASC)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.selection import select_top_k_global


def _rank_keep(df: pd.DataFrame, k: int) -> set:
    r = df.copy()
    r["salt"] = [hashlib.md5(str(i).encode()).hexdigest() for i in r.doc_id]
    r = r.sort_values(
        ["score", "salt", "doc_id"], ascending=[False, True, True]
    )
    return set(r.head(k).doc_id)


def _ds(ray, scores):
    ids = list(range(len(scores)))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.int64()),
            }
        )
    ).repartition(5)


class TestSelectTopK:
    def test_matches_rank_replay(self, ray_session):
        rng = np.random.RandomState(7)
        scores = rng.randint(0, 40, size=500).tolist()
        ds = _ds(ray_session, scores)
        df = pd.DataFrame({"doc_id": range(500), "score": scores})
        for k in (1, 37, 100, 499):
            got = set(
                select_top_k_global(ds, k=k).to_pandas().doc_id
            )
            assert got == _rank_keep(df, k), k

    def test_all_ties_exercises_boundary_refinement(self, ray_session):
        # one score for every row: selection is decided entirely by
        # the salted tie-break inside (possibly) one histogram cell
        n, k = 400, 123
        ds = _ds(ray_session, [5] * n)
        df = pd.DataFrame({"doc_id": range(n), "score": [5] * n})
        got = select_top_k_global(ds, k=k).to_pandas()
        assert len(got) == k
        assert set(got.doc_id) == _rank_keep(df, k)

    def test_k_zero_and_k_all(self, ray_session):
        ds = _ds(ray_session, [1, 2, 3])
        assert select_top_k_global(ds, k=0).count() == 0
        assert select_top_k_global(ds, k=3).count() == 3
        assert select_top_k_global(ds, k=99).count() == 3

    def test_negative_scores(self, ray_session):
        ds = _ds(ray_session, [-5, -1, -3, -1])
        df = pd.DataFrame({"doc_id": range(4), "score": [-5, -1, -3, -1]})
        got = set(select_top_k_global(ds, k=2).to_pandas().doc_id)
        assert got == _rank_keep(df, 2)


class TestDriverBoundedness:
    def test_driver_collects_only_histogram_and_boundary_cell(
        self, ray_session, monkeypatch
    ):
        """The driver may receive the (score x salt_byte) histogram
        and the one boundary cell's members — never anything
        corpus-proportional."""
        import ray.data

        n, k = 5000, 1234
        scores = [i % 30 for i in range(n)]
        ds = _ds(ray_session, scores)

        collected = []
        orig = ray.data.Dataset.to_pandas
        monkeypatch.setattr(
            ray.data.Dataset,
            "to_pandas",
            lambda self, *a, **kw: collected.append(orig(self, *a, **kw))
            or collected[-1],
        )
        out = select_top_k_global(ds, k=k)
        # driver collects during planning: histogram (+ boundary cell)
        assert 1 <= len(collected) <= 2
        assert len(collected[0]) <= 30 * 256  # histogram cells
        if len(collected) == 2:
            # boundary cell: one score value, one salt byte — of the
            # ~167 docs per score, ~1/256 land in the cell; allow wide
            # slack but forbid corpus-proportional sizes
            assert len(collected[1]) < n / 10
        assert out.count() == k


def _budget_keep(df: pd.DataFrame, budget: int) -> set:
    """Serial replay of the greedy token-budget prefix."""
    r = df.copy()
    r["salt"] = [hashlib.md5(str(i).encode()).hexdigest() for i in r.doc_id]
    r = r.sort_values(
        ["score", "salt", "doc_id"], ascending=[False, True, True]
    )
    kept, total = set(), 0
    for _, row in r.iterrows():
        if total + int(row.n_tokens) > budget:
            break
        total += int(row.n_tokens)
        kept.add(int(row.doc_id))
    return kept


def _budget_ds(ray, scores, tokens):
    ids = list(range(len(scores)))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.int64()),
                "n_tokens": pa.array(tokens, pa.int64()),
            }
        )
    ).repartition(5)


class TestSelectTokenBudget:
    def test_matches_serial_replay(self, ray_session):
        from pdf_extractor_ray.functions.selection import select_token_budget

        rng = np.random.RandomState(11)
        scores = rng.randint(0, 40, size=500).tolist()
        tokens = rng.randint(10, 200, size=500).tolist()
        ds = _budget_ds(ray_session, scores, tokens)
        df = pd.DataFrame(
            {"doc_id": range(500), "score": scores, "n_tokens": tokens}
        )
        for budget in (0, 137, 5000, 20000, 10**9):
            got = select_token_budget(ds, budget=budget).to_pandas()
            want = _budget_keep(df, budget)
            got_ids = set(got["doc_id"]) if len(got) else set()
            assert got_ids == want, budget
            if len(got):
                assert int(got["n_tokens"].sum()) <= budget

    def test_all_same_score_ties_cut_by_salt_walk(self, ray_session):
        from pdf_extractor_ray.functions.selection import select_token_budget

        n = 300
        ds = _budget_ds(ray_session, [7] * n, [50] * n)
        df = pd.DataFrame(
            {"doc_id": range(n), "score": [7] * n, "n_tokens": [50] * n}
        )
        got = select_token_budget(ds, budget=5025).to_pandas()
        want = _budget_keep(df, 5025)
        assert set(got.doc_id) == want
        assert len(got) == 100  # 100 * 50 = 5000 <= 5025 < 5050


def _bucket_replay(df: pd.DataFrame, n_buckets: int) -> dict:
    """Serial replay of the per-group quantile rank arithmetic:
    rank within group under (score ASC, md5(str(id)) ASC, id ASC),
    bucket = (n_buckets * (rank - 1)) // n_group."""
    out = {}
    for g, gdf in df.groupby("lang"):
        r = gdf.copy()
        r["salt"] = [
            hashlib.md5(str(i).encode()).hexdigest() for i in r.doc_id
        ]
        r = r.sort_values(["score", "salt", "doc_id"]).reset_index(drop=True)
        n_g = len(r)
        for rank0, i in enumerate(r.doc_id):
            out[(g, int(i))] = (n_buckets * rank0) // n_g
    return out


def _group_ds(ray, langs, scores):
    ids = list(range(len(scores)))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "score": pa.array(scores, pa.int64()),
            }
        )
    ).repartition(5)


class TestGroupQuantileSplit:
    def test_matches_rank_replay(self, ray_session):
        from pdf_extractor_ray.functions.selection import group_quantile_split

        rng = np.random.RandomState(3)
        n = 600
        langs = [["en", "fr", "de", "zz"][i % 4] for i in range(n)]
        scores = rng.randint(0, 25, size=n).tolist()
        ds = _group_ds(ray_session, langs, scores)
        df = pd.DataFrame(
            {"doc_id": range(n), "lang": langs, "score": scores}
        )
        for n_buckets in (1, 3, 10):
            got = group_quantile_split(
                ds, n_buckets=n_buckets, group_col="lang"
            ).to_pandas()
            want = _bucket_replay(df, n_buckets)
            assert len(got) == n
            for _, row in got.iterrows():
                assert (
                    int(row.bucket) == want[(row.lang, int(row.doc_id))]
                ), (row.lang, row.doc_id)

    def test_all_ties_exercise_boundary_refinement(self, ray_session):
        # every row in one group shares one score: every tercile
        # boundary falls inside a salt cell, forcing the exact member
        # ranking path
        from pdf_extractor_ray.functions.selection import group_quantile_split

        n = 300
        langs = ["en"] * n
        ds = _group_ds(ray_session, langs, [5] * n)
        df = pd.DataFrame(
            {"doc_id": range(n), "lang": langs, "score": [5] * n}
        )
        got = group_quantile_split(ds, n_buckets=3).to_pandas()
        want = _bucket_replay(df, 3)
        counts = got.bucket.value_counts().to_dict()
        assert counts == {0: 100, 1: 100, 2: 100}
        for _, row in got.iterrows():
            assert int(row.bucket) == want[("en", int(row.doc_id))]

    def test_uneven_group_sizes(self, ray_session):
        from pdf_extractor_ray.functions.selection import group_quantile_split

        # group sizes not divisible by n_buckets: 7 and 5 rows into 3
        langs = ["a"] * 7 + ["b"] * 5
        scores = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
        ds = _group_ds(ray_session, langs, scores)
        df = pd.DataFrame(
            {"doc_id": range(12), "lang": langs, "score": scores}
        )
        got = group_quantile_split(ds, n_buckets=3).to_pandas()
        want = _bucket_replay(df, 3)
        for _, row in got.iterrows():
            assert int(row.bucket) == want[(row.lang, int(row.doc_id))]
        # a: 7 rows -> 3/2/2; b: 5 rows -> 2/2/1
        a = got[got.lang == "a"].bucket.value_counts().to_dict()
        b = got[got.lang == "b"].bucket.value_counts().to_dict()
        assert a == {0: 3, 1: 2, 2: 2}
        assert b == {0: 2, 1: 2, 2: 1}

    def test_empty_input(self, ray_session):
        from pdf_extractor_ray.functions.selection import group_quantile_split

        ds = _group_ds(ray_session, [], [])
        assert group_quantile_split(ds, n_buckets=3).count() == 0

    def test_n_buckets_validation(self, ray_session):
        from pdf_extractor_ray.functions.selection import group_quantile_split

        ds = _group_ds(ray_session, ["en"], [1])
        with pytest.raises(ValueError):
            group_quantile_split(ds, n_buckets=0)
