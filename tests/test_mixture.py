"""Temperature-sampled mixture composition (functions/mixture.py)."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.functions.mixture import (
    select_mixture,
    temperature_quotas,
)


def _rank_select(df: pd.DataFrame, quotas: dict) -> pd.DataFrame:
    """Reference selection: per-key (md5(str(id)), id) rank <= quota."""
    df = df.copy()
    df["_salt"] = [
        hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]
    ]
    df = df.sort_values(["key", "_salt", "doc_id"]).reset_index(drop=True)
    df["_rn"] = df.groupby("key").cumcount() + 1
    keep = df[
        df.apply(lambda r: r["_rn"] <= quotas[r["key"]]["quota"], axis=1)
    ]
    return keep[["key", "doc_id"]].reset_index(drop=True)


class TestTemperatureQuotas:
    def test_hand_arithmetic_skewed(self):
        counts = {"en": 400, "de": 100, "fr": 25}
        B = 200
        q = temperature_quotas(counts, B)
        # weights = floor(sqrt(n * 1e6))
        assert q["en"]["weight"] == int(math.floor(math.sqrt(400e6)))
        assert q["de"]["weight"] == int(math.floor(math.sqrt(100e6)))
        assert q["fr"]["weight"] == int(math.floor(math.sqrt(25e6)))
        # sqrt flattens the 16:4:1 ratio to 4:2:1
        w = {k: q[k]["weight"] for k in q}
        assert w["en"] == 2 * w["de"] == 4 * w["fr"]
        # quotas sum exactly to the budget
        assert sum(v["quota"] for v in q.values()) == B
        # largest-remainder base: floors en 114 / de 57 / fr 28
        # (4:2:1 of 200), one extra to the largest remainder (fr)
        # -> fr 29 exceeds its 25 docs, caps at 25, and the 4-doc
        # overflow flows to the next-largest remainder with room (en)
        assert q["en"]["quota"] == 118
        assert q["de"]["quota"] == 57
        assert q["fr"]["quota"] == 25

    def test_budget_larger_than_corpus_caps(self):
        counts = {"a": 10, "b": 10}
        q = temperature_quotas(counts, 1000)
        assert q["a"]["quota"] == 10 and q["b"]["quota"] == 10

    def test_cap_redistributes_overflow(self):
        # extreme skew: sqrt weight still hands the tiny source more
        # than it has; overflow must flow back to sources with room
        counts = {"big": 10_000, "tiny": 1}
        B = 5_000
        q = temperature_quotas(counts, B)
        assert q["tiny"]["quota"] <= 1
        assert sum(v["quota"] for v in q.values()) == B
        assert q["big"]["quota"] <= 10_000

    def test_zero_budget(self):
        q = temperature_quotas({"a": 5}, 0)
        assert q["a"]["quota"] == 0


class TestSelectMixture:
    @pytest.fixture(scope="class")
    def frame(self):
        rng = np.random.RandomState(7)
        keys = (
            ["en"] * 400 + ["de"] * 100 + ["fr"] * 25 + ["zh"] * 3
        )
        ids = rng.permutation(10_000)[: len(keys)]
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "key": keys})

    def test_matches_reference_rank(self, ray_session, frame):
        import ray.data

        B = 2 * len(frame) // 5
        counts = frame["key"].value_counts().to_dict()
        quotas = temperature_quotas(counts, B)
        ds = ray.data.from_pandas(frame).repartition(8)
        got = (
            select_mixture(ds, B, key_col="key", id_col="doc_id")
            .to_pandas()
            .sort_values(["key", "doc_id"])
            .reset_index(drop=True)[["key", "doc_id"]]
        )
        want = (
            _rank_select(frame, quotas)
            .sort_values(["key", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        per_key = got.groupby("key").size().to_dict()
        for k, v in quotas.items():
            assert per_key.get(k, 0) == v["quota"]

    def test_partition_invariance(self, ray_session, frame):
        import ray.data

        B = len(frame) // 3
        a = (
            select_mixture(
                ray.data.from_pandas(frame).repartition(2),
                B,
                key_col="key",
                id_col="doc_id",
            )
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        b = (
            select_mixture(
                ray.data.from_pandas(frame).repartition(16),
                B,
                key_col="key",
                id_col="doc_id",
            )
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        assert a == b

    def test_budget_covers_everything(self, ray_session, frame):
        import ray.data

        out = select_mixture(
            ray.data.from_pandas(frame),
            len(frame) + 10,
            key_col="key",
            id_col="doc_id",
        ).to_pandas()
        assert len(out) == len(frame)

    def test_zero_budget_empty(self, ray_session, frame):
        import ray.data

        out = select_mixture(
            ray.data.from_pandas(frame), 0, key_col="key", id_col="doc_id"
        ).to_pandas()
        assert len(out) == 0


class TestKFold:
    def test_exact_balance_and_reference(self, ray_session, frame=None):
        import hashlib

        import ray.data

        from pdf_extractor_ray.functions.mixture import kfold_assign

        rng = np.random.RandomState(13)
        keys = ["a"] * 101 + ["b"] * 57 + ["c"] * 4
        ids = rng.permutation(5000)[: len(keys)].astype(np.int64)
        df = pd.DataFrame({"doc_id": ids, "lang": keys})
        out = (
            kfold_assign(
                ray.data.from_pandas(df).repartition(7),
                k=4,
                strata_col="lang",
                id_col="doc_id",
            )
            .to_pandas()
        )
        # exact balance per stratum: fold sizes differ by at most 1
        for s, g in out.groupby("lang"):
            sizes = g.groupby("fold").size()
            assert sizes.max() - sizes.min() <= 1, (s, dict(sizes))
        # reference: serial (md5, id) rank % k
        ref = df.copy()
        ref["_salt"] = [
            hashlib.md5(str(i).encode()).hexdigest() for i in ref["doc_id"]
        ]
        ref = ref.sort_values(["lang", "_salt", "doc_id"])
        ref["fold"] = ref.groupby("lang").cumcount() % 4
        m = out.merge(
            ref[["doc_id", "fold"]], on="doc_id", suffixes=("", "_ref")
        )
        assert (m["fold"] == m["fold_ref"]).all()

    def test_partition_invariance(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.mixture import kfold_assign

        df = pd.DataFrame(
            {"doc_id": np.arange(300, dtype=np.int64),
             "lang": ["x", "y", "z"] * 100}
        )
        a = (
            kfold_assign(ray.data.from_pandas(df).repartition(2), k=3)
            .to_pandas()
            .sort_values("doc_id")["fold"]
            .tolist()
        )
        b = (
            kfold_assign(ray.data.from_pandas(df).repartition(17), k=3)
            .to_pandas()
            .sort_values("doc_id")["fold"]
            .tolist()
        )
        assert a == b


class TestOracleCapParity:
    """ADVICE r4: the mixture_select SQL oracle must replay the quota
    cap q_i <= n_i and the overflow redistribution — exercised here on
    a mix skewed enough that a sqrt-boosted tiny source's quota
    exceeds its size (the case the sf gate mixes never hit)."""

    def test_oracle_matches_engine_on_skewed_mix(
        self, ray_session, tmp_path
    ):
        import duckdb
        import pyarrow.parquet as pq
        import pyarrow as pa

        import __ray_entry__ as entrymod

        # {en: 10000, zz: 1}: B = 2*10001//5 = 4000,
        # w_en = 100000, w_zz = 1000 -> q_zz ~ 39 >> 1 doc: cap fires
        rng = np.random.RandomState(31)
        ids = rng.permutation(50_000)[:10_001].astype(np.int64)
        langs = ["en"] * 10_000 + ["zz"]
        tbl = pa.table({"doc_id": ids, "lang": langs})
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))

        got = entrymod.queries()["mixture_select"](str(tmp_path))
        got = got.to_pandas() if hasattr(got, "to_pandas") else got

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path / 'documents.parquet'}'"
        )
        want = con.sql(entrymod.oracle_sql()["mixture_select"]).df()

        got = got.sort_values("lang").reset_index(drop=True)
        want = want.sort_values("lang").reset_index(drop=True)
        assert list(got.columns) == list(want.columns) or set(
            got.columns
        ) == set(want.columns)
        want = want[got.columns]
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # the cap itself: zz kept at most its 1 doc, budget still met
        zz = got[got["lang"] == "zz"].iloc[0]
        assert zz["quota"] == 1 and zz["n_selected"] == 1
        assert got["quota"].sum() == 2 * 10_001 // 5
