"""Cross-engine-exact sketch family (md5 HLL / Count-Min / Bloom).

These sketches trade hash speed for bit-for-bit oracle replayability:
every register / counter / bit is rebuilt by DuckDB SQL, so the gate
hashes sketch CONTENT, not a tolerance. Tests here pin (a) exactness
vs the same SQL the driver runs, (b) the accuracy claims the gate
cannot see (estimate error, CMS overestimate property, Bloom
no-false-negative), (c) mergeability (register max-merge), and (d)
the exhaustive ln() cross-engine proof that lets the linear-counting
branch of ``est_milli`` be an exact gate value.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

HLL_REG_SQL = """
WITH h AS (
    SELECT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
    FROM events
),
r AS (
    SELECT event_type, CAST(h % 256 AS BIGINT) AS bucket, h // 256 AS rest
    FROM h
)
SELECT event_type, bucket,
       CAST(max(57 - CASE WHEN rest = 0 THEN 0
                          ELSE length(bin(rest)) END) AS BIGINT) AS register
FROM r GROUP BY event_type, bucket
"""


def _duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestHllMd5:
    def test_registers_match_oracle(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sketches import hll_md5_registers

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        )
        got = _canon(hll_md5_registers(events, p=8).to_pandas())
        want = _canon(_duck().execute(HLL_REG_SQL).df())
        pd.testing.assert_frame_equal(got, want)

    def test_registers_merge_by_max(self, ray_session):
        """Mergeability: registers of the union == element-wise max of
        the halves' registers — the property that makes the sketch a
        one-exchange distributed aggregate."""
        import ray.data

        from pdf_extractor_ray.functions.sketches import hll_md5_registers

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id", "event_id"]
        )
        lo = events.filter(lambda r: r["event_id"] % 2 == 0)
        hi = events.filter(lambda r: r["event_id"] % 2 == 1)
        whole = _canon(hll_md5_registers(events, p=8).to_pandas())
        parts = pd.concat(
            [
                hll_md5_registers(lo, p=8).to_pandas(),
                hll_md5_registers(hi, p=8).to_pandas(),
            ]
        )
        merged = _canon(
            parts.groupby(["event_type", "bucket"], as_index=False)
            .agg(register=("register", "max"))
        )
        pd.testing.assert_frame_equal(whole, merged)

    def test_estimate_accuracy_vs_exact(self, ray_session):
        """The gate checks exactness of the arithmetic; THIS pins that
        the arithmetic is a good estimator: est_milli/1000 within the
        HLL p=8 error envelope of the true distinct count."""
        import ray.data

        from pdf_extractor_ray.functions.sketches import hll_md5_estimate

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        )
        est = hll_md5_estimate(events, p=8).to_pandas().set_index("event_type")
        want = (
            _duck()
            .execute(
                "SELECT event_type, count(DISTINCT user_id) AS n "
                "FROM events GROUP BY event_type"
            )
            .df()
            .set_index("event_type")
        )
        assert set(est.index) == set(want.index)
        for et in want.index:
            exact = int(want.loc[et, "n"])
            approx = est.loc[et, "est_milli"] / 1000.0
            # 1.04/sqrt(256) ~ 6.5% standard error; allow 3 sigma + slack
            assert abs(approx - exact) <= max(3, 0.25 * exact), (et, approx, exact)

    def test_linear_counting_cross_engine_exhaustive(self):
        """The est_milli linear-counting branch is float ln() — exact
        at the gate ONLY because its input domain is the 2^p possible
        empty-bucket counts. Prove it: all 256 values agree between
        Python libm and DuckDB."""
        rows = duckdb.connect().execute(
            """
            SELECT v, CAST(floor(1000.0 * 256.0 * ln(256.0 / v)) AS BIGINT)
            FROM (SELECT unnest(generate_series(1, 256)) AS v)
            """
        ).fetchall()
        assert len(rows) == 256
        for v, lin in rows:
            assert lin == math.floor(1000.0 * 256.0 * math.log(256.0 / v)), v


class TestCountMin:
    def test_counters_match_oracle_and_mass(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sketches import cms_register_table

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        grid = cms_register_table(docs, depth=4, width=512).to_pandas()
        # every row of the sketch preserves total token mass
        mass = grid.groupby("r")["cnt"].sum()
        n_tokens = _duck().execute(
            "SELECT count(*) FROM (SELECT unnest(regexp_extract_all("
            "lower(coalesce(text,'')), '[a-z0-9]+')) FROM documents)"
        ).fetchone()[0]
        assert set(mass.index) == {0, 1, 2, 3}
        assert (mass == n_tokens).all()

    def test_point_query_never_undercounts(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sketches import cms_topk_report

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        top = cms_topk_report(docs, k=20).to_pandas()
        assert len(top) == 20
        assert (top["n_cms"] >= top["n_exact"]).all()

    def test_planted_heavy_hitter_estimate(self, ray_session):
        """A word dominating the stream gets a CMS estimate within the
        standard eps*N additive bound (eps = e/width)."""
        import ray.data

        from pdf_extractor_ray.functions.sketches import cms_topk_report

        texts = ["zebra apple " * 10] * 50 + ["kiwi mango papaya"] * 20
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        )
        top = cms_topk_report(ds, k=3, width=512).to_pandas().set_index("word")
        n_total = 50 * 20 + 20 * 3
        eps_n = math.e / 512 * n_total
        assert int(top.loc["zebra", "n_exact"]) == 500
        assert 500 <= int(top.loc["zebra", "n_cms"]) <= 500 + eps_n


class TestBloom:
    @staticmethod
    def _report(k=5, bits_p=14):
        import ray.data

        from pdf_extractor_ray.functions.sketches import bloom_membership_report

        ids = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])

        def mk_members(batch: pa.Table) -> pa.Table:
            d = batch["doc_id"].to_pandas()
            d = d[d % 3 == 0]
            return pa.table({"v": pa.array([f"v-{i}" for i in d], pa.string())})

        def mk_probes(batch: pa.Table) -> pa.Table:
            d = batch["doc_id"].to_pandas()
            return pa.table(
                {
                    "doc_id": pa.array(d, pa.int64()),
                    "truth": pa.array((d % 3 == 0).astype("int64"), pa.int64()),
                    "v": pa.array([f"v-{i}" for i in d], pa.string()),
                }
            )

        members = ids.map_batches(mk_members, batch_format="pyarrow")
        probes = ids.map_batches(mk_probes, batch_format="pyarrow")
        return bloom_membership_report(
            members, probes, k=k, bits_p=bits_p
        ).to_pandas()

    def test_no_false_negatives_and_deterministic(self, ray_session):
        a = _canon(self._report())
        b = _canon(self._report())
        pd.testing.assert_frame_equal(a, b)
        # a Bloom filter NEVER misses a true member
        assert (a.loc[a["truth"] == 1, "bloom_hit"] == 1).all()

    def test_false_positive_rate_under_pressure(self, ray_session):
        """Shrink the filter until it saturates: FP rate climbs but
        stays deterministic, and false negatives remain impossible."""
        tight = self._report(k=5, bits_p=8)  # 256 bits for ~170 members
        assert (tight.loc[tight["truth"] == 1, "bloom_hit"] == 1).all()
        neg = tight[tight["truth"] == 0]
        # 170 members * 5 hashes into 256 bits -> filter ~ saturated,
        # nearly every negative probe collides
        assert (neg["bloom_hit"] == 1).mean() > 0.5
