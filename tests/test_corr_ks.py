"""corr_moments / ks_statistic (corpus_stats.py)."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(n=500, seed=13):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        words = [f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 40))]
        text = " ".join(words)
        rows.append((i, text, f"src{rng.randrange(4)}", len(text)))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


class TestCorrMoments:
    def test_matches_pandas(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.corpus_stats import corr_moments

        tbl = _docs()
        got = (
            corr_moments(ray.data.from_arrow(tbl))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )

        df = tbl.to_pandas()
        df["y"] = df.text.str.count(" ").astype(np.int64) + 1
        df["x"] = df.n_chars
        want = (
            df.assign(
                n=1, sum_x=df.x, sum_y=df.y,
                sum_xx=df.x * df.x, sum_yy=df.y * df.y, sum_xy=df.x * df.y,
            )
            .groupby("source", as_index=False)[
                ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
            ]
            .sum()
            .sort_values("source")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["source", "n", "sum_x", "sum_y", "sum_xx", "sum_yy",
                 "sum_xy"]],
            want[["source", "n", "sum_x", "sum_y", "sum_xx", "sum_yy",
                  "sum_xy"]],
        )
        # derived Pearson r sanity: chars and words strongly correlated
        r0 = want.iloc[0]
        num = r0.n * r0.sum_xy - r0.sum_x * r0.sum_y
        den = np.sqrt(
            (r0.n * r0.sum_xx - r0.sum_x**2)
            * (r0.n * r0.sum_yy - r0.sum_y**2)
        )
        assert num / den > 0.95


class TestKsStatistic:
    def test_matches_bruteforce(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.corpus_stats import ks_statistic

        tbl = _docs(seed=29)
        got = ks_statistic(
            ray.data.from_arrow(tbl), side_col="source",
            side_b_value="src1", value_col="n_chars",
        )

        df = tbl.to_pandas()
        a = np.sort(df.loc[df.source != "src1", "n_chars"].to_numpy())
        b = np.sort(df.loc[df.source == "src1", "n_chars"].to_numpy())
        grid = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(a, grid, side="right")
        cb = np.searchsorted(b, grid, side="right")
        ks_num = int(np.abs(ca * len(b) - cb * len(a)).max())
        assert int(got["n_a"].iloc[0]) == len(a)
        assert int(got["n_b"].iloc[0]) == len(b)
        assert int(got["ks_num"].iloc[0]) == ks_num

    def test_identical_distributions_zero(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.corpus_stats import ks_statistic

        # two sides with the SAME value multiset scaled 2:1 -> D == 0
        vals = [5, 5, 7, 9] * 30
        tbl = pa.table(
            {
                "source": pa.array(
                    ["a"] * 80 + ["b"] * 40
                ),
                "n_chars": pa.array(vals[:80] + vals[:40], pa.int64()),
            }
        )
        got = ks_statistic(
            ray.data.from_arrow(tbl), side_col="source",
            side_b_value="b", value_col="n_chars",
        )
        assert int(got["ks_num"].iloc[0]) == 0


class TestRollupCounts:
    def test_matches_pandas(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import rollup_counts

        tbl = _docs(seed=41)
        lang = [f"l{(i * 7) % 3}" for i in range(tbl.num_rows)]
        tbl = tbl.append_column("lang", pa.array(lang))
        got = (
            rollup_counts(
                ray.data.from_arrow(tbl), keys=("source", "lang"),
                value_col="n_chars",
            )
            .sort_values(["source", "lang"])
            .reset_index(drop=True)
        )

        df = tbl.to_pandas()
        finest = df.groupby(["source", "lang"], as_index=False).agg(
            n_rows=("n_chars", "size"), sum_value=("n_chars", "sum")
        )
        sub = finest.groupby("source", as_index=False)[
            ["n_rows", "sum_value"]
        ].sum()
        sub["lang"] = "(all)"
        grand = pd.DataFrame(
            {
                "source": ["(all)"], "lang": ["(all)"],
                "n_rows": [len(df)], "sum_value": [df.n_chars.sum()],
            }
        )
        want = (
            pd.concat(
                [finest, sub[["source", "lang", "n_rows", "sum_value"]],
                 grand],
                ignore_index=True,
            )
            .astype({"n_rows": np.int64, "sum_value": np.int64})
            .sort_values(["source", "lang"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["source", "lang", "n_rows", "sum_value"]], want
        )
