"""hourly_spikes / nation_revenue (relational.py) + kwic_snippets (textstats.py)."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa


class TestHourlySpikes:
    def test_matches_bruteforce_random(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import hourly_spikes

        rng = random.Random(11)
        rows = [
            (rng.randrange(12), rng.randrange(72) * 3_600_000_000 +
             rng.randrange(3_600_000_000))
            for _ in range(2_000)
        ]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        factor = 2
        got = (
            hourly_spikes(ray.data.from_arrow(tbl), factor=factor)
            .to_pandas()
            .set_index("user_id")
        )

        per = {}
        for u, ts in rows:
            per.setdefault(u, {}).setdefault(ts // 1_000_000 // 3600, 0)
            per[u][ts // 1_000_000 // 3600] += 1
        assert len(got) == len(per)
        for u, hours in per.items():
            nh = len(hours)
            ne = sum(hours.values())
            spikes = sum(1 for n in hours.values() if n * nh > factor * ne)
            r = got.loc[u]
            assert int(r["n_active_hours"]) == nh
            assert int(r["n_spike_hours"]) == spikes
            assert int(r["peak_hour_events"]) == max(hours.values())

    def test_planted_burst(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import hourly_spikes

        # user 1: 9 quiet hours of 1 event + one 50-event burst hour
        ts = [h * 3_600_000_000 for h in range(9)] + [400_000_000_000] * 50
        tbl = pa.table(
            {
                "user_id": pa.array([1] * len(ts), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
        got = hourly_spikes(ray.data.from_arrow(tbl), factor=3).to_pandas()
        assert len(got) == 1
        # burst: 50 * 10 active hours > 3 * 59 events; quiet hours don't
        assert int(got["n_spike_hours"].iloc[0]) == 1
        assert int(got["peak_hour_events"].iloc[0]) == 50


class TestNationRevenue:
    def test_matches_pandas_join(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import nation_revenue

        rng = random.Random(5)
        n_ord, n_cust, n_supp, n_nat = 300, 40, 12, 5
        li = pd.DataFrame(
            {
                "l_orderkey": [rng.randrange(n_ord) for _ in range(1_500)],
                "l_suppkey": [rng.randrange(n_supp) for _ in range(1_500)],
                "l_extendedprice": [
                    round(rng.uniform(1, 1000), 2) for _ in range(1_500)
                ],
                "l_discount": [
                    round(rng.uniform(0, 0.1), 2) for _ in range(1_500)
                ],
            }
        )
        od = pd.DataFrame(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": [rng.randrange(n_cust) for _ in range(n_ord)],
            }
        )
        cu = pd.DataFrame(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_nationkey": [rng.randrange(n_nat) for _ in range(n_cust)],
            }
        )
        su = pd.DataFrame(
            {
                "s_suppkey": np.arange(n_supp, dtype=np.int64),
                "s_nationkey": [rng.randrange(n_nat) for _ in range(n_supp)],
            }
        )
        nat = pd.DataFrame(
            {
                "n_nationkey": np.arange(n_nat, dtype=np.int64),
                "n_name": [f"NATION_{i}" for i in range(n_nat)],
            }
        )
        got = (
            nation_revenue(
                ray.data.from_pandas(li),
                ray.data.from_pandas(od),
                ray.data.from_pandas(cu),
                ray.data.from_pandas(su),
                nat,
                n_buckets=8,
            )
            .to_pandas()
            .sort_values("n_name")
            .reset_index(drop=True)
        )

        m = (
            li.assign(
                rev_c=np.floor(
                    li.l_extendedprice * (1 - li.l_discount) * 100 + 0.5
                ).astype(np.int64)
            )
            .merge(od, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cu, left_on="o_custkey", right_on="c_custkey")
            .merge(su, left_on="l_suppkey", right_on="s_suppkey")
        )
        m = m[m.c_nationkey == m.s_nationkey]
        want = (
            m.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
            .groupby("n_name", as_index=False)["rev_c"]
            .sum()
            .rename(columns={"rev_c": "revenue_c"})
            .sort_values("n_name")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["n_name", "revenue_c"]], want[["n_name", "revenue_c"]]
        )


class TestKwicSnippets:
    def test_positions_and_snippets(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.textstats import kwic_snippets

        texts = [
            "the data pipeline",          # mid
            "data at the very start",     # pos 1, short head
            "no match at all",            # dropped
            "tail data",                  # short tail
            "héllo wörld data multibyte", # multibyte head
            "data and then data again",   # first occurrence only
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
        got = (
            kwic_snippets(
                ray.data.from_arrow(tbl), term="data", context=5
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert sorted(got.index) == [0, 1, 3, 4, 5]
        for i, text in enumerate(texts):
            p = text.find("data")
            if p < 0:
                continue
            assert int(got.loc[i, "pos"]) == p + 1
            want = text[max(p - 5, 0): p] + "data" + text[p + 4: p + 4 + 5]
            assert got.loc[i, "snippet"] == want


class TestReturnedRevenueTopk:
    def test_matches_pandas(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import (
            returned_revenue_topk,
        )

        rng = random.Random(3)
        n_ord = 200
        li = pd.DataFrame(
            {
                "l_orderkey": [rng.randrange(n_ord) for _ in range(1_000)],
                "l_extendedprice": [
                    round(rng.uniform(1, 500), 2) for _ in range(1_000)
                ],
                "l_discount": [
                    round(rng.uniform(0, 0.1), 2) for _ in range(1_000)
                ],
                "l_returnflag": [
                    rng.choice(["R", "N", "A"]) for _ in range(1_000)
                ],
            }
        )
        od = pd.DataFrame(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": [rng.randrange(30) for _ in range(n_ord)],
                "o_orderdate": pd.to_datetime(
                    [
                        f"199{rng.randrange(5, 8)}-0{rng.randrange(1, 9)}-01"
                        for _ in range(n_ord)
                    ]
                ),
            }
        )
        got = returned_revenue_topk(
            ray.data.from_pandas(li),
            ray.data.from_pandas(od),
            k=5,
            n_buckets=8,
        ).to_pandas()

        m = li[li.l_returnflag == "R"].merge(
            od, left_on="l_orderkey", right_on="o_orderkey"
        )
        m = m[
            (m.o_orderdate >= "1996-01-01") & (m.o_orderdate < "1997-01-01")
        ]
        m["rev_c"] = np.floor(
            m.l_extendedprice * (1 - m.l_discount) * 100 + 0.5
        ).astype(np.int64)
        want = (
            m.groupby("o_custkey", as_index=False)["rev_c"]
            .sum()
            .sort_values(["rev_c", "o_custkey"], ascending=[False, True])
            .head(5)
            .reset_index(drop=True)
        )
        assert list(got["c_custkey"]) == list(want["o_custkey"])
        assert list(got["revenue_c"]) == list(want["rev_c"])


class TestPromoRevenueByMonth:
    def test_matches_pandas(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import (
            promo_revenue_by_month,
        )

        rng = random.Random(9)
        n_part = 50
        li = pd.DataFrame(
            {
                "l_partkey": [rng.randrange(n_part) for _ in range(800)],
                "l_shipdate": pd.to_datetime(
                    [
                        f"199{rng.randrange(5, 8)}-{rng.randrange(1, 13):02d}-15"
                        for _ in range(800)
                    ]
                ),
                "l_extendedprice": [
                    round(rng.uniform(1, 500), 2) for _ in range(800)
                ],
                "l_discount": [
                    round(rng.uniform(0, 0.1), 2) for _ in range(800)
                ],
            }
        )
        pt = pd.DataFrame(
            {
                "p_partkey": np.arange(n_part, dtype=np.int64),
                "p_type": [
                    rng.choice(["ECONOMY", "SMALL", "LARGE"])
                    for _ in range(n_part)
                ],
            }
        )
        got = (
            promo_revenue_by_month(
                ray.data.from_pandas(li),
                ray.data.from_pandas(pt),
                n_buckets=8,
            )
            .to_pandas()
            .sort_values("ym")
            .reset_index(drop=True)
        )

        m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
        m["ym"] = (
            m.l_shipdate.dt.year * 100 + m.l_shipdate.dt.month
        ).astype(np.int64)
        m["rev_c"] = np.floor(
            m.l_extendedprice * (1 - m.l_discount) * 100 + 0.5
        ).astype(np.int64)
        m["promo_c"] = m.rev_c * (m.p_type == "ECONOMY")
        want = (
            m.groupby("ym", as_index=False)
            .agg(
                promo_revenue_c=("promo_c", "sum"),
                total_revenue_c=("rev_c", "sum"),
            )
            .sort_values("ym")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["ym", "promo_revenue_c", "total_revenue_c"]], want
        )


class TestConversionLatency:
    def test_matches_bruteforce(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import conversion_latency

        rng = random.Random(17)
        rows = [
            (
                rng.randrange(25),
                rng.randrange(1_000_000) * 1_000_000,
                rng.choice(["view", "purchase", "click"]),
            )
            for _ in range(3_000
            )
        ]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows]),
            }
        )
        got = (
            conversion_latency(ray.data.from_arrow(tbl), n_buckets=8)
            .to_pandas()
            .set_index("user_id")["latency_us"]
        )

        want = {}
        for u in {r[0] for r in rows}:
            views = [t for uu, t, e in rows if uu == u and e == "view"]
            if not views:
                continue
            v = min(views)
            purchases = [
                t for uu, t, e in rows
                if uu == u and e == "purchase" and t >= v
            ]
            if purchases:
                want[u] = min(purchases) - v
        assert dict(got) == want

    def test_purchase_before_first_view_ignored(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import conversion_latency

        rows = [
            (1, 100, "purchase"),  # before any view: not a conversion
            (1, 200, "view"),
            (1, 500, "purchase"),
            (2, 300, "view"),      # no purchase after: dropped
        ]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([r[2] for r in rows]),
            }
        )
        got = conversion_latency(
            ray.data.from_arrow(tbl), n_buckets=4
        ).to_pandas()
        assert len(got) == 1
        assert int(got["user_id"].iloc[0]) == 1
        assert int(got["latency_us"].iloc[0]) == 300 * 1_000_000


class TestInterarrivalStats:
    def test_matches_bruteforce(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import interarrival_stats

        rng = random.Random(23)
        rows = [
            (rng.randrange(15), rng.randrange(10_000) * 1_000_000, i)
            for i in range(1_200)
        ]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        got = (
            interarrival_stats(ray.data.from_arrow(tbl), n_buckets=8)
            .to_pandas()
            .set_index("user_id")
        )

        per = {}
        for u, ts, eid in rows:
            per.setdefault(u, []).append((ts, eid))
        for u, evs in per.items():
            evs.sort()
            gaps = [
                evs[i + 1][0] - evs[i][0] for i in range(len(evs) - 1)
            ]
            if not gaps:
                assert u not in got.index
                continue
            r = got.loc[u]
            assert int(r["n_gaps"]) == len(gaps)
            assert int(r["min_gap_us"]) == min(gaps)
            assert int(r["max_gap_us"]) == max(gaps)
            assert int(r["sum_gap_us"]) == sum(gaps)


class TestLastTouchAttribution:
    def test_matches_bruteforce(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import (
            last_touch_attribution,
        )

        rng = random.Random(31)
        rows = [
            (
                rng.randrange(20),
                rng.randrange(100_000) * 1_000_000,
                i,
                rng.choice(["view", "click", "purchase", "error"]),
            )
            for i in range(1_500)
        ]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
            }
        )
        got = (
            last_touch_attribution(
                ray.data.from_arrow(tbl), target_type="purchase",
                n_buckets=8,
            )
            .to_pandas()
            .set_index("attributed_type")["n"]
            .to_dict()
        )

        from collections import Counter, defaultdict

        per = defaultdict(list)
        for u, ts, eid, et in rows:
            per[u].append((ts, eid, et))
        want = Counter()
        for u, evs in per.items():
            evs.sort()
            for i, (_, _, et) in enumerate(evs):
                if et == "purchase":
                    want[evs[i - 1][2] if i else "none"] += 1
        assert got == dict(want)


class TestProfileColumns:
    def test_matches_pandas(self, ray_session):
        import ray

        from pdf_extractor_ray.functions.relational import profile_columns

        rng = random.Random(37)
        n = 900
        qty = [rng.randrange(1, 50) for _ in range(n)]
        price = [
            None if rng.random() < 0.1 else round(rng.uniform(1, 999), 2)
            for _ in range(n)
        ]
        tbl = pa.table(
            {
                "q": pa.array(qty, pa.int64()),
                "p": pa.array(price, pa.float64()),
            }
        )
        got = (
            profile_columns(
                ray.data.from_arrow(tbl), int_cols=("q",), cent_cols=("p",)
            )
            .to_pandas()
            .set_index("col")
        )
        pv = [int(np.floor(x * 100 + 0.5)) for x in price if x is not None]
        assert int(got.loc["q", "n_rows"]) == n
        assert int(got.loc["q", "n_null"]) == 0
        assert int(got.loc["q", "min_v"]) == min(qty)
        assert int(got.loc["q", "max_v"]) == max(qty)
        assert int(got.loc["q", "sum_v"]) == sum(qty)
        assert int(got.loc["p", "n_null"]) == price.count(None)
        assert int(got.loc["p", "min_v"]) == min(pv)
        assert int(got.loc["p", "max_v"]) == max(pv)
        assert int(got.loc["p", "sum_v"]) == sum(pv)
