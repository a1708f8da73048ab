"""New corpus/relational operators vs DuckDB goldens at sf0.001:
sessionization, as-of join, url dedup, word top-k, IVF ANN.

Each test mirrors the driver's correctness gate shape (same SQL as
__ray_entry__.oracle_sql) but at the smallest sf so the suite stays
fast. knn_ivf has no SQL oracle — its anchor is exact equality with
brute force under a full probe (nprobe == n_cells degrades IVF to a
scan) plus sanity under a partial probe.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("events", "orders", "documents", "embeddings"):
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


def _to_pandas(result):
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


class TestSessionize:
    def test_matches_window_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import sessionize_users

        events = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        got = _canon(_to_pandas(sessionize_users(events, gap_s=1800)))
        want = _canon(
            _duck()
            .execute(
                """
                WITH x AS (
                    SELECT user_id, ts,
                           CASE WHEN lag(ts) OVER w IS NULL
                                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                        > 1800 * 1000000
                                THEN 1 ELSE 0 END AS is_start
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
                )
                SELECT user_id, sum(is_start) AS n_sessions, count(*) AS n_events
                FROM x GROUP BY user_id
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_single_user_gap_fold(self, ray_session):
        import datetime

        import ray.data

        from pdf_extractor_ray.functions.relational import sessionize_users

        base = datetime.datetime(2024, 1, 1)
        rows = [
            {"user_id": 7, "ts": base},
            {"user_id": 7, "ts": base + datetime.timedelta(minutes=10)},
            {"user_id": 7, "ts": base + datetime.timedelta(minutes=90)},  # new sess
            {"user_id": 7, "ts": base + datetime.timedelta(minutes=95)},
            {"user_id": 8, "ts": base},
        ]
        out = _to_pandas(sessionize_users(ray.data.from_items(rows), gap_s=1800))
        out = out.set_index("user_id")
        assert out.loc[7, "n_sessions"] == 2
        assert out.loc[7, "n_events"] == 4
        assert out.loc[8, "n_sessions"] == 1


class TestAsofJoin:
    def test_matches_duckdb_asof(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import latest_order_asof

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id", "ts"]
        )
        orders = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        ).to_pandas()
        got = _canon(_to_pandas(latest_order_asof(events, orders)))
        want = _canon(
            _duck()
            .execute(
                """
                WITH r AS (SELECT o_custkey, o_orderdate,
                                  max(o_totalprice) AS o_totalprice
                           FROM orders GROUP BY o_custkey, o_orderdate)
                SELECT e.event_type, count(*) AS n_events,
                       count(r.o_totalprice) AS n_matched,
                       coalesce(sum(CAST(floor(r.o_totalprice*100 + 0.5) AS BIGINT)), 0)
                           AS sum_price_c
                FROM events e ASOF LEFT JOIN r
                  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
                GROUP BY e.event_type
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestUrlDedup:
    def test_matches_group_sql(self, ray_session):
        import pyarrow as pa

        import ray.data

        from pdf_extractor_ray.functions.dedup import key_dedup_summary

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])

        def add_url(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            urls = [f"https://example.org/page-{i % 200}" for i in ids]
            return pa.table(
                {"url": pa.array(urls, pa.string()), "doc_id": batch["doc_id"]}
            )

        pages = docs.map_batches(add_url, batch_format="pyarrow")
        got = _canon(_to_pandas(key_dedup_summary(pages)))
        want = _canon(
            _duck()
            .execute(
                """
                WITH p AS (SELECT 'https://example.org/page-' || (doc_id % 200)
                                      AS url, doc_id
                           FROM documents)
                SELECT url, min(doc_id) AS keep_doc_id, count(*) AS dup_count
                FROM p GROUP BY url
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestWordTopK:
    def test_matches_unnest_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.textstats import word_topk

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        got = _to_pandas(word_topk(docs, k=20)).reset_index(drop=True)
        want = (
            _duck()
            .execute(
                """
                WITH w AS (SELECT unnest(regexp_extract_all(lower(text),
                                         '[a-z0-9]+')) AS word
                           FROM documents)
                SELECT word, count(*) AS n FROM w
                GROUP BY word ORDER BY n DESC, word LIMIT 20
                """
            )
            .df()
        )
        # order matters for top-k: compare positionally
        assert got["word"].tolist() == want["word"].tolist()
        assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()


class TestKnnIvf:
    @pytest.fixture(scope="class")
    def emb(self, ray_session):
        import ray.data

        return ray.data.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

    @pytest.fixture(scope="class")
    def queries(self):
        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        df = t.to_pandas().sort_values("vec_id").head(5)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        return df["vec_id"].tolist(), mat

    def test_full_probe_equals_bruteforce(self, emb, queries):
        from pdf_extractor_ray.functions.similarity import knn_bruteforce, knn_ivf

        ids, mat = queries
        brute = knn_bruteforce(emb, mat, ids, k=5)
        ivf = knn_ivf(emb, mat, ids, k=5, n_cells=8, nprobe=8)
        pd.testing.assert_frame_equal(
            ivf.reset_index(drop=True), brute.reset_index(drop=True),
            check_dtype=False,
        )

    def test_partial_probe_subset_and_recall(self, emb, queries):
        from pdf_extractor_ray.functions.similarity import knn_bruteforce, knn_ivf

        ids, mat = queries
        brute = knn_bruteforce(emb, mat, ids, k=5)
        ivf = knn_ivf(emb, mat, ids, k=5, n_cells=8, nprobe=3)
        # every query answered, ranks well-formed, self in top ranks
        assert set(ivf["query_id"]) == set(ids)
        for qid, grp in ivf.groupby("query_id"):
            assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
            assert (grp["cosine"].diff().dropna() <= 1e-12).all()
            # the query vector itself is always in its own probed cell
            assert grp.iloc[0]["neighbor_id"] == qid
        # partial probe keeps decent recall vs brute on the top-5
        hits = len(
            set(map(tuple, ivf[["query_id", "neighbor_id"]].values))
            & set(map(tuple, brute[["query_id", "neighbor_id"]].values))
        )
        assert hits / len(brute) >= 0.3


class TestClusterAssign:
    def test_every_vector_assigned_once_deterministically(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.similarity import cluster_assign

        emb = ray.data.read_parquet(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        a = cluster_assign(emb, n_clusters=8).to_pandas().sort_values("vec_id")
        b = cluster_assign(emb, n_clusters=8).to_pandas().sort_values("vec_id")
        n = emb.count()
        assert len(a) == n and a["vec_id"].is_unique
        assert a["cluster"].between(0, 7).all()
        assert a["cluster"].nunique() > 1  # nontrivial partition
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


class TestHashSample:
    def test_matches_md5_bucket_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sampling import hash_sample

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
        got = _canon(_to_pandas(hash_sample(docs, pct=10)))
        want = _canon(
            _duck()
            .execute(
                """
                SELECT doc_id, lang FROM documents
                WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       % 100) < 10
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_sample_is_stable_and_salted(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sampling import hash_sample

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        a = set(_to_pandas(hash_sample(docs, pct=20))["doc_id"])
        b = set(_to_pandas(hash_sample(docs, pct=20))["doc_id"])
        c = set(_to_pandas(hash_sample(docs, pct=20, salt="v2"))["doc_id"])
        assert a == b            # order/partition independent
        assert a != c            # salt changes membership
        n = docs.count()
        assert 0.1 * n < len(a) < 0.3 * n  # ~20%

    def test_nested_samples(self, ray_session):
        # pct=10 sample is a subset of the pct=50 sample (same salt) —
        # the property that makes hash sampling usable for growing dev sets
        import ray.data

        from pdf_extractor_ray.functions.sampling import hash_sample

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        small = set(_to_pandas(hash_sample(docs, pct=10))["doc_id"])
        big = set(_to_pandas(hash_sample(docs, pct=50))["doc_id"])
        assert small <= big


class TestGroupTopK:
    def test_matches_window_rank_sql(self, ray_session):
        import ray.data
        from ray.data.aggregate import Count

        from pdf_extractor_ray.functions.relational import topk_per_group

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        )
        counted = events.groupby(["event_type", "user_id"]).aggregate(
            Count(alias_name="n_events")
        )
        got = _canon(
            _to_pandas(
                topk_per_group(
                    counted, group_col="event_type", order_col="n_events",
                    tiebreak_col="user_id", k=3,
                )
            )
        )
        want = _canon(
            _duck()
            .execute(
                """
                WITH c AS (SELECT event_type, user_id, count(*) AS n_events
                           FROM events GROUP BY event_type, user_id),
                     r AS (SELECT *, row_number() OVER (
                                         PARTITION BY event_type
                                         ORDER BY n_events DESC, user_id) AS rank
                           FROM c)
                SELECT event_type, user_id, n_events, rank FROM r WHERE rank <= 3
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestWordHeavyHitters:
    def test_sketch_path_equals_exact_topk(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.textstats import (
            word_heavy_hitters,
            word_topk,
        )

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        exact = _to_pandas(word_topk(docs, k=20)).reset_index(drop=True)
        sketch = _to_pandas(word_heavy_hitters(docs, k=20)).reset_index(drop=True)
        pd.testing.assert_frame_equal(sketch, exact, check_dtype=False)

    def test_small_capacity_still_finds_dominant_words(self, ray_session):
        # capacity far below vocabulary: the guaranteed-survivor bound
        # (freq > n/capacity) must still keep the most frequent word
        import ray.data

        from pdf_extractor_ray.functions.textstats import (
            word_heavy_hitters,
            word_topk,
        )

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        exact = _to_pandas(word_topk(docs, k=1))
        sketch = _to_pandas(word_heavy_hitters(docs, k=5, capacity=64))
        assert exact["word"].iloc[0] in set(sketch["word"])


class TestHllDistinct:
    def test_estimate_within_tolerance_of_exact(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sketches import hll_distinct_per_key

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        )
        got = _to_pandas(hll_distinct_per_key(events)).set_index("event_type")
        want = (
            _duck()
            .execute(
                "SELECT event_type, count(DISTINCT user_id) AS n FROM events "
                "GROUP BY event_type"
            )
            .df()
            .set_index("event_type")
        )
        assert set(got.index) == set(want.index)
        for et in want.index:
            exact = want.loc[et, "n"]
            approx = got.loc[et, "approx_distinct"]
            assert abs(approx - exact) <= max(2, 0.05 * exact), (et, approx, exact)

    def test_sketch_is_deterministic(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.sketches import hll_distinct_per_key

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        )
        a = _canon(_to_pandas(hll_distinct_per_key(events)))
        b = _canon(_to_pandas(hll_distinct_per_key(events)))
        pd.testing.assert_frame_equal(a, b)


class TestMultimodalStages:
    @pytest.fixture(scope="class")
    def media(self, ray_session):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

        def to_media(batch):
            return pa.table(
                {"media_id": batch["doc_id"], "payload": pc.cast(batch["text"], pa.binary())}
            )

        return docs.map_batches(to_media, batch_format="pyarrow")

    def test_resize_deterministic_and_bounded(self, media):
        from pdf_extractor_ray.functions.multimodal import media_resize

        a = _canon(_to_pandas(media_resize(media, target=256)).drop(columns=["payload"]))
        b = _canon(_to_pandas(media_resize(media, target=256)).drop(columns=["payload"]))
        pd.testing.assert_frame_equal(a, b)
        assert (a[["width", "height"]].max(axis=1) <= 256).all()
        assert (a[["width", "height"]].min(axis=1) >= 1).all()

    def test_frame_sample_matches_length_arith(self, media):
        from pdf_extractor_ray.functions.multimodal import frame_sample

        frames = _to_pandas(frame_sample(media, every_n=2))
        per = frames.groupby("media_id").size()
        want = (
            _duck()
            .execute(
                "SELECT doc_id, (greatest(1, octet_length(encode(text)) // 4096) + 1) // 2 AS n"
                " FROM documents"
            )
            .df()
            .set_index("doc_id")["n"]
        )
        for mid, n in per.items():
            assert n == want.loc[mid]

    def test_strict_decoder_raises(self, media):
        import pyarrow as pa
        import pytest as _pytest

        from pdf_extractor_ray.functions.multimodal import FrameSampler, MediaResizer

        batch = pa.table({"media_id": [1], "payload": [b"x"]})
        with _pytest.raises(NotImplementedError):
            MediaResizer(decoder="strict")(batch)
        with _pytest.raises(NotImplementedError):
            FrameSampler(decoder="strict")(batch)


class TestPivotAndRollup:
    def test_pivot_matches_conditional_agg_sql(self, ray_session):
        import importlib

        em = importlib.import_module("__ray_entry__")
        got = _canon(_to_pandas(em.queries()["events_pivot"](SF)))
        want = _canon(
            _duck()
            .execute(em.oracle_sql()["events_pivot"].replace("FROM events", "FROM events"))
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_rollup_levels_are_consistent(self, ray_session):
        import importlib

        em = importlib.import_module("__ray_entry__")
        df = _to_pandas(em.queries()["pricing_rollup"](SF))
        fine = df[df["l_linestatus"].notna()]
        flag = df[df["l_linestatus"].isna() & df["l_returnflag"].notna()]
        total = df[df["l_returnflag"].isna()]
        assert len(total) == 1
        # internal consistency across levels
        assert fine["revenue_c"].sum() == total["revenue_c"].iloc[0]
        assert flag["revenue_c"].sum() == total["revenue_c"].iloc[0]
        assert fine["n_rows"].sum() == total["n_rows"].iloc[0]


class TestAsofPartitioned:
    def test_partitioned_equals_broadcast(self, ray_session):
        """The big-right-side as-of variant must produce byte-identical
        rollups to the broadcast path on the same inputs."""
        import pandas as pd
        import pyarrow.parquet as pq

        import ray.data

        from pdf_extractor_ray.functions.relational import (
            latest_order_asof,
            latest_order_asof_partitioned,
        )

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id", "ts"]
        )
        orders_pd = pq.read_table(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        ).to_pandas()
        a = latest_order_asof(events, orders_pd).to_pandas()
        events2 = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "user_id", "ts"]
        )
        orders_ds = ray.data.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        b = latest_order_asof_partitioned(events2, orders_ds).to_pandas()
        key = "event_type"
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
            check_dtype=False,
        )


class TestRangeJoinBroadcast:
    def _ranges(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "lo": [0, 10, 30],
                "hi": [5, 20, 40],
                "range_key": ["a", "b", "c"],
            }
        )

    def test_inner_drops_gaps_and_bounds(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.relational import (
            range_join_broadcast,
        )

        # values probe: inside, on-lo (in), on-hi (out), gap, below, above
        vals = [0.0, 4.999, 5.0, 10.0, 19.999, 25.0, -1.0, 39.0, 40.0]
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(len(vals)), pa.int64()),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        ).repartition(3)
        out = (
            range_join_broadcast(ds, self._ranges(), value_col="value")
            .to_pandas()
            .sort_values("event_id")
        )
        got = dict(zip(out.event_id, out.range_key))
        assert got == {0: "a", 1: "a", 3: "b", 4: "b", 7: "c"}

    def test_left_keeps_nulls(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.relational import (
            range_join_broadcast,
        )

        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([1, 2], pa.int64()),
                    "value": pa.array([2.0, 7.0], pa.float64()),
                }
            )
        )
        out = (
            range_join_broadcast(
                ds, self._ranges(), value_col="value", how="left"
            )
            .to_pandas()
            .sort_values("event_id")
        )
        assert list(out.range_key) == ["a", None]

    def test_overlap_guard(self, ray_session):
        import pandas as pd
        import pytest as _pytest

        from pdf_extractor_ray.functions.relational import (
            range_join_broadcast,
        )

        bad = pd.DataFrame(
            {"lo": [0, 3], "hi": [5, 8], "range_key": ["a", "b"]}
        )
        with _pytest.raises(ValueError, match="overlap"):
            range_join_broadcast(
                ray_session.data.range(1), bad, value_col="id"
            )


class TestRangeJoinPartitioned:
    def test_matches_broadcast_path(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from pdf_extractor_ray.functions.relational import (
            range_join_broadcast,
            range_join_partitioned,
        )

        rng = np.random.RandomState(11)
        vals = (rng.rand(2000) * 1000).round(3)
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(2000), pa.int64()),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        ).repartition(6)
        # irregular disjoint ranges with gaps, some spanning bins
        ranges = pd.DataFrame(
            {
                "lo": [0, 40, 95, 210, 420, 430, 700],
                "hi": [30, 90, 205, 400, 428, 650, 1000],
                "range_key": list("abcdefg"),
            }
        )
        want = (
            range_join_broadcast(ds, ranges, value_col="value")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got = (
            range_join_partitioned(
                ds, ranges, value_col="value", bin_width=100.0, n_buckets=8
            )
            .to_pandas()[["event_id", "value", "range_key"]]
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert list(want["event_id"]) == list(got["event_id"])
        assert list(want["range_key"]) == list(got["range_key"])
        assert len(want) > 100  # the test actually joined things


class TestSampledQuantiles:
    def test_tracks_exact_quantiles_within_rank_tolerance(self, ray_session):
        """The statistically right check: a sampled q-quantile must land
        between the exact (q-eps) and (q+eps) quantiles, eps from the
        binomial order-statistic bound ~2*sqrt(q(1-q)/m) for a sample
        of m rows. Runs at sf0.01 so per-type samples are large enough
        for the bound to be meaningful (VALUE-distance bounds are the
        wrong test — they depend on local density)."""
        import duckdb

        import ray.data

        from pdf_extractor_ray.functions.sketches import sampled_quantiles

        sf = "/root/testdata/sf0.01"
        events = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
        got = _to_pandas(
            sampled_quantiles(events, qs=(0.5, 0.9), pct=20)
        ).set_index("event_type")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM parquet_scan('{sf}/events.parquet')"
        )
        want = con.execute(
            "SELECT event_type, count(*) AS n, "
            "quantile_disc(CAST(floor(value*100+0.5) AS BIGINT), "
            "  [0.35, 0.5, 0.65, 0.78, 0.9, 0.97]) AS qv "
            "FROM events GROUP BY event_type"
        ).df().set_index("event_type")
        assert set(got.index) == set(want.index)
        for et in want.index:
            lo35, _, hi65, lo78, _, hi97 = [int(v) for v in want.loc[et, "qv"]]
            assert lo35 <= int(got.loc[et, "p50_c"]) <= hi65, (
                et, "p50", int(got.loc[et, "p50_c"]), lo35, hi65,
            )
            assert lo78 <= int(got.loc[et, "p90_c"]) <= hi97, (
                et, "p90", int(got.loc[et, "p90_c"]), lo78, hi97,
            )

    def test_sample_quantiles_match_duck_replay_exactly(self, ray_session):
        """Bit-determinism: DuckDB replaying the identical hash sample
        must agree EXACTLY (the property the driver oracle relies on)."""
        import ray.data

        from pdf_extractor_ray.functions.sketches import sampled_quantiles

        events = ray.data.read_parquet(
            f"{SF}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
        got = _canon(_to_pandas(sampled_quantiles(events, qs=(0.5, 0.9), pct=10)))
        want = _canon(
            _duck()
            .execute(
                "WITH s AS (SELECT event_type, value FROM events "
                "WHERE (('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT "
                "% 100) < 10) "
                "SELECT event_type, "
                "quantile_disc(CAST(floor(value*100+0.5) AS BIGINT), 0.5) AS p50_c, "
                "quantile_disc(CAST(floor(value*100+0.5) AS BIGINT), 0.9) AS p90_c "
                "FROM s GROUP BY event_type"
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want)


class TestBm25:
    def test_matches_duck_replay(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.textstats import bm25_topk

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        got = _canon(_to_pandas(bm25_topk(docs, "stream hash join", k=10)))
        want = _canon(
            _duck()
            .execute(
                """
            WITH w AS (SELECT doc_id,
                              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                       FROM documents),
            dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM w GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                          (SELECT sum(dl) FROM dl) AS total_len),
            tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                   FROM w WHERE term IN ('hash', 'join', 'stream')
                   GROUP BY doc_id, term),
            dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
            sc AS (SELECT tf.doc_id,
                          sum(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                              * tf.tf * (1.2 + 1.0)
                              / (tf.tf + 1.2 * (1.0 - 0.75
                                  + 0.75 * dl.dl / (st.total_len / st.n_docs)))) AS score
                   FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
                   GROUP BY tf.doc_id)
            SELECT doc_id, CAST(floor(score * 1000 + 0.5) AS BIGINT) AS score_m
            FROM sc ORDER BY score_m DESC, doc_id LIMIT 10
            """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want)

    def test_block_layout_invariant(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.textstats import bm25_topk

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        a = _canon(_to_pandas(bm25_topk(docs, "customer order", k=5)))
        b = _canon(
            _to_pandas(bm25_topk(docs.repartition(17), "customer order", k=5))
        )
        pd.testing.assert_frame_equal(a, b)

    def test_empty_query_raises(self, ray_session):
        import pytest as _pytest

        import ray.data

        from pdf_extractor_ray.functions.textstats import bm25_topk

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        with _pytest.raises(ValueError):
            bm25_topk(docs, "!!! ???")


def test_bm25_empty_corpus_returns_empty(ray_session):
    import pyarrow as pa

    import ray.data

    from pdf_extractor_ray.functions.textstats import bm25_topk

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    out = bm25_topk(empty, "stream hash join", k=5).to_pandas()
    assert len(out) == 0


class TestCooccurrence:
    def test_matches_self_join_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import cooccurrence_pairs

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "event_type"]
        )
        got = _canon(_to_pandas(cooccurrence_pairs(events)))
        want = _canon(
            _duck()
            .execute(
                "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), "
                "p AS (SELECT a.user_id, a.event_type AS t1, b.event_type AS t2 "
                "FROM ut a JOIN ut b ON a.user_id = b.user_id "
                "AND a.event_type < b.event_type) "
                "SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_users "
                "FROM p GROUP BY t1, t2"
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hand_case(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import cooccurrence_pairs

        rows = [
            {"user_id": 1, "event_type": "a"},
            {"user_id": 1, "event_type": "b"},
            {"user_id": 1, "event_type": "a"},  # dup event collapses
            {"user_id": 2, "event_type": "a"},
            {"user_id": 2, "event_type": "b"},
            {"user_id": 2, "event_type": "c"},
            {"user_id": 3, "event_type": "a"},  # singleton: no pairs
        ]
        out = (
            _to_pandas(cooccurrence_pairs(
                ray.data.from_items(rows, override_num_blocks=3)))
            .set_index(["t1", "t2"])["n_users"].to_dict()
        )
        assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


class TestRetention:
    def test_matches_self_join_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import retention_cohorts

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts"]
        )
        got = _canon(_to_pandas(retention_cohorts(events)))
        want = _canon(
            _duck()
            .execute(
                "WITH uw AS (SELECT DISTINCT user_id, "
                "(CAST(epoch_us(ts) AS BIGINT) // 86400000000 - 4) // 7 AS week "
                "FROM events), "
                "act AS (SELECT week, count(*) AS n_active FROM uw GROUP BY week), "
                "ret AS (SELECT a.week, count(*) AS n_retained FROM uw a JOIN uw b "
                "ON a.user_id = b.user_id AND b.week = a.week + 1 GROUP BY a.week) "
                "SELECT act.week, CAST(act.n_active AS BIGINT) AS n_active, "
                "CAST(coalesce(ret.n_retained, 0) AS BIGINT) AS n_retained "
                "FROM act LEFT JOIN ret ON act.week = ret.week"
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hand_case_gap_week_not_retained(self, ray_session):
        import datetime

        import ray.data

        from pdf_extractor_ray.functions.relational import retention_cohorts

        mon = datetime.datetime(2024, 1, 1)  # a Monday
        wk = datetime.timedelta(days=7)
        rows = [
            {"user_id": 1, "ts": mon},
            {"user_id": 1, "ts": mon + wk},          # retained w0
            {"user_id": 2, "ts": mon},
            {"user_id": 2, "ts": mon + 2 * wk},       # gap: NOT retained w0
            {"user_id": 3, "ts": mon + wk},
        ]
        out = (
            _to_pandas(retention_cohorts(
                ray.data.from_items(rows, override_num_blocks=2)))
            .sort_values("week").reset_index(drop=True)
        )
        assert out["n_active"].tolist() == [2, 2, 1]
        assert out["n_retained"].tolist() == [1, 0, 0]


class TestTransitions:
    def test_matches_lag_window_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import transition_counts

        events = ray.data.read_parquet(
            f"{SF}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        got = _canon(_to_pandas(transition_counts(events)))
        want = _canon(
            _duck()
            .execute(
                "WITH o AS (SELECT user_id, event_type, "
                "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
                "AS from_type FROM events) "
                "SELECT from_type, event_type AS to_type, "
                "CAST(count(*) AS BIGINT) AS n "
                "FROM o WHERE from_type IS NOT NULL GROUP BY from_type, to_type"
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hand_case_order_and_user_isolation(self, ray_session):
        import datetime

        import ray.data

        from pdf_extractor_ray.functions.relational import transition_counts

        base = datetime.datetime(2024, 1, 1)
        sec = datetime.timedelta(seconds=1)
        rows = [
            {"user_id": 1, "event_type": "a", "ts": base, "event_id": 1},
            {"user_id": 1, "event_type": "b", "ts": base + sec, "event_id": 2},
            {"user_id": 1, "event_type": "a", "ts": base + 2 * sec, "event_id": 3},
            # same ts: event_id breaks the tie -> c before d
            {"user_id": 2, "event_type": "c", "ts": base, "event_id": 4},
            {"user_id": 2, "event_type": "d", "ts": base, "event_id": 5},
            # user boundary: no a->c transition across users
        ]
        out = (
            _to_pandas(transition_counts(
                ray.data.from_items(rows, override_num_blocks=2)))
            .set_index(["from_type", "to_type"])["n"].to_dict()
        )
        assert out == {("a", "b"): 1, ("b", "a"): 1, ("c", "d"): 1}


class TestFunnel:
    def test_matches_nested_min_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import funnel_steps

        events = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
        )
        got = _canon(_to_pandas(
            funnel_steps(events, steps=["view", "click", "purchase"])))
        want = _canon(
            _duck()
            .execute(
                "WITH a AS (SELECT user_id, min(ts) AS t FROM events "
                "WHERE event_type='view' GROUP BY user_id), "
                "b AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                "JOIN a ON e.user_id=a.user_id "
                "WHERE e.event_type='click' AND e.ts > a.t GROUP BY e.user_id), "
                "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                "JOIN b ON e.user_id=b.user_id "
                "WHERE e.event_type='purchase' AND e.ts > b.t GROUP BY e.user_id) "
                "SELECT * FROM ("
                "SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step, "
                "CAST((SELECT count(*) FROM a) AS BIGINT) AS n_users "
                "UNION ALL SELECT CAST(1 AS BIGINT), 'click', "
                "CAST((SELECT count(*) FROM b) AS BIGINT) "
                "UNION ALL SELECT CAST(2 AS BIGINT), 'purchase', "
                "CAST((SELECT count(*) FROM c) AS BIGINT))"
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hand_case_order_matters(self, ray_session):
        import datetime

        import ray.data

        from pdf_extractor_ray.functions.relational import funnel_steps

        base = datetime.datetime(2024, 1, 1)
        s = datetime.timedelta(seconds=1)
        rows = [
            # user 1: full funnel in order
            {"user_id": 1, "event_type": "view", "ts": base},
            {"user_id": 1, "event_type": "click", "ts": base + s},
            {"user_id": 1, "event_type": "purchase", "ts": base + 2 * s},
            # user 2: click BEFORE view -> stops at step 1
            {"user_id": 2, "event_type": "click", "ts": base},
            {"user_id": 2, "event_type": "view", "ts": base + s},
            # user 3: view+click same ts -> strict order fails step 2
            {"user_id": 3, "event_type": "view", "ts": base},
            {"user_id": 3, "event_type": "click", "ts": base},
        ]
        out = (
            _to_pandas(funnel_steps(
                ray.data.from_items(rows, override_num_blocks=2),
                steps=["view", "click", "purchase"]))
            .set_index("step")["n_users"].to_dict()
        )
        assert out == {"view": 3, "click": 1, "purchase": 1}


class TestCooccurrenceCap:
    def test_bot_user_item_set_truncated_deterministically(self, ray_session):
        """A planted bot user with a huge distinct item set is capped
        to its max_items_per_user smallest items BEFORE pairing, so
        one degenerate user cannot explode a bucket task."""
        import ray.data

        from pdf_extractor_ray.functions.relational import cooccurrence_pairs

        rows = [
            {"user_id": 7, "event_type": f"item_{i:04d}"} for i in range(500)
        ]
        rows += [
            {"user_id": 1, "event_type": "item_0000"},
            {"user_id": 1, "event_type": "item_0001"},
        ]
        out = _to_pandas(
            cooccurrence_pairs(
                ray.data.from_items(rows, override_num_blocks=8),
                max_items_per_user=3,
            )
        )
        # bot contributes pairs only over its 3 smallest items
        assert len(out) == 3  # (0,1) (0,2) (1,2)
        d = out.set_index(["t1", "t2"])["n_users"].to_dict()
        assert d == {
            ("item_0000", "item_0001"): 2,
            ("item_0000", "item_0002"): 1,
            ("item_0001", "item_0002"): 1,
        }

    def test_cap_not_binding_is_identity(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.relational import cooccurrence_pairs

        rows = [
            {"user_id": u, "event_type": t}
            for u in (1, 2)
            for t in ("a", "b", "c")
        ]
        big = _to_pandas(
            cooccurrence_pairs(ray.data.from_items(rows), max_items_per_user=100)
        )
        assert big.set_index(["t1", "t2"])["n_users"].to_dict() == {
            ("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 2,
        }
