"""Semi join, order-count distribution (Q13), blocked Levenshtein.

Mirrors the driver gate's SQL at sf0.001 and pins what the gate
cannot see: the Levenshtein kernel against a slow textbook DP and
against DuckDB's byte-based scalar, EXISTS (not multiplicity)
semantics for the semi join, zero-order inclusion for custdist, and
the max_block drop contract.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("documents", "customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _slow_lev(a: str, b: str) -> int:
    """Textbook full-matrix DP over UTF-8 bytes."""
    x, y = a.encode("utf-8"), b.encode("utf-8")
    m, n = len(x), len(y)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = min(
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
                dp[i - 1][j - 1] + (x[i - 1] != y[j - 1]),
            )
    return dp[m][n]


class TestLevenshteinKernel:
    def test_vs_textbook_dp(self):
        from pdf_extractor_ray.functions.editdist import levenshtein

        rng = np.random.default_rng(11)
        alpha = list("abkx é日")
        cases = [("", ""), ("a", ""), ("", "xyz"), ("kitten", "sitting"),
                 ("héllo", "hello"), ("same", "same")]
        for _ in range(200):
            a = "".join(rng.choice(alpha) for _ in range(rng.integers(0, 25)))
            b = "".join(rng.choice(alpha) for _ in range(rng.integers(0, 25)))
            cases.append((a, b))
        for a, b in cases:
            assert levenshtein(a, b) == _slow_lev(a, b), (a, b)

    def test_vs_duckdb_alphabet(self):
        """The contract is DuckDB's byte alphabet: multibyte chars
        count per byte, so the oracle replays values verbatim."""
        from pdf_extractor_ray.functions.editdist import levenshtein

        con = duckdb.connect()
        for a, b in [("héllo", "hello"), ("日本", "日本語"), ("naïve", "naive"),
                     ("kitten", "sitting"), ("", "é")]:
            want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert levenshtein(a, b) == want, (a, b)

    def test_triangle_and_symmetry(self):
        from pdf_extractor_ray.functions.editdist import levenshtein

        rng = np.random.default_rng(3)
        for _ in range(50):
            s = ["".join(rng.choice(list("abc "))
                         for _ in range(rng.integers(1, 15))) for _ in range(3)]
            a, b, c = s
            assert levenshtein(a, b) == levenshtein(b, a)
            assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


class TestBlockedEditDistance:
    def test_matches_oracle_sf0001(self, ray_session):
        from pdf_extractor_ray.functions.editdist import blocked_edit_distance

        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["doc_id", "text"])
        got = blocked_edit_distance(docs, len_band=64, top_pairs=50).to_pandas()
        want = _duck().execute("""
            WITH d AS (SELECT doc_id, lower(coalesce(text,'')) AS t FROM documents),
            b AS (SELECT doc_id, t, regexp_extract(t, '[a-z0-9]+') AS w1,
                         length(t) // 64 AS band
                  FROM d WHERE regexp_extract(t, '[a-z0-9]+') <> '')
            SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
                   CAST(length(a.t) AS BIGINT) AS len_a,
                   CAST(length(c.t) AS BIGINT) AS len_b,
                   CAST(levenshtein(a.t, c.t) AS BIGINT) AS dist
            FROM b a JOIN b c
              ON a.w1 = c.w1 AND a.band = c.band AND a.doc_id < c.doc_id
            ORDER BY dist, doc_a, doc_b LIMIT 50
        """).df()
        # top-k is a total order: compare IN ORDER, not as a set
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)].reset_index(drop=True).astype("int64"),
            want[sorted(want.columns)].reset_index(drop=True).astype("int64"),
        )

    def test_planted_near_pair_wins(self, ray_session):
        """A planted one-edit pair must rank first (dist 1)."""
        from pdf_extractor_ray.functions.editdist import blocked_edit_distance

        base = "alpha " + "tok " * 20
        rows = [
            {"doc_id": 1, "text": base + "end"},
            {"doc_id": 2, "text": base + "end!"},  # 1 byte insert
            {"doc_id": 3, "text": "alpha " + "zzz " * 20 + "end"},
            {"doc_id": 4, "text": "beta totally different words here"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = blocked_edit_distance(ds, len_band=64, top_pairs=3).to_pandas()
        assert got.iloc[0][["doc_a", "doc_b", "dist"]].tolist() == [1, 2, 1]

    def test_max_block_drops_whole_block(self, ray_session):
        """Blocks above the cap emit NO pairs (documented drop)."""
        from pdf_extractor_ray.functions.editdist import blocked_edit_distance

        rows = [{"doc_id": i, "text": f"hot block text {i}"} for i in range(5)]
        rows += [{"doc_id": 100, "text": "cold pair a"},
                 {"doc_id": 101, "text": "cold pair b"}]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = blocked_edit_distance(ds, len_band=64, top_pairs=50,
                                    max_block=4).to_pandas()
        assert set(zip(got["doc_a"], got["doc_b"])) == {(100, 101)}


class TestSemiJoin:
    def test_matches_oracle_sf0001(self, ray_session):
        from pdf_extractor_ray.functions.relational import orders_with_returns

        orders = ray.data.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"])
        got = _canon(orders_with_returns(orders, li).to_pandas())
        want = _canon(_duck().execute("""
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT)
                       AS totalprice_c
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_returnflag = 'R')
            GROUP BY o_orderpriority
        """).df())
        pd.testing.assert_frame_equal(got, want)

    def test_exists_not_multiplicity(self, ray_session):
        """An order with many 'R' lineitems counts exactly once."""
        from pdf_extractor_ray.functions.relational import orders_with_returns

        orders = ray.data.from_arrow(pa.Table.from_pylist([
            {"o_orderkey": 1, "o_orderpriority": "1-URGENT", "o_totalprice": 10.0},
            {"o_orderkey": 2, "o_orderpriority": "1-URGENT", "o_totalprice": 20.0},
        ]))
        li = ray.data.from_arrow(pa.Table.from_pylist(
            [{"l_orderkey": 1, "l_returnflag": "R"}] * 7
            + [{"l_orderkey": 2, "l_returnflag": "N"}]))
        got = orders_with_returns(orders, li).to_pandas()
        assert got["n_orders"].tolist() == [1]
        assert got["totalprice_c"].tolist() == [1000]


class TestCustdist:
    def test_matches_oracle_sf0001(self, ray_session):
        from pdf_extractor_ray.functions.relational import (
            customer_order_distribution,
        )

        customer = ray.data.read_parquet(f"{SF}/customer.parquet",
                                         columns=["c_custkey"])
        orders = ray.data.read_parquet(f"{SF}/orders.parquet",
                                       columns=["o_custkey"])
        got = _canon(customer_order_distribution(customer, orders).to_pandas())
        want = _canon(_duck().execute("""
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
                SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
                FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY c.c_custkey
            ) GROUP BY c_count
        """).df())
        pd.testing.assert_frame_equal(got, want)

    def test_zero_order_customers_counted(self, ray_session):
        from pdf_extractor_ray.functions.relational import (
            customer_order_distribution,
        )

        customer = ray.data.from_arrow(pa.Table.from_pylist(
            [{"c_custkey": k} for k in (1, 2, 3)]))
        orders = ray.data.from_arrow(pa.Table.from_pylist(
            [{"o_custkey": 1}, {"o_custkey": 1}]))
        got = customer_order_distribution(customer, orders).to_pandas()
        got = dict(zip(got["c_count"], got["custdist"]))
        assert got == {0: 2, 2: 1}


class TestTriangleCount:
    def test_known_graphs(self, ray_session):
        from pdf_extractor_ray.functions.graph import triangle_count

        k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in k4], "dst": [e[1] for e in k4]}))
        row = triangle_count(ds).take_all()[0]
        assert (row["n_edges"], row["n_triangles"]) == (6, 4)

        c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in c4], "dst": [e[1] for e in c4]}))
        assert triangle_count(ds).take_all()[0]["n_triangles"] == 0

    def test_vs_bruteforce_random(self, ray_session):
        import itertools

        from pdf_extractor_ray.functions.graph import triangle_count

        rng = np.random.default_rng(5)
        edges = set()
        for _ in range(150):
            a, b = (int(x) for x in rng.integers(0, 40, 2))
            if a != b:
                edges.add((min(a, b), max(a, b)))
        adj = {i: set() for i in range(40)}
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        brute = sum(
            1 for a, b, c in itertools.combinations(range(40), 3)
            if b in adj[a] and c in adj[a] and c in adj[b])
        ds = ray.data.from_arrow(pa.table(
            {"src": [u for u, _ in edges], "dst": [v for _, v in edges]}))
        row = triangle_count(ds).take_all()[0]
        assert row["n_triangles"] == brute
        assert row["n_edges"] == len(edges)

    def test_duplicate_and_reversed_edges_collapse(self, ray_session):
        """Directed duplicates and reversals must not inflate counts."""
        from pdf_extractor_ray.functions.graph import triangle_count

        tri = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (2, 0)]
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in tri], "dst": [e[1] for e in tri]}))
        row = triangle_count(ds).take_all()[0]
        assert (row["n_edges"], row["n_triangles"]) == (3, 1)


class TestEntityClusters:
    def test_planted_chain_clusters_transitively(self, ray_session):
        """A-B and B-C within dist 10 but A-C farther: transitive
        closure must still put all three in one cluster."""
        from pdf_extractor_ray.functions.editdist import edit_distance_clusters

        # lengths 166/172/178 all sit inside band 2 (len // 64), so
        # blocking keeps the chain together; dist(10,12)=12 > 10, so
        # ONLY the closure links 10 and 12
        base = "alpha " + "tok " * 40
        rows = [
            {"doc_id": 10, "text": base},
            {"doc_id": 11, "text": base + "xxxxxx"},         # dist 6 to 10
            {"doc_id": 12, "text": base + "xxxxxxyyyyyy"},   # dist 6 to 11
            {"doc_id": 30, "text": "alpha " + "zzz " * 40},  # same block, far
            {"doc_id": 40, "text": "omega unrelated text"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = edit_distance_clusters(ds, max_dist=10, len_band=64).to_pandas()
        got = dict(zip(got["doc_id"], got["cluster_id"]))
        assert got == {10: 10, 11: 10, 12: 10}

    def test_matches_recursive_oracle_sf0001(self, ray_session):
        from pdf_extractor_ray.functions.editdist import edit_distance_clusters

        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["doc_id", "text"])
        got = _canon(edit_distance_clusters(docs, max_dist=10).to_pandas())
        want = _canon(_duck().execute("""
            WITH RECURSIVE d AS (
                SELECT doc_id, lower(coalesce(text,'')) AS t FROM documents),
            b AS (SELECT doc_id, t, regexp_extract(t, '[a-z0-9]+') AS w1,
                         length(t) // 64 AS band
                  FROM d WHERE regexp_extract(t, '[a-z0-9]+') <> ''),
            p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
                  FROM b a JOIN b c
                    ON a.w1 = c.w1 AND a.band = c.band AND a.doc_id < c.doc_id
                  WHERE levenshtein(a.t, c.t) <= 10),
            e AS (SELECT doc_a AS a, doc_b AS b FROM p
                  UNION SELECT doc_b, doc_a FROM p),
            reach(a, b) AS (SELECT a, b FROM e
                            UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
            clusters AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
                         FROM reach GROUP BY a)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(cluster_id AS BIGINT) AS cluster_id FROM clusters
        """).df())
        pd.testing.assert_frame_equal(got, want)


class TestBloomPushdown:
    def test_no_false_negatives(self):
        from pdf_extractor_ray.functions.relational import (
            _int_bloom_probe,
        )
        import numpy as np

        # build a bitmap by hand through the probe's own hash pair
        keys = np.array([3, 77, 1_000_003, -5, 2**40], dtype=np.int64)
        bits_p = 16
        bm = np.zeros((1 << bits_p) // 8, dtype=np.uint8)
        mask = np.int64((1 << bits_p) - 1)
        for mult, add in ((np.int64(0x9E3779B1), np.int64(0x85EBCA6B)),
                          (np.int64(0xC2B2AE35), np.int64(0x27D4EB2F))):
            h = ((keys * mult + add) & mask).astype(np.int64)
            np.bitwise_or.at(bm, h >> 3,
                             np.uint8(1) << (h & 7).astype(np.uint8))
        assert _int_bloom_probe(keys, bm, bits_p).all()

    def test_build_probe_roundtrip(self, ray_session):
        from pdf_extractor_ray.functions.relational import (
            _int_bloom_build, _int_bloom_probe,
        )
        import numpy as np

        members = np.arange(0, 5000, 7, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"k": members})).repartition(4)
        bm = _int_bloom_build(ds, "k", bits_p=18)
        assert _int_bloom_probe(members, bm, 18).all()  # zero false negatives
        probes = np.arange(1, 5000, 7, dtype=np.int64)  # disjoint set
        fp = _int_bloom_probe(probes, bm, 18).mean()
        assert fp < 0.05  # 714 members in 2^18 bits: fp rate tiny

    def test_bloom_path_equals_plain(self, ray_session):
        from pdf_extractor_ray.functions.relational import orders_with_returns

        rng = np.random.default_rng(2)
        orders = pa.table({
            "o_orderkey": np.arange(2000, dtype=np.int64),
            "o_orderpriority": pa.array(
                np.where(rng.random(2000) < 0.5, "1-URGENT", "3-MEDIUM")),
            "o_totalprice": rng.uniform(10, 1000, 2000)})
        lk = rng.integers(0, 2000, 4000).astype(np.int64)
        li = pa.table({"l_orderkey": lk,
                       "l_returnflag": pa.array(
                           np.where(lk % 13 == 0, "R", "N"))})
        ods = ray.data.from_arrow(orders)
        lds = ray.data.from_arrow(li)
        a = orders_with_returns(ods, lds).to_pandas()
        b = orders_with_returns(ods, lds, bloom_bits_p=12).to_pandas()
        a = a.sort_values("o_orderpriority").reset_index(drop=True)
        b = b.sort_values("o_orderpriority").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
