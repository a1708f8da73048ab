"""Vocabulary drift and Zipf histogram diagnostics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

SF = "/root/testdata/sf0.001"


class TestVocabDrift:
    def test_planted_template_explosion(self, ray_session):
        """A word spammed only in dump B must top the drift list."""
        from pdf_extractor_ray.functions.corpus_stats import vocab_drift

        rows = [{"text": "normal words here", "source": "old"} for _ in range(10)]
        rows += [{"text": "casino " * 50, "source": "new"} for _ in range(5)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = vocab_drift(ds, side_col="source", side_b_value="new",
                          k=3).to_pandas()
        top = got.iloc[0]
        assert top["word"] == "casino"
        assert top["n_a"] == 0 and top["n_b"] == 250 and top["delta"] == 250

    def test_two_sided_filter(self, ray_session):
        """side_a_value restricts the comparison to exactly two slices."""
        from pdf_extractor_ray.functions.corpus_stats import vocab_drift

        rows = [
            {"text": "aaa bbb", "source": "s1"},
            {"text": "aaa", "source": "s2"},
            {"text": "ccc ccc ccc", "source": "noise"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = vocab_drift(ds, side_col="source", side_b_value="s2",
                          side_a_value="s1", k=10).to_pandas()
        assert "ccc" not in set(got["word"])
        row = got.set_index("word").loc["bbb"]
        assert (row["n_a"], row["n_b"], row["delta"]) == (1, 0, 1)

    def test_matches_oracle_sf0001(self, ray_session):
        from pdf_extractor_ray.functions.corpus_stats import vocab_drift

        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["text", "source"])
        got = vocab_drift(docs, side_col="source", side_b_value="src3",
                          k=20).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS "
                    f"SELECT * FROM parquet_scan('{SF}/documents.parquet')")
        want = con.execute("""
            WITH w AS (SELECT CASE WHEN source='src3' THEN 1 ELSE 0 END AS b,
                              unnest(regexp_extract_all(lower(coalesce(text,'')),
                                                        '[a-z0-9]+')) AS word
                       FROM documents),
            c AS (SELECT word, CAST(sum(1-b) AS BIGINT) AS n_a,
                         CAST(sum(b) AS BIGINT) AS n_b
                  FROM w GROUP BY word)
            SELECT word, n_a, n_b, CAST(abs(n_a-n_b) AS BIGINT) AS delta
            FROM c ORDER BY delta DESC, word ASC LIMIT 20
        """).df()
        pd.testing.assert_frame_equal(
            got[["word", "n_a", "n_b", "delta"]],
            want[["word", "n_a", "n_b", "delta"]])


class TestZipfHistogram:
    def test_hand_buckets(self, ray_session):
        """a x7 (lg 2), b x2 (lg 1), c/d x1 (lg 0)."""
        from pdf_extractor_ray.functions.corpus_stats import zipf_histogram

        ds = ray.data.from_arrow(pa.Table.from_pylist(
            [{"text": "a a a a a a a b b c d"}]))
        got = zipf_histogram(ds).to_pandas().set_index("lg_count")
        assert got.loc[2, "n_words"] == 1 and got.loc[2, "n_occurrences"] == 7
        assert got.loc[1, "n_words"] == 1 and got.loc[1, "n_occurrences"] == 2
        assert got.loc[0, "n_words"] == 2 and got.loc[0, "n_occurrences"] == 2

    def test_total_occurrences_is_corpus_word_count(self, ray_session):
        from pdf_extractor_ray.functions.corpus_stats import zipf_histogram
        import re

        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["text"])
        got = zipf_histogram(docs).to_pandas()
        total = int(got["n_occurrences"].sum())
        texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        want = sum(len(re.findall(r"[a-z0-9]+", (t or "").lower()))
                   for t in texts["text"])
        assert total == want


class TestKCore:
    def test_k4_with_pendant_chain(self, ray_session):
        """2-core of K4 + chain = K4 (chain peels over 2 rounds)."""
        from pdf_extractor_ray.functions.graph import k_core

        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}))
        got = k_core(ds, k=2).to_pandas().sort_values("doc_id")
        assert dict(zip(got["doc_id"], got["deg"])) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_empty_core(self, ray_session):
        from pdf_extractor_ray.functions.graph import k_core

        edges = [(0, 1), (1, 2), (2, 3)]  # path: no 2-core
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}))
        assert len(k_core(ds, k=2).to_pandas()) == 0

    def test_cascade_matches_serial_peel(self, ray_session):
        """Nucleus+tree graph: distributed peel == serial peel."""
        from pdf_extractor_ray.functions.graph import k_core

        N, M = 300, 30
        ids = np.arange(1, N)
        s_l = [np.concatenate([ids, ids])]
        d_l = [np.concatenate([ids // 2, ids // 3])]
        nuc = np.arange(M)
        for a, b in ((7, 1), (13, 2), (31, 3), (17, 5), (23, 7)):
            s_l.append(nuc)
            d_l.append((nuc * a + b) % M)
        s = np.concatenate(s_l).astype(np.int64)
        d = np.concatenate(d_l).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]

        E = set(zip(np.minimum(s, d).tolist(), np.maximum(s, d).tolist()))
        k = 6
        while True:
            deg = {}
            for u, v in E:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            alive = {n for n, dd in deg.items() if dd >= k}
            E2 = {(u, v) for u, v in E if u in alive and v in alive}
            if E2 == E:
                break
            E = E2
        want = {n: dd for n, dd in deg.items() if dd >= k}

        ds = ray.data.from_arrow(pa.table({"src": s, "dst": d}))
        got = k_core(ds, k=k).to_pandas()
        assert dict(zip(got["doc_id"], got["deg"])) == want


class TestCocitation:
    def test_hand_graph(self, ray_session):
        """Sources 0,1,2 all link {10,11}; source 3 links {10,12}."""
        from pdf_extractor_ray.functions.graph import cocitation_topk

        edges = [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (2, 11),
                 (3, 10), (3, 12)]
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}))
        got = cocitation_topk(ds, k=5).to_pandas()
        assert got.iloc[0][["x", "y", "n_common"]].tolist() == [10, 11, 3]
        assert got.iloc[1][["x", "y", "n_common"]].tolist() == [10, 12, 1]

    def test_duplicate_edges_counted_once_per_source(self, ray_session):
        from pdf_extractor_ray.functions.graph import cocitation_topk

        edges = [(0, 10), (0, 10), (0, 11)]  # dup edge must not double
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}))
        got = cocitation_topk(ds, k=5).to_pandas()
        assert got.iloc[0][["x", "y", "n_common"]].tolist() == [10, 11, 1]

    def test_hub_cap_drops_whole_source(self, ray_session):
        from pdf_extractor_ray.functions.graph import cocitation_topk

        edges = [(0, i) for i in range(10, 20)]          # hub, outdeg 10
        edges += [(1, 30), (1, 31)]
        ds = ray.data.from_arrow(pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}))
        got = cocitation_topk(ds, k=50, max_out=5).to_pandas()
        assert set(zip(got["x"], got["y"])) == {(30, 31)}
