"""RAKE keyphrases, n-gram novelty, anti join, compression ratio.

Mirrors the driver gate's SQL at sf0.001 (keywords/novelty/anti), and
pins the properties the gate cannot see: RAKE semantics on a
hand-computed example, novelty first-owner logic on planted docs, the
compression-ratio discrimination property (templates << prose <<
noise), and distributed == serial equality for the zlib pass.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("documents", "customer", "orders"):
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


class TestRake:
    def test_hand_example_scores(self, ray_session):
        """Classic RAKE arithmetic on a tiny corpus. Phrases of
        'deep learning models. deep learning wins and models lose':
        [deep learning models] x1, [deep learning wins] x1,
        [models lose] x1 (split at '.', 'and').
        freq: deep 2, learning 2, models 2, wins 1, lose 1
        deg:  deep 6, learning 6, models 5, wins 3, lose 2
        word scores (milli): deep 3000, learning 3000, models 2500,
        wins 3000, lose 2000."""
        import ray.data

        from pdf_extractor_ray.functions.keywords import rake_keywords

        text = "deep learning models. deep learning wins and models lose"
        ds = ray.data.from_arrow(pa.table({"text": pa.array([text, text])}))
        got = rake_keywords(ds, k=5, min_count=2).to_pandas()
        scores = dict(zip(got["phrase"], got["score_milli"]))
        assert scores["deep learning models"] == 3000 + 3000 + 2500
        assert scores["deep learning wins"] == 3000 + 3000 + 3000
        assert scores["models lose"] == 2500 + 2000
        assert (got["n"] == 2).all()
        # ordering contract: score DESC, phrase ASC
        assert list(got["phrase"])[0] == "deep learning wins"

    def test_matches_gate_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.keywords import (
            RAKE_STOPWORDS,
            rake_keywords,
        )

        docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        got = rake_keywords(docs, k=10, min_count=2).to_pandas().reset_index(drop=True)
        alt = "|".join(RAKE_STOPWORDS)
        want = (
            _duck()
            .execute(
                f"""
                WITH seg AS (
                  SELECT unnest(string_split_regex(lower(coalesce(text,'')),
                                                   '[^a-z0-9\\s]+')) AS seg FROM documents),
                ph0 AS (
                  SELECT unnest(string_split(regexp_replace(seg, '\\b({alt})\\b', '|', 'g'), '|')) AS p
                  FROM seg),
                ph AS (SELECT array_to_string(regexp_extract_all(p, '[a-z0-9]+'), ' ') AS phrase FROM ph0),
                pc AS (SELECT phrase, count(*) AS n FROM ph WHERE phrase <> '' GROUP BY phrase),
                pw AS (SELECT phrase, n, len(regexp_extract_all(phrase,'[a-z0-9]+')) AS plen,
                       unnest(regexp_extract_all(phrase, '[a-z0-9]+')) AS w FROM pc),
                ws AS (SELECT w, sum(n) AS freq, sum(n*plen) AS deg FROM pw GROUP BY w),
                wsc AS (SELECT w, (1000*deg)//freq AS sc FROM ws),
                psc AS (SELECT p.phrase, p.n, CAST(sum(wsc.sc) AS BIGINT) AS score_milli
                        FROM pw p JOIN wsc ON wsc.w = p.w GROUP BY p.phrase, p.n)
                SELECT phrase, CAST(n AS BIGINT) AS n, score_milli FROM psc WHERE n >= 2
                ORDER BY score_milli DESC, phrase ASC LIMIT 10
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(
            got.astype({"n": "int64", "score_milli": "int64"}),
            want.astype({"n": "int64", "score_milli": "int64"}),
        )


class TestNgramNovelty:
    def test_planted_first_owner(self, ray_session):
        """doc 0 owns its grams; doc 1 repeats doc 0 verbatim (zero
        novel); doc 2 is half new."""
        import ray.data

        from pdf_extractor_ray.functions.keywords import ngram_novelty

        t0 = "alpha beta gamma delta"          # grams: ab g, b g d -> 2
        t2 = "alpha beta gamma epsilon zeta"   # 3 grams, 2 new
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([t0, t0, t2], pa.string()),
                }
            )
        )
        got = (
            ngram_novelty(ds, n=3)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert got.loc[0].tolist() == [2, 2]
        assert got.loc[1].tolist() == [2, 0]
        # "alpha beta gamma" seen in doc 0; the 2 epsilon/zeta grams new
        assert got.loc[2].tolist() == [3, 2]

    def test_matches_gate_sql(self, ray_session):
        import ray.data

        from pdf_extractor_ray.functions.keywords import ngram_novelty

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        got = _canon(ngram_novelty(docs, n=3).to_pandas())
        want = _canon(
            _duck()
            .execute(
                """
                WITH w AS (SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9]+') AS ws FROM documents),
                g AS (SELECT doc_id, unnest(generate_series(1, len(ws)-2)) AS j, ws FROM w WHERE len(ws) >= 3),
                grams AS (SELECT DISTINCT doc_id, array_to_string(ws[j:j+2], ' ') AS gram FROM g),
                firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
                SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                       CAST(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
                FROM grams g JOIN firsts f USING (gram) GROUP BY g.doc_id
                """
            )
            .df()
        )
        pd.testing.assert_frame_equal(got, want)


class TestAntiJoin:
    def test_matches_gate_sql(self, ray_session):
        import ray.data
        import pyarrow.compute as pc

        from pdf_extractor_ray.functions.relational import customers_without_orders

        customer = ray.data.read_parquet(
            f"{SF}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        orders = ray.data.read_parquet(
            f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )

        def urgent(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(batch["o_orderpriority"], "1-URGENT")
            ).select(["o_custkey"])

        got = _canon(
            customers_without_orders(
                customer, orders.map_batches(urgent, batch_format="pyarrow")
            ).to_pandas()
        )
        want = _canon(
            _duck()
            .execute(
                """
                SELECT c_nationkey,
                       CAST(count(*) AS BIGINT) AS n_customers,
                       CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_c
                FROM customer
                WHERE c_custkey NOT IN (
                    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
                GROUP BY c_nationkey
                """
            )
            .df()
        )
        assert len(got) > 0  # non-degenerate at sf0.001 (18 customers)
        pd.testing.assert_frame_equal(got, want)

    def test_empty_filter_side_keeps_everyone(self, ray_session):
        """Anti join against an empty right side = the whole left."""
        import ray.data

        from pdf_extractor_ray.functions.relational import customers_without_orders

        customer = ray.data.read_parquet(
            f"{SF}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        empty = ray.data.from_arrow(
            pa.table({"o_custkey": pa.array([], pa.int64())})
        )
        got = customers_without_orders(customer, empty).to_pandas()
        assert int(got["n_customers"].sum()) == 150


class TestCompressionRatio:
    def test_discrimination_and_serial_parity(self, ray_session):
        """Templates compress far below prose; noise barely compresses.
        And the distributed pass equals serial zlib over the same
        rows (same lib, same level)."""
        import zlib

        import ray.data

        from pdf_extractor_ray.functions.quality import compression_stats

        template = "click here to subscribe now! " * 60
        # varied (non-repeating) prose — natural-text compression sits
        # between boilerplate repetition and incompressible noise
        topics = [
            "harbor", "thermodynamics", "archive", "voyage", "lantern",
            "meridian", "quarry", "telescope", "orchard", "causeway",
        ]
        prose = " ".join(
            f"chapter {i} describes the {topics[i % 10]} of district "
            f"{(i * 37) % 83} where {(i * 11) % 29} residents met on day "
            f"{(i * 53) % 365} to debate the {topics[(i * 3) % 10]} plan"
            for i in range(40)
        )
        # deterministic high-entropy stream (hash chain mapped to
        # printable ASCII) — incompressible, unlike any short-period
        # arithmetic sequence
        import hashlib

        chunks, seed = [], b"seed"
        for _ in range(50):
            seed = hashlib.sha256(seed).digest()
            chunks.append("".join(chr(33 + b % 90) for b in seed))
        noise = "".join(chunks)
        rows = [template, prose, noise]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(rows, pa.string()),
                }
            )
        )
        got = compression_stats(ds).to_pandas().set_index("doc_id").sort_index()
        for i, t in enumerate(rows):
            b = t.encode("utf-8")
            assert got.loc[i, "raw_len"] == len(b)
            assert got.loc[i, "zlib_len"] == len(zlib.compress(b, 6))
            assert got.loc[i, "ratio_milli"] == (1000 * len(zlib.compress(b, 6))) // len(b)
        assert got.loc[0, "ratio_milli"] < got.loc[1, "ratio_milli"] < got.loc[2, "ratio_milli"]
        assert got.loc[0, "ratio_milli"] < 150      # template
        assert got.loc[2, "ratio_milli"] > 700      # noise
