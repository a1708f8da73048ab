"""Sequence packing (distributed range-partitioned prefix sum) and
stratified sampling."""

import numpy as np
import pyarrow as pa


def _tok_ds(ray, tokens, n_blocks=8):
    ids = np.arange(len(tokens), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(np.asarray(tokens, dtype=np.int64)),
            }
        )
    ).repartition(n_blocks)


class TestSequencePack:
    def test_matches_serial_reference(self, ray_session):
        """Distributed prefix sum == a driver-side cumsum, including
        packs straddling range-bucket boundaries."""
        from pdf_extractor_ray.functions.packing import sequence_pack

        rng = np.random.RandomState(11)
        tokens = rng.randint(50, 900, size=500)
        got = (
            sequence_pack(_tok_ds(ray_session, tokens), budget=1000, n_buckets=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        before = np.cumsum(tokens) - tokens
        assert got["pack_id"].tolist() == (before // 1000).tolist()

    def test_start_based_overflow_contract(self, ray_session):
        """A document straddling the budget stays whole in the pack
        where its prefix starts; the next pack begins at the next
        budget multiple."""
        from pdf_extractor_ray.functions.packing import sequence_pack

        got = (
            sequence_pack(_tok_ds(ray_session, [600, 600, 600], 2), budget=1000)
            .to_pandas()
            .sort_values("doc_id")
        )
        # prefixes 0, 600, 1200 -> packs 0, 0, 1
        assert got["pack_id"].tolist() == [0, 0, 1]

    def test_block_layout_invariance(self, ray_session):
        from pdf_extractor_ray.functions.packing import sequence_pack

        tokens = list(range(40, 140))
        a = (
            sequence_pack(_tok_ds(ray_session, tokens, 1), budget=512)
            .to_pandas().sort_values("doc_id")["pack_id"].tolist()
        )
        b = (
            sequence_pack(_tok_ds(ray_session, tokens, 16), budget=512)
            .to_pandas().sort_values("doc_id")["pack_id"].tolist()
        )
        assert a == b

    def test_sparse_nonzero_ids(self, ray_session):
        """Ids need not be dense or start at zero — range buckets span
        [min, max]."""
        from pdf_extractor_ray.functions.packing import sequence_pack

        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1000, 1007, 1500, 2000], pa.int64()),
                    "n_tokens": pa.array([400, 400, 400, 400], pa.int64()),
                }
            )
        ).repartition(3)
        got = sequence_pack(ds, budget=1000, n_buckets=4).to_pandas()
        got = got.sort_values("doc_id")
        assert got["pack_id"].tolist() == [0, 0, 0, 1]


class TestStratifiedSample:
    def test_per_stratum_rates_and_determinism(self, ray_session):
        from pdf_extractor_ray.functions.sampling import (
            hash_keep_mask,
            stratified_sample,
        )

        n = 2000
        ids = list(range(n))
        langs = [["en", "de", "zh"][i % 3] for i in ids]
        ds = ray_session.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "lang": langs})
        ).repartition(8)
        rates = {"en": 80, "de": 30}
        got = stratified_sample(ds, rates, default_pct=5).to_pandas()
        # exact expected membership from the shared predicate
        for lang, pct in (("en", 80), ("de", 30), ("zh", 5)):
            lang_ids = [i for i in ids if ["en", "de", "zh"][i % 3] == lang]
            expect = {
                i for i, k in zip(lang_ids, hash_keep_mask(lang_ids, pct)) if k
            }
            assert set(got[got["lang"] == lang]["doc_id"]) == expect

    def test_subset_of_plain_sample(self, ray_session):
        """A stratum at rate r is exactly hash_sample(pct=r) restricted
        to that stratum — same salt, same membership."""
        from pdf_extractor_ray.functions.sampling import (
            hash_sample,
            stratified_sample,
        )

        ids = list(range(500))
        ds = ray_session.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "lang": ["en"] * 500})
        )
        a = set(
            stratified_sample(ds, {"en": 25})
            .to_pandas()["doc_id"]
        )
        ds2 = ray_session.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "lang": ["en"] * 500})
        )
        b = set(hash_sample(ds2, pct=25).to_pandas()["doc_id"])
        assert a == b


class TestShuffleShards:
    def test_partition_invariance_and_permutation(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.sampling import shuffle_shards

        t = pa.table({"doc_id": pa.array(range(300), pa.int64())})
        a = (
            shuffle_shards(ray_session.data.from_arrow(t), n_shards=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            shuffle_shards(
                ray_session.data.from_arrow(t).repartition(7), n_shards=8
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # (salt, id)-pure: identical assignment under any partitioning
        assert a[["doc_id", "shard", "pos"]].equals(
            b[["doc_id", "shard", "pos"]]
        )
        # a permutation: within each shard, pos is 0..len-1 exactly
        for s, g in a.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))
        # md5 shards are roughly balanced
        sizes = a.groupby("shard").size()
        assert len(sizes) == 8 and sizes.min() > 300 / 8 / 3

    def test_salt_changes_permutation(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.sampling import shuffle_shards

        ds = ray_session.data.from_arrow(
            pa.table({"doc_id": pa.array(range(200), pa.int64())})
        )
        a = shuffle_shards(ds, n_shards=4).to_pandas().sort_values("doc_id")
        c = (
            shuffle_shards(ds, n_shards=4, salt="epoch2")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert not (
            a["shard"].to_numpy() == c["shard"].to_numpy()
        ).all()


class TestTokenStreamChunks:
    def test_equals_serial_concat_split(self, ray_session):
        import numpy as np

        from pdf_extractor_ray.functions.packing import token_stream_chunks

        rows = [
            {"doc_id": i, "ids": [(i * 100 + j) % 32768 for j in range(i % 7)]}
            for i in range(60)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "ids": pa.array(
                    [r["ids"] for r in rows], pa.list_(pa.int32())
                ),
            }
        )
        out = (
            token_stream_chunks(
                ray_session.data.from_arrow(tbl).repartition(6), chunk_len=10
            )
            .to_pandas()
            .sort_values("chunk_id")
            .reset_index(drop=True)
        )
        stream = [x for r in rows for x in r["ids"]]
        exp = [stream[i : i + 10] for i in range(0, len(stream), 10)]
        assert len(out) == len(exp)
        for i, chunk in enumerate(exp):
            assert list(out.iloc[i]["ids"]) == chunk
        assert out["chunk_id"].tolist() == list(range(len(exp)))
        # a doc larger than a chunk splits cleanly
        assert out["n_tokens"].iloc[:-1].eq(10).all()

    def test_doc_spanning_many_chunks(self, ray_session):
        from pdf_extractor_ray.functions.packing import token_stream_chunks

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "ids": pa.array(
                    [list(range(25)), list(range(100, 103))],
                    pa.list_(pa.int32()),
                ),
            }
        )
        out = (
            token_stream_chunks(
                ray_session.data.from_arrow(tbl), chunk_len=8
            )
            .to_pandas()
            .sort_values("chunk_id")
            .reset_index(drop=True)
        )
        stream = list(range(25)) + [100, 101, 102]
        exp = [stream[i : i + 8] for i in range(0, len(stream), 8)]
        assert [list(x) for x in out["ids"]] == exp
        # chunk 3 holds the tail of doc 1 and the head of doc 2
        assert out.iloc[3]["n_pieces"] == 2


class TestEncodeCorpus:
    def test_equals_serial_encode(self, ray_session):
        from pdf_extractor_ray.functions.tokenizer import encode_corpus
        from pdf_extractor_ray.kernel.bpe import get_builtin_encoder

        texts = [f"the fast key order zq{i}vx" for i in range(40)]
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ).repartition(4)
        out = (
            encode_corpus(ds, concurrency=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        enc = get_builtin_encoder()
        for i, t in enumerate(texts):
            exp = enc.encode(t)
            assert list(out.iloc[i]["ids"]) == exp
            assert out.iloc[i]["n_tokens"] == len(exp)


class TestEmptyInputs:
    def test_sequence_pack_empty(self, ray_session):
        from pdf_extractor_ray.functions.packing import sequence_pack

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        out = sequence_pack(ray_session.data.from_arrow(empty)).take_all()
        assert out == []

    def test_token_stream_chunks_empty(self, ray_session):
        from pdf_extractor_ray.functions.packing import token_stream_chunks

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "ids": pa.array([], pa.list_(pa.int32())),
            }
        )
        out = token_stream_chunks(
            ray_session.data.from_arrow(empty), chunk_len=8
        ).take_all()
        assert out == []


class TestChunksDriverDiscipline:
    def test_only_bounded_tables_reach_driver(self, ray_session, monkeypatch):
        """token_stream_chunks may to_pandas ONLY the n_buckets-row
        offset table (constant-bounded); the piece stream and chunk
        assembly must stay on the cluster."""
        import ray.data

        from pdf_extractor_ray.functions.packing import token_stream_chunks

        sizes = []
        orig = ray.data.Dataset.to_pandas
        monkeypatch.setattr(
            ray.data.Dataset,
            "to_pandas",
            lambda self, *a, **k: (
                lambda df: (sizes.append(len(df)), df)[1]
            )(orig(self, *a, **k)),
        )
        orig_ta = ray.data.Dataset.take_all
        takes = []
        monkeypatch.setattr(
            ray.data.Dataset,
            "take_all",
            lambda self, *a, **k: (takes.append(1), orig_ta(self, *a, **k))[1],
        )
        rows = [
            {"doc_id": i, "ids": [(i * 10 + j) % 999 for j in range(i % 9)]}
            for i in range(300)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "ids": pa.array(
                    [r["ids"] for r in rows], pa.list_(pa.int32())
                ),
            }
        )
        out = token_stream_chunks(
            ray_session.data.from_arrow(tbl).repartition(5),
            chunk_len=16,
            n_buckets=32,
        )
        n = out.count()
        assert takes == []
        # the only driver to_pandas is the per-bucket totals table
        assert all(s <= 32 for s in sizes), sizes
        assert n > 0


class TestWeightedSample:
    @staticmethod
    def _serial(ids, weights, k, salt=""):
        import hashlib

        rows = []
        for i, w in zip(ids, weights):
            h = hashlib.md5(f"{salt}{i}".encode()).hexdigest()
            rows.append((int(h[:15], 16) // max(int(w), 1), h, str(i), i))
        rows.sort()
        return sorted(r[3] for r in rows[:k])

    def test_matches_serial_and_is_weight_biased(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.sampling import weighted_sample

        n = 3000
        df = pd.DataFrame(
            {"doc_id": np.arange(n), "weight": 1 + np.arange(n) % 50}
        )
        out = weighted_sample(
            _ray.data.from_pandas(df), 150, "weight", "doc_id"
        ).to_pandas()
        assert sorted(out.doc_id.tolist()) == self._serial(
            df.doc_id, df.weight, 150
        )
        # higher-weight rows must be overrepresented
        assert out.weight.mean() > df.weight.mean() * 1.15

    def test_partitioning_invariance(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.sampling import weighted_sample

        df = pd.DataFrame(
            {"doc_id": np.arange(800), "weight": 1 + np.arange(800) % 9}
        )
        a = weighted_sample(
            _ray.data.from_pandas(df), 60, "weight", "doc_id"
        ).to_pandas()
        b = weighted_sample(
            _ray.data.from_pandas(df).repartition(13), 60, "weight", "doc_id"
        ).to_pandas()
        assert sorted(a.doc_id.tolist()) == sorted(b.doc_id.tolist())

    def test_k_edge_cases(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.sampling import weighted_sample

        df = pd.DataFrame({"doc_id": np.arange(40), "weight": np.ones(40)})
        assert (
            weighted_sample(_ray.data.from_pandas(df), 100).count() == 40
        )
        assert weighted_sample(_ray.data.from_pandas(df), 0).count() == 0


class TestDomainHoldoutSplit:
    def test_leakage_invariant_and_determinism(self, ray_session):
        import pyarrow as pa

        import ray as _ray
        from pdf_extractor_ray.functions.sampling import domain_holdout_split

        rows = [{"doc_id": i, "host": f"h{i % 23}.example.com"} for i in range(500)]
        ds = _ray.data.from_items(rows)
        out = domain_holdout_split(ds, key_col="host").to_pandas()
        # every host maps to exactly one split (the leakage guarantee)
        per_host = out.groupby("host")["split"].nunique()
        assert (per_host == 1).all()
        # rerun is identical (membership is pure in (salt, key))
        out2 = domain_holdout_split(ds, key_col="host").to_pandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        assert (a["split"] == b["split"]).all()
        assert set(out["split"]) <= {"train", "val", "test"}

    def test_matches_md5_rule_and_thresholds(self, ray_session):
        import hashlib

        import ray as _ray
        from pdf_extractor_ray.functions.sampling import domain_holdout_split

        rows = [{"doc_id": i, "host": f"site-{i}.net"} for i in range(200)]
        out = (
            domain_holdout_split(
                _ray.data.from_items(rows), key_col="host",
                thresholds=(500, 750), salt="s1",
            )
            .to_pandas()
            .set_index("host")["split"]
        )
        for h, split in out.items():
            p = int(hashlib.md5(f"s1{h}".encode()).hexdigest()[:8], 16) % 1000
            want = "train" if p < 500 else "val" if p < 750 else "test"
            assert split == want
