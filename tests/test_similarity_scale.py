"""Scale-shape guards for the similarity operators: the knn top-k merge
must never materialize the corpus-proportional candidate stream on the
driver, and degenerate (collapsed-embedding) cells must not OOM the
near-dup pair stage."""

import numpy as np
import pyarrow as pa


def _emb_ds(ray, n, dim=8, identical=False, n_blocks=16):
    rng = np.random.RandomState(7)
    if identical:
        base = rng.standard_normal(dim)
        mat = np.tile(base, (n, 1))
    else:
        mat = rng.standard_normal((n, dim))
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(n_blocks)


class TestKnnMergeIsDistributed:
    def test_driver_sees_only_final_topk(self, ray_session, monkeypatch):
        """With many blocks the candidate stream is Q*k*n_blocks rows;
        the driver must only ever receive the final Q*k merged rows."""
        import ray.data

        from pdf_extractor_ray.functions.similarity import knn_bruteforce

        n, k, n_blocks = 400, 5, 32
        ds = _emb_ds(ray_session, n, n_blocks=n_blocks)
        q = np.random.RandomState(3).standard_normal((4, 8))
        qids = [900, 901, 902, 903]

        collected = []
        orig = ray.data.Dataset.to_pandas
        monkeypatch.setattr(
            ray.data.Dataset,
            "to_pandas",
            lambda self, *a, **kw: collected.append(orig(self, *a, **kw))
            or collected[-1],
        )
        out = knn_bruteforce(ds, q, qids, k=k)
        assert len(collected) == 1, "exactly one driver collect (final result)"
        assert len(collected[0]) <= len(qids) * k
        assert len(out) == len(qids) * k
        for qid, grp in out.groupby("query_id"):
            assert grp["rank"].tolist() == list(range(1, k + 1))
            assert (grp["cosine"].diff().dropna() <= 1e-12).all()

    def test_merge_matches_single_block_answer(self, ray_session):
        """Same corpus, 1 block vs 32 blocks -> identical neighbors
        (the tree merge is exact, not approximate)."""
        import pandas as pd

        from pdf_extractor_ray.functions.similarity import knn_bruteforce

        q = np.random.RandomState(3).standard_normal((3, 8))
        qids = [1, 2, 3]
        one = knn_bruteforce(_emb_ds(ray_session, 300, n_blocks=1), q, qids, k=4)
        many = knn_bruteforce(_emb_ds(ray_session, 300, n_blocks=32), q, qids, k=4)
        pd.testing.assert_frame_equal(
            one.reset_index(drop=True), many.reset_index(drop=True),
            check_dtype=False,
        )


class TestNeardupCellCap:
    def test_degenerate_identical_corpus_is_bounded(self, ray_session):
        """All-identical embeddings put every vector in one cell; the
        cap truncates the cell instead of building an n^2 sims matrix."""
        from pdf_extractor_ray.functions.similarity import (
            embedding_neardup_bucketed,
        )

        ds = _emb_ds(ray_session, 300, identical=True)
        out = embedding_neardup_bucketed(
            ds, threshold=0.99, n_clusters=4, max_cell=50
        ).to_pandas()
        # exactly C(50, 2) pairs from the truncated (lowest-id) cell
        assert len(out) == 50 * 49 // 2
        assert out["vec_a"].max() < 50 and out["vec_b"].max() < 50

    def test_cap_does_not_change_small_cells(self, ray_session):
        import pandas as pd

        from pdf_extractor_ray.functions.similarity import (
            embedding_neardup_bucketed,
        )

        ds = _emb_ds(ray_session, 200)
        a = embedding_neardup_bucketed(ds, threshold=0.9, n_clusters=8).to_pandas()
        b = embedding_neardup_bucketed(
            _emb_ds(ray_session, 200), threshold=0.9, n_clusters=8, max_cell=10**6
        ).to_pandas()
        key = ["vec_a", "vec_b"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
            check_dtype=False,
        )


class TestKnnPq:
    def test_recall_vs_brute_and_determinism(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        import ray.data

        from pdf_extractor_ray.functions.similarity import (
            knn_bruteforce,
            knn_pq,
        )

        sf = "/root/testdata/sf0.001"
        t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        df = t.to_pandas().sort_values("vec_id").head(5)
        qids = df["vec_id"].tolist()
        qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        emb = ray.data.read_parquet(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        exact = knn_bruteforce(emb, qmat, qids, k=10)
        approx1 = knn_pq(emb, qmat, qids, k=10, m=8, nbits=8)
        approx2 = knn_pq(emb, qmat, qids, k=10, m=8, nbits=8)
        # bit-determinism across runs
        import pandas as pd

        pd.testing.assert_frame_equal(
            approx1.reset_index(drop=True), approx2.reset_index(drop=True)
        )
        # recall@10 against brute force, averaged over queries
        recalls = []
        for qid in qids:
            want = set(exact[exact.query_id == qid]["neighbor_id"])
            got = set(approx1[approx1.query_id == qid]["neighbor_id"])
            recalls.append(len(want & got) / len(want))
        assert sum(recalls) / len(recalls) >= 0.5, recalls

    def test_self_is_top1(self, ray_session):
        """A query that IS a database vector must rank itself first
        (its codes reconstruct to the nearest codewords of itself)."""
        import numpy as np
        import pyarrow.parquet as pq

        import ray.data

        from pdf_extractor_ray.functions.similarity import knn_pq

        sf = "/root/testdata/sf0.001"
        t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        df = t.to_pandas().sort_values("vec_id").head(3)
        qids = df["vec_id"].tolist()
        qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        emb = ray.data.read_parquet(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        out = knn_pq(emb, qmat, qids, k=3, m=8, nbits=8)
        for qid in qids:
            top1 = out[(out["query_id"] == qid) & (out["rank"] == 1)]["neighbor_id"].iloc[0]
            assert top1 == qid, (qid, top1)
