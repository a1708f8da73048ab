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


class TestVectorizedTopk:
    """The argpartition+lexsort kernel must match a naive full sort by
    (-score, id asc) exactly, including boundary ties."""

    def test_matches_naive_sort_with_ties(self):
        from pdf_extractor_ray.functions.similarity import _topk_per_query

        rng = np.random.RandomState(3)
        # quantized scores force many exact ties, including at the
        # top-k boundary
        sims = np.round(rng.standard_normal((7, 200)), 1)
        ids = rng.permutation(200).astype(np.int64)
        for k in (1, 5, 50, 200, 300):
            qi, ni, sc = _topk_per_query(sims, ids, k)
            kk = min(k, 200)
            for q in range(7):
                row = sims[q]
                naive = sorted(range(200), key=lambda j: (-row[j], ids[j]))[:kk]
                got_ids = ni[qi == q].tolist()
                assert got_ids == [int(ids[j]) for j in naive], (q, k)
                assert np.allclose(sc[qi == q], [row[j] for j in naive])

    def test_empty_and_degenerate(self):
        from pdf_extractor_ray.functions.similarity import _topk_per_query

        qi, ni, sc = _topk_per_query(np.empty((0, 5)), np.arange(5), 3)
        assert len(qi) == len(ni) == len(sc) == 0
        # all-equal scores: pure id ascending
        sims = np.zeros((2, 6))
        ids = np.array([5, 3, 1, 4, 0, 2], dtype=np.int64)
        qi, ni, _ = _topk_per_query(sims, ids, 3)
        assert ni[qi == 0].tolist() == [0, 1, 2]
        assert ni[qi == 1].tolist() == [0, 1, 2]


class TestSqlReplayableVariants:
    """iters=0 + init="first" (data-point centroids/codebooks) and
    plane_vectors (data-sampled hyperplanes) are the driver-gated
    configs; pin their semantics here so the oracle contract cannot
    drift."""

    def test_first_init_centroids_are_first_rows(self):
        from pdf_extractor_ray.functions.similarity import (
            _kmeans_centroids,
            _normalize,
        )

        rng = np.random.RandomState(0)
        sample = rng.standard_normal((40, 8))
        cent = _kmeans_centroids(sample, 4, iters=0, init="first")
        assert np.allclose(cent, _normalize(sample)[:4])

    def test_lsh_data_planes_deterministic_and_self_top1(self, ray_session):
        import ray
        from pdf_extractor_ray.functions.similarity import knn_lsh

        ds = _emb_ds(ray, 300, dim=16)
        mat = np.asarray(
            ds.limit(6).to_pandas().sort_values("vec_id")["embedding"].tolist()
        )
        a = knn_lsh(ds, mat[:5], list(range(5)), k=5, plane_vectors=mat)
        b = knn_lsh(ds, mat[:5], list(range(5)), k=5, plane_vectors=mat)
        assert a.equals(b)
        top1 = a[a["rank"] == 1]
        assert (top1["neighbor_id"].to_numpy() == top1["query_id"].to_numpy()).all()

    def test_pq_first_init_codebooks_are_first_subvectors(self):
        from pdf_extractor_ray.functions.similarity import (
            _normalize,
            _pq_codebooks,
        )

        rng = np.random.RandomState(1)
        sample = _normalize(rng.standard_normal((20, 8)))
        books = _pq_codebooks(sample, m=2, nbits=3, iters=0, init="first")
        assert books.shape == (2, 8, 4)
        assert np.allclose(books[0], sample[:8, :4])
        assert np.allclose(books[1], sample[:8, 4:])

    def test_ivf_first_init_matches_restricted_brute(self, ray_session):
        """Partial-probe IVF with data-point centroids == brute force
        restricted to vectors assigned to the probed cells (the exact
        invariant the SQL oracle replays)."""
        import ray
        from pdf_extractor_ray.functions.similarity import (
            _normalize,
            knn_ivf,
        )

        ds = _emb_ds(ray, 400, dim=16)
        df = ds.limit(2048).to_pandas().sort_values("vec_id")
        mat_all = np.asarray(df["embedding"].tolist())
        qmat = mat_all[:5]
        out = knn_ivf(
            ds, qmat, list(range(5)), k=5, n_cells=8, nprobe=2,
            iters=0, init="first",
        )
        # replay in numpy
        vn = _normalize(mat_all)
        cent = vn[:8]
        qn = _normalize(qmat)
        cells = (vn @ cent.T).argmax(axis=1)
        probe = set(
            int(c)
            for c in np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, :2].ravel()
        )
        keep = np.flatnonzero(np.isin(cells, sorted(probe)))
        sims = qn @ vn[keep].T
        for q in range(5):
            row = sims[q]
            naive = sorted(
                range(len(keep)), key=lambda j: (-row[j], keep[j])
            )[:5]
            expect = [int(keep[j]) for j in naive]
            got = out[out["query_id"] == q].sort_values("rank")[
                "neighbor_id"
            ].tolist()
            assert got == expect, q


class TestEmbeddingGram:
    def test_equals_serial_matmul(self, ray_session):
        import numpy as np

        from pdf_extractor_ray.functions.similarity import embedding_gram

        rng = np.random.default_rng(3)
        mat = rng.normal(size=(200, 16)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32())
                ),
            }
        )
        out = (
            embedding_gram(
                ray_session.data.from_arrow(tbl).repartition(7)
            )
            .to_pandas()
            .sort_values(["i", "j"])
            .reset_index(drop=True)
        )
        q = np.floor(mat.astype(np.float64) * 100 + 0.5).astype(np.int64)
        gram = q.T @ q
        iu, ju = np.triu_indices(16)
        assert len(out) == len(iu)
        assert (out["i"].to_numpy() == iu).all()
        assert (out["j"].to_numpy() == ju).all()
        assert (out["gram_cc"].to_numpy() == gram[iu, ju]).all()


class TestSemanticDedup:
    def _collect(self, ds):
        import pyarrow as pa

        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        return sorted(
            zip(t["vec_id"].to_pylist(), t["cluster"].to_pylist())
        )

    def test_exact_copies_pruned_per_cluster(self):
        import ray

        from pdf_extractor_ray.functions.similarity import semantic_dedup

        rows = [
            {"vec_id": 0, "embedding": [1.0, 0.0]},
            {"vec_id": 1, "embedding": [0.0, 1.0]},
            {"vec_id": 2, "embedding": [1.0, 0.0]},   # copy of 0
            {"vec_id": 3, "embedding": [0.8, 0.6]},
            {"vec_id": 4, "embedding": [0.6, 0.8]},
            {"vec_id": 5, "embedding": [0.0, 1.0]},   # copy of 1
        ]
        out = self._collect(
            semantic_dedup(
                ray.data.from_items(rows), eps=0.99, n_clusters=2
            )
        )
        # centroids = rows 0,1 -> cluster 0 = {0,2,3}, cluster 1 = {1,4,5};
        # keep order (centroid-cos ASC, id ASC) drops each copy
        assert out == [(0, 0), (1, 1), (3, 0), (4, 1)]

    def test_chain_predecessor_dominates(self):
        import math

        import ray

        from pdf_extractor_ray.functions.similarity import semantic_dedup

        def unit(deg):
            r = math.radians(deg)
            return [math.cos(r), math.sin(r)]

        # a(0deg) ~ b(14deg) ~ c(28deg), cos(a,c) < 0.95: the
        # predecessor-dominates variant keeps only c (least
        # centroid-similar); b and a are each >= eps to an earlier item
        rows = [
            {"vec_id": 0, "embedding": unit(0)},
            {"vec_id": 1, "embedding": unit(14)},
            {"vec_id": 2, "embedding": unit(28)},
        ]
        out = self._collect(
            semantic_dedup(
                ray.data.from_items(rows), eps=0.95, n_clusters=1
            )
        )
        assert out == [(2, 0)]

    def test_no_dups_all_survive(self):
        import ray

        from pdf_extractor_ray.functions.similarity import semantic_dedup

        rows = [
            {"vec_id": i, "embedding": [float(i + 1), float(i * i)]}
            for i in range(8)
        ]
        out = self._collect(
            semantic_dedup(
                ray.data.from_items(rows), eps=0.9999, n_clusters=2
            )
        )
        assert [v for v, _ in out] == list(range(8))
