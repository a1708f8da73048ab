"""Similarity search over an embedding column (list<float>).

Two paths:

  - ``knn_bruteforce``: exact top-k cosine. The query matrix is
    broadcast once (``ray.put``); every batch computes a dense
    (batch x queries) similarity via one numpy matmul and emits only its
    per-batch top-k candidates per query, so the final per-query merge
    (a groupby over Q x k x n_batches rows) is tiny. This is the
    baseline/oracle path.
  - ``knn_lsh``: random-hyperplane LSH — vectors bucketed by the sign
    pattern of ``n_planes`` fixed hyperplanes; search touches only the
    query's bucket (+ optional multiprobe neighbors at Hamming distance
    1). Approximate; the scale path when a full scan per query is too
    expensive.
  - ``knn_ivf``: inverted-file (IVF) ANN — k-means coarse centroids
    trained once on a driver-side sample (tiny, seeded, deterministic),
    broadcast to every task; each vector is assigned to its nearest
    centroid cell and only the union of each query's top-``nprobe``
    cells is scanned. With ``nprobe == n_cells`` this degrades exactly
    to brute force (the test anchor); with ``nprobe << n_cells`` it
    scans ~``nprobe/n_cells`` of the corpus. On clustered real
    embeddings this is the standard scale path (FAISS-style IVF-Flat).

Determinism: ties broken by ascending vec_id; hyperplanes and k-means
init seeded; k-means runs a fixed number of Lloyd iterations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = [
    "knn_bruteforce",
    "knn_hard_negatives",
    "knn_lsh",
    "knn_ivf",
    "cluster_assign",
    "embedding_neardup_bucketed",
    "semantic_dedup",
    "cosine_topk_local",
    "kmeans_lloyd",
]


def _to_matrix(vectors) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in vectors])


def _arrow_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix WITHOUT
    materializing Python objects: flatten() + to_numpy is near
    zero-copy for non-null fixed-length lists, vs to_pylist building
    n*d Python floats (measured ~100x on 10^5-row blocks — the hidden
    dominant cost of every ANN batch kernel before this)."""
    import pyarrow.compute as _pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    if len(flat) % n:
        raise ValueError("ragged embedding lists")
    return flat.reshape(n, len(flat) // n)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _gemm_t(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``a @ b.T`` with the transposed operand made contiguous first.

    This environment's BLAS runs ~6x slower on a strided transpose
    view than on a contiguous operand (measured 0.92 s -> 0.15 s for a
    (1024,64) @ (64,10000) block); the copy is one small (d x n)
    buffer per call, trivially amortized by the GEMM itself."""
    return a @ np.ascontiguousarray(b.T)


def _topk_per_query(
    sims: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-query top-k by (score desc, id asc).

    ``argpartition`` prunes each row to the top-k score mass first
    (including every boundary tie so determinism matches a full sort),
    then a ``lexsort`` over that small candidate set fixes the exact
    (-score, id) order. Replaces the former per-query Python
    ``sorted(range(B), key=lambda ...)`` — O(Q*B log B) interpreted
    comparisons in the hot inner loop of every ANN batch kernel.

    Returns flat (query_index, selected_ids, selected_scores).
    """
    Q, B = sims.shape
    kk = min(k, B)
    if kk == 0 or Q == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.float64)
    # vectorized fast path: one argpartition + one row-wise lexsort
    # over the whole matrix; only rows whose k-th score TIES with an
    # excluded score need the exact tie-inclusive per-row refinement
    # (float cosines tie rarely — the loop this replaces paid ~50us
    # x Q per batch, the dominant cost of Q=10^4 query sweeps)
    if kk < B:
        # partition at kk (not kk-1): index kk then holds exactly the
        # (kk+1)-th best score, so the boundary-tie test is one column
        # compare instead of a full-matrix >= scan (sims is the
        # biggest buffer in the stage; every extra pass over it is
        # memory-bandwidth paid 32x in parallel)
        part_full = np.argpartition(-sims, kk, axis=1)[:, : kk + 1]
        part = part_full[:, :kk]
        vals = np.take_along_axis(sims, part, axis=1)
        kth = vals.min(axis=1)
        nxt = np.take_along_axis(sims, part_full[:, kk:], axis=1)[:, 0]
        ambiguous = nxt >= kth
    else:
        part = np.broadcast_to(np.arange(B), (Q, B))
        vals = sims
        ambiguous = np.zeros(Q, dtype=bool)
    order = np.lexsort((ids[part], -vals))[:, :kk]  # per-row last-axis
    sel = np.take_along_axis(part, order, axis=1)
    for qi in np.flatnonzero(ambiguous):
        row = sims[qi]
        cand = np.flatnonzero(row >= kth[qi])
        o = np.lexsort((ids[cand], -row[cand]))[:kk]
        sel[qi] = cand[o]
    out_s = np.take_along_axis(sims, sel, axis=1)
    return (
        np.repeat(np.arange(Q, dtype=np.int64), kk),
        ids[sel].reshape(-1),
        out_s.reshape(-1).astype(np.float64, copy=False),
    )


def cosine_topk_local(
    queries: np.ndarray, ids: list, vectors: np.ndarray, k: int
) -> list[list[tuple]]:
    """Exact top-k over an in-memory matrix; returns per-query lists of
    (vec_id, cosine) ordered by (cosine desc, vec_id asc).

    ``ids`` are coerced to int64 for the vectorized tie-break when
    possible (the distributed knn_* entry points always pass int64);
    non-numeric ids (strings, mixed) fall back to an object-dtype
    lexsort — same order contract, interpreted comparisons."""
    qn = _normalize(queries)
    vn = _normalize(vectors)
    sims = _gemm_t(qn, vn)  # (Q, N)
    try:
        ids_np = np.asarray(ids, dtype=np.int64)
    except (ValueError, TypeError, OverflowError):
        ids_np = np.asarray(ids, dtype=object)
    qi, ni, sc = _topk_per_query(sims, ids_np, k)
    out: list[list[tuple]] = [[] for _ in range(sims.shape[0])]
    for q, n, c in zip(qi, ni, sc):
        out[int(q)].append(
            (int(n) if isinstance(n, (int, np.integer)) else n, float(c))
        )
    return out


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Exact top-k cosine neighbors for each query over the dataset.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k per query.
    """
    # Broadcast once, read zero-copy per task: ray.get of a numpy array
    # maps plasma shared memory, so stateless tasks pay nothing per
    # batch and skip an actor pool's ramp-up entirely.
    q_ref = ray.put(_normalize(np.asarray(query_vectors, dtype=np.float64)))

    qids_np = np.asarray(query_ids, dtype=np.int64)

    def batch_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        sims = _gemm_t(q, mat)  # (Q, B)
        qi, ni, sc = _topk_per_query(sims, ids, k)
        return pa.table(
            {
                "query_id": pa.array(qids_np[qi], pa.int64()),
                "neighbor_id": pa.array(ni, pa.int64()),
                "cosine": pa.array(sc, pa.float64()),
            }
        )

    # large batches: candidate volume is Q x k PER BATCH, so doubling
    # the batch size halves the merge exchange; the matmul itself
    # amortizes better too (measured the bwd sweep of a 500k x 10k
    # bitext shard 154 s -> 46 s with 4096-row batches)
    cand = ds.map_batches(
        batch_topk, batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(cand, k)


def _merge_topk(cand: ray.data.Dataset, k: int):
    """Distributed per-query top-k merge over the per-batch candidates.

    The candidate stream is Q x k x n_batches rows — bounded per batch
    but corpus-proportional in the number of batches (~10^6 blocks at
    100 TB), so it must NOT be collected on the driver. Instead: a
    local no-shuffle coalesce + per-block combine prunes each partition
    to Q x k, then a per-query groupby (Q groups — small-cardinality
    key, direct groupby is right here) keeps the true top-k. The driver
    materializes ONLY the final Q x k result.
    """
    import pandas as pd

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
        )
        return df.groupby("query_id", as_index=False).head(k)

    # final exchange groups by a coarse query BUCKET, not query_id:
    # with 10^4+ queries a per-query map_groups pays one pandas call
    # per query (measured the dominant cost of the whole knn at
    # Q=10k); 64 buckets keep the same exchange volume and do the
    # per-query head() vectorized inside each bucket.
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = local_topk(df)
        df["_qb"] = df["query_id"] % 64
        return df

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["query_id", "cosine", "neighbor_id"],
            ascending=[True, False, True],
        )
        g = g.groupby("query_id", as_index=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.groupby("query_id").cumcount() + 1
        return g.drop(columns=["_qb"])

    merged = (
        cand.repartition(32, shuffle=False)
        .map_batches(add_bucket, batch_format="pandas", batch_size=None)
        .groupby("_qb")
        .map_groups(final_topk, batch_format="pandas")
    )
    df = merged.to_pandas()  # final Q x k rows only
    if df.empty:
        return pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cosine": [], "rank": []}
        )
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def knn_hard_negatives(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    query_ids: list,
    query_labels: list,
    k: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> "object":
    """Hard-negative mining for contrastive/embedding training: each
    query's top-k most-similar rows whose ``label_col`` DIFFERS from
    the query's label — the standard in-batch-negatives upgrade
    (dense-retrieval pipelines mine these offline exactly like this).

    Same distributed shape as :func:`knn_bruteforce` (queries +
    labels broadcast, per-batch dense sims, bounded tree merge); the
    label exclusion is a vectorized mask on the similarity matrix
    before the top-k prune, so same-label rows can never surface.
    """
    q_ref = ray.put(_normalize(np.asarray(query_vectors, dtype=np.float64)))
    qids_np = np.asarray(query_ids, dtype=np.int64)
    qlab_np = np.asarray(query_labels, dtype=np.int64)

    def batch_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        labs = batch[label_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        sims = _gemm_t(q, mat)  # (Q, B)
        sims[qlab_np[:, None] == labs[None, :]] = -2.0  # cos floor -1
        qi, ni, sc = _topk_per_query(sims, ids, k)
        keep = sc > -1.5  # drop masked fillers (all-same-label batch)
        return pa.table(
            {
                "query_id": pa.array(qids_np[qi[keep]], pa.int64()),
                "neighbor_id": pa.array(ni[keep], pa.int64()),
                "cosine": pa.array(sc[keep], pa.float64()),
            }
        )

    cand = ds.map_batches(
        batch_topk, batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(cand, k)


def knn_lsh(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
    seed: int = 42,
    plane_vectors: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Approximate top-k via random-hyperplane LSH buckets.

    Vectors land in bucket = sign-pattern of ``n_planes`` projections;
    each query searches its own bucket (+ Hamming-1 neighbors with
    multiprobe). The bucket assignment is one matmul per batch; the
    search touches only the probed buckets, i.e. roughly
    ``(1 + n_planes) / 2**n_planes`` of the corpus with multiprobe.

    ``plane_vectors`` overrides the seeded Gaussian planes with caller
    supplied ones (data-sampled hyperplanes — the classic "use corpus
    points as planes" variant). Sign patterns are scale-invariant, so
    a SQL oracle can replay the bucketing with raw dot products; this
    is what makes the driver-gated query value-checkable end to end.

    Recall caveat (measured on the synthetic embeddings): LSH recall
    tracks the *cluster structure* of the data. On structureless
    (uniform random) vectors recall ~= scanned fraction — there is no
    free sublinear lunch; tune ``n_planes`` down / multiprobe up to
    trade scan cost for recall. On real embedding corpora (which
    cluster) the same setting yields far higher recall.
    """
    if plane_vectors is not None:
        planes = np.asarray(plane_vectors, dtype=np.float64)
        n_planes = planes.shape[0]
    else:
        planes = np.random.RandomState(seed).standard_normal((n_planes, dim))
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    q_buckets = ((q @ planes.T) > 0).astype(np.int64)
    probe: set[int] = set()
    for qb in q_buckets:
        code = int((qb * (1 << np.arange(n_planes))).sum())
        probe.add(code)
        if multiprobe:
            for b in range(n_planes):
                probe.add(code ^ (1 << b))
    probe_ref = ray.put(np.asarray(sorted(probe), dtype=np.int64))
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)
    qids_np = np.asarray(query_ids, dtype=np.int64)

    def bucket_filter_topk(batch: pa.Table) -> pa.Table:
        """Keep only vectors in probed buckets, emit per-batch top-k.

        Stateless task: the numpy broadcasts read zero-copy from plasma;
        the probe array is tiny (deserialization is microseconds)."""
        probe_a = ray.get(probe_ref)
        planes_b = ray.get(planes_ref)
        q_b = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        codes = ((mat @ planes_b.T) > 0).astype(np.int64)
        codes = (codes * (1 << np.arange(planes_b.shape[0]))).sum(axis=1)
        keep = np.flatnonzero(np.isin(codes, probe_a))
        if len(keep):
            sims = _gemm_t(q_b, mat[keep])
            qi, ni, sc = _topk_per_query(sims, ids[keep], k)
        else:
            qi = ni = np.empty(0, dtype=np.int64)
            sc = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_np[qi], pa.int64()),
                "neighbor_id": pa.array(ni, pa.int64()),
                "cosine": pa.array(sc, pa.float64()),
            }
        )

    cand = ds.map_batches(bucket_filter_topk, batch_format="pyarrow")
    return _merge_topk(cand, k)


def _kmeans_centroids(
    sample: np.ndarray,
    n_cells: int,
    iters: int = 5,
    seed: int = 42,
    init: str = "random",
) -> np.ndarray:
    """Deterministic spherical k-means on an in-memory sample.

    ``init="first"`` seeds the centroids with the first ``n_cells``
    sample rows instead of a seeded random choice; with ``iters=0``
    the centroids ARE those rows (classic data-point centroids). That
    combination is exactly replayable by a SQL oracle (cosine argmax
    against named corpus rows), which is how the driver value-checks
    the partial-probe IVF / cluster-assignment queries.
    """
    sample = _normalize(sample)
    n_cells = min(n_cells, len(sample))
    if init == "first":
        cent = sample[:n_cells].copy()
    else:
        idx = np.random.RandomState(seed).choice(
            len(sample), size=n_cells, replace=False
        )
        cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
        cent = _normalize(cent)
    return cent


def _train_sample(
    ds: ray.data.Dataset, vec_col: str, id_col: str, train_rows: int
) -> np.ndarray:
    """Bounded driver-side training sample, ordered by id.

    ``limit(train_rows)`` bounds the fetch (fixed size at any corpus
    scale); sorting the in-memory sample by id makes the row order —
    and therefore seeded/first-row centroid inits — independent of
    block arrival order, so training state is a pure function of the
    data, replayable by the oracle."""
    df = ds.limit(train_rows).to_pandas()
    if id_col in df.columns:
        df = df.sort_values(id_col)
    return _to_matrix(df[vec_col].tolist())


def knn_ivf(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 4,
    train_rows: int = 2048,
    seed: int = 42,
    iters: int = 5,
    init: str = "random",
) -> ray.data.Dataset:
    """Approximate top-k via IVF cell probing (FAISS IVF-Flat shape).

    Train: k-means centroids on a bounded driver-side sample
    (``ds.limit(train_rows)`` — centroid state is tiny and broadcast
    once; at 100 TB the sample stays the same fixed size). Search: one
    matmul per batch assigns vectors to cells; vectors outside the
    queries' probed cells never enter the similarity matmul. The only
    cross-task data movement is the bounded per-batch top-k candidate
    stream (same merge as brute force).

    ``iters=0, init="first"`` gives data-point centroids (the lowest
    ``n_cells`` ids) — same IVF machinery, SQL-replayable training
    state; the driver-gated ``knn_ivf`` query runs this variant so its
    result is value-checked, while the Lloyd-trained default stays
    pinned by pytest (and by ``knn_ivf_fullprobe``, whose result is
    centroid-invariant).
    """
    sample = _train_sample(ds, vec_col, id_col, train_rows)
    cent = _kmeans_centroids(sample, n_cells, iters=iters, seed=seed, init=init)
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    nprobe = min(nprobe, len(cent))
    # union of each query's top-nprobe cells (stable: ties -> lowest
    # cell index, matching the oracle's ORDER BY cos DESC, cell ASC)
    q_cells = np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe]
    probe = set(int(c) for c in q_cells.ravel())
    cent_ref = ray.put(cent)
    probe_ref = ray.put(np.asarray(sorted(probe), dtype=np.int64))
    q_ref = ray.put(q)
    qids_np = np.asarray(query_ids, dtype=np.int64)

    def cell_filter_topk(batch: pa.Table) -> pa.Table:
        cent_b = ray.get(cent_ref)  # zero-copy plasma read
        probe_a = ray.get(probe_ref)
        q_b = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        cells = _gemm_t(mat, cent_b).argmax(axis=1)
        keep = np.flatnonzero(np.isin(cells, probe_a))
        if len(keep):
            sims = _gemm_t(q_b, mat[keep])
            qi, ni, sc = _topk_per_query(sims, ids[keep], k)
        else:
            qi = ni = np.empty(0, dtype=np.int64)
            sc = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_np[qi], pa.int64()),
                "neighbor_id": pa.array(ni, pa.int64()),
                "cosine": pa.array(sc, pa.float64()),
            }
        )

    cand = ds.map_batches(cell_filter_topk, batch_format="pyarrow")
    return _merge_topk(cand, k)


def cluster_assign(
    ds: ray.data.Dataset,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_rows: int = 2048,
    seed: int = 42,
    iters: int = 5,
    init: str = "random",
) -> ray.data.Dataset:
    """Assign every vector to its nearest k-means centroid (cosine).

    The training sample is bounded and driver-side (same centroids as
    ``knn_ivf``); assignment is one broadcast + one matmul per batch —
    embarrassingly parallel, no shuffle. Output: (id, cluster). At
    100 TB this is the standard embedding-space bucketing step feeding
    per-cluster dedup / sampling / curriculum jobs. ``iters=0,
    init="first"`` = SQL-replayable data-point centroids (see
    ``_kmeans_centroids``).
    """
    sample = _train_sample(ds, vec_col, id_col, train_rows)
    cent = _kmeans_centroids(sample, n_clusters, iters=iters, seed=seed, init=init)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cent_b = ray.get(cent_ref)  # zero-copy plasma read
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        cells = _gemm_t(mat, cent_b).argmax(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(cells.astype("int64")),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def embedding_neardup_bucketed(
    ds: ray.data.Dataset,
    threshold: float = 0.99,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_rows: int = 2048,
    seed: int = 42,
    max_cell: int = 4096,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs, IVF-bucketed (the scale path).

    Brute force is O(n^2) over the corpus; this buckets vectors by
    their k-means cell (broadcast centroids, one matmul per batch) and
    compares pairs only WITHIN a cell — near-identical vectors always
    share a cell, so recall at high thresholds is governed by the
    cluster margin, and the pairwise work drops by ~n_clusters.
    Output: (vec_a, vec_b, cosine) with vec_a < vec_b, cosine >=
    threshold.

    Cells larger than ``max_cell`` are truncated deterministically
    (ascending id) before the O(n_cell^2) similarity — the same
    hot-bucket guard as MinHash's ``max_bucket``: a degenerate cell at
    corpus scale means collapsed/duplicated embeddings, and the cap
    bounds both memory (sims matrix) and work instead of letting one
    skewed cell OOM a task.
    """
    sample = _train_sample(ds, vec_col, id_col, train_rows)
    cent = _kmeans_centroids(sample, n_clusters, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cent_b = ray.get(cent_ref)
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        cells = _gemm_t(mat, cent_b).argmax(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "cluster": pa.array(cells.astype("int64")),
            }
        )

    def pairs(group) -> "pa.Table":
        import pandas as pd

        if len(group) > max_cell:
            group = group.sort_values(id_col).head(max_cell)
        ids = group[id_col].to_numpy()
        mat = _normalize(_to_matrix(group[vec_col].tolist()))
        sims = _gemm_t(mat, mat)
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        iu = np.triu_indices(n, k=1)
        hits = sims[iu] >= threshold
        for i, j, c in zip(iu[0][hits], iu[1][hits], sims[iu][hits]):
            a, b = int(ids[i]), int(ids[j])
            if a > b:
                a, b = b, a
            out_a.append(a)
            out_b.append(b)
            out_c.append(float(c))
        return pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cosine": out_c})

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(pairs, batch_format="pandas")
    )


def semantic_dedup(
    ds: ray.data.Dataset,
    eps: float = 0.99,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_rows: int = 2048,
    max_cell: int = 4096,
    iters: int = 0,
    init: str = "first",
    seed: int = 42,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with k-means, then inside
    each cluster drop items that are >= ``eps`` cosine-similar to an
    item kept before them.

    Keep order within a cluster is (centroid-cosine ASC, id ASC) —
    the paper keeps the example LEAST similar to the centroid from
    each duplicate group. This implementation uses the deterministic
    predecessor-dominates variant: item j is dropped when ANY earlier
    item i in the keep order has cos(i, j) >= eps (no recursive
    kept-set dependency, so a SQL oracle replays it with one EXISTS).
    On chains a~b~c with cos(a,c) < eps it drops both b and c where
    the paper's per-group rule would keep c — at the paper's eps
    range (>= 0.95) both are published-accuracy-equivalent
    approximations of "one survivor per duplicate group".

    Scale shape: centroids train on a bounded driver-side sample and
    broadcast once (``ray.put``); assignment is one matmul per batch;
    the only exchange is the per-cluster groupby. Cells above
    ``max_cell`` rows are truncated deterministically (keep-order
    head) before the O(n_cell^2) similarity — the standard hot-bucket
    guard. Output: surviving ``(id, cluster)`` rows, where
    ``cluster`` is the 0-based centroid rank.
    """
    sample = _train_sample(ds, vec_col, id_col, train_rows)
    cent = _kmeans_centroids(
        sample, n_clusters, iters=iters, seed=seed, init=init
    )
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cent_b = ray.get(cent_ref)  # zero-copy plasma read
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        cells = _gemm_t(mat, cent_b).argmax(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "cluster": pa.array(cells.astype("int64")),
            }
        )

    def prune(group) -> "pd.DataFrame":
        import pandas as pd

        # centroid-cos must be bitwise-identical for identical vectors
        # or the (cent_cos, id) tie order between an exact copy and its
        # original flips. BLAS matvec kernels interleave several rows
        # per SIMD pass, so the SAME row content at different row
        # indices can round differently by an ulp (observed on this
        # corpus). Elementwise-multiply + numpy pairwise row sum
        # depends only on the row's content — positionally exact.
        cent_b = ray.get(cent_ref)
        mat_all = _normalize(_to_matrix(group[vec_col].tolist()))
        cluster_id = int(group["cluster"].iloc[0])
        group = group.assign(
            cent_cos=(mat_all * cent_b[cluster_id]).sum(axis=1)
        )
        g = group.sort_values(["cent_cos", id_col]).head(max_cell)
        mat = _normalize(_to_matrix(g[vec_col].tolist()))
        sims = _gemm_t(mat, mat)
        # drop j when any earlier i (keep order) has cos >= eps
        dropped = np.triu(sims >= eps, k=1).any(axis=0)
        kept = g[~dropped]
        return pd.DataFrame(
            {
                id_col: kept[id_col].to_numpy(),
                "cluster": kept["cluster"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
    )


def _pq_codebooks(
    sample: np.ndarray, m: int, nbits: int, seed: int = 42,
    iters: int = 8, init: str = "random",
) -> np.ndarray:
    """Deterministic per-subspace k-means codebooks: (m, 2^nbits,
    d/m). Euclidean k-means per subspace (the standard PQ trainer).
    ``iters=0, init="first"`` = codewords are the first 2^nbits sample
    rows' subvectors (SQL-replayable, same contract as
    ``_kmeans_centroids``)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    ksize = 1 << nbits
    books = np.empty((m, min(ksize, n), sub), dtype=np.float64)
    rng = np.random.RandomState(seed)
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        kk = min(ksize, n)
        if init == "first":
            cent = x[:kk].copy()
        else:
            idx = np.sort(rng.choice(n, size=kk, replace=False))
            cent = x[idx].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                pts = x[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j, :kk] = cent
    return books


def knn_pq(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    nbits: int = 5,
    train_rows: int = 2048,
    seed: int = 42,
    iters: int = 8,
    init: str = "random",
) -> "pd.DataFrame":
    """Approximate top-k via product quantization with asymmetric
    distance (FAISS PQ/ADC shape) — the memory-bound end of the ANN
    family: each database vector compresses to ``m`` uint8 codes
    (m * nbits bits instead of d * 64), which is what fits a 10^12-row
    embedding table in cluster RAM.

    Train: per-subspace Euclidean k-means codebooks on a bounded
    driver-side sample (same contract as IVF — fixed-size state,
    broadcast once). Encode+search fused per batch: codes =
    per-subspace argmin (one (B, ksize) distance matmul per subspace),
    then each query's precomputed (m, ksize) ADC table is gathered at
    the codes and summed — vectorized table lookups, no per-row loop.
    Approximate by construction, so rows-only at the driver gate; the
    pytest anchors are determinism + recall vs brute force + the
    m=1-codebook-per-point degeneration (codes==identity -> exact).

    Ranking uses NEGATIVE approximate squared distance in milli-units
    (ties by neighbor id) so the output shape matches the other knn_*
    operators: (query_id, neighbor_id, score_m, rank).
    """
    import pandas as pd

    sample = _train_sample(ds, vec_col, id_col, train_rows)
    sample = _normalize(sample)
    books = _pq_codebooks(sample, m=m, nbits=nbits, seed=seed, iters=iters, init=init)
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    d = q.shape[1]
    sub = d // m
    # per-query ADC tables: (Q, m, ksize) squared distances from each
    # query subvector to every codeword
    ksize = books.shape[1]
    adc = np.empty((len(q), m, ksize), dtype=np.float64)
    for j in range(m):
        qs = q[:, j * sub : (j + 1) * sub]  # (Q, sub)
        diff = qs[:, None, :] - books[j][None, :, :]  # (Q, ksize, sub)
        adc[:, j, :] = (diff ** 2).sum(axis=2)
    books_ref = ray.put(books)
    adc_ref = ray.put(adc)
    qids_np = np.asarray(query_ids, dtype=np.int64)

    def batch_pq_topk(batch: pa.Table) -> pa.Table:
        books_b = ray.get(books_ref)
        adc_b = ray.get(adc_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        mat = _normalize(_arrow_matrix(batch[vec_col]))
        n = len(ids)
        codes = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            # direct (x - c)^2 form, NOT the x^2 - 2xc + c^2 expansion:
            # the expansion loses ~8 bits to cancellation and can flip
            # the argmin on near-tied codewords, which would desync the
            # integer codes from the oracle's list_distance replay.
            x = mat[:, j * sub : (j + 1) * sub]
            d2 = ((x[:, None, :] - books_b[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        # approx squared distance per (query, vector): one gathered ADC
        # table per subspace, accumulated into a (Q, B) score matrix
        # (higher = better, like cosine), then the shared top-k kernel.
        scores = np.zeros((adc_b.shape[0], n), dtype=np.float64)
        for j in range(m):
            scores -= adc_b[:, j, codes[:, j]]
        qi, ni, sc = _topk_per_query(scores, ids, k)
        return pa.table(
            {
                "query_id": pa.array(qids_np[qi], pa.int64()),
                "neighbor_id": pa.array(ni, pa.int64()),
                "cosine": pa.array(sc, pa.float64()),
            }
        )

    cand = ds.map_batches(batch_pq_topk, batch_format="pyarrow")
    out = _merge_topk(cand, k)
    out = out.rename(columns={"cosine": "score"})
    out["score_m"] = np.floor(out["score"] * 1000 + 0.5).astype("int64")
    return out[["query_id", "neighbor_id", "score_m", "rank"]]


def embedding_gram(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    quant: int = 100,
) -> ray.data.Dataset:
    """Exact integer second-moment (Gram) matrix over an embedding
    column — the accumulation half of distributed PCA / covariance:
    G[i, j] = sum over rows of q_i * q_j with q = round(x * quant)
    (the repo's centi-unit discipline, so the whole reduction is
    int64-exact and SQL-replayable bit for bit).

    Scale shape: each batch contributes ONE d x d partial via a numpy
    ``Q.T @ Q`` matmul, emitted as upper-triangle (i, j, g) rows —
    the exchange carries d*(d+1)/2 rows per batch (d=64 -> 2,080),
    NEVER the row count; a tiny groupby-sum finishes. Driver holds
    nothing. int64 headroom: |q| <= quant * |x|_max, so ~3e2-sized
    entries overflow only past ~1e14 rows.

    Output: (i, j, gram_cc) for i <= j, BIGINT.
    """
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        mat = _arrow_matrix(batch[vec_col])
        if mat.size == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                }
            )
        q = np.floor(mat * quant + 0.5).astype(np.int64)
        # numpy int64 matmul has no BLAS and is ~40x slower; a float64
        # dgemm is EXACT when every partial sum stays under 2^53
        # (integer products are exactly representable there), which a
        # per-batch bound check guarantees before taking the fast path
        amax = np.abs(q).max(initial=0)
        if amax * amax * q.shape[0] < (1 << 52):
            gram = np.rint(q.astype(np.float64).T @ q.astype(np.float64)).astype(
                np.int64
            )
        else:
            gram = q.T @ q  # (d, d) int64
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "g": pa.array(gram[iu, ju]),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "i": batch["i"],
                "j": batch["j"],
                "gram_cc": batch["sum(g)"],
            }
        )

    from pdf_extractor_ray.functions.common import coalesce_for_exchange

    return (
        coalesce_for_exchange(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby(["i", "j"])
        .aggregate(_Sum("g"))
        .map_batches(finish, batch_format="pyarrow")
    )


def kmeans_lloyd(
    ds: ray.data.Dataset,
    n_clusters: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Distributed FULL-CORPUS Lloyd k-means in exact integer
    micro-units — every vector participates in every centroid update
    (unlike ``cluster_assign``, whose Lloyd runs on a bounded
    driver-side sample by design). Output: Dataset[id, cluster] under
    the final centroids.

    Exact semantics, replayed verbatim by the SQL oracle
    (``_kmeans_sql``): vectors quantize to micro-units
    ``floor(x * 1e6 + 0.5)`` (the embedding_gram pattern); initial
    centroids are the quantized vectors of the ``n_clusters`` lowest
    ids; assignment is argmin of the int64 squared distance with ties
    to the lowest centroid index; the update is per-dimension
    TRUNCATED integer division (matching SQL ``//``), and an empty
    cluster keeps its previous centroid.

    Scale shape: the quantized corpus is materialized once and scanned
    ``iters + 1`` times; each iteration moves only per-batch (cluster,
    count, d-dim partial-sum) rows through one tiny groupby (k groups)
    and the driver holds k x d integers. Distances use the
    guarded-exact float64 path: |q.c| <= d * 1e12 < 2^53, so the BLAS
    matmul is integer-exact (same argument as embedding_gram).
    """
    k = n_clusters

    def quantize(batch: pa.Table) -> pa.Table:
        mat = _arrow_matrix(batch[vec_col])
        qm = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        d = qm.shape[1] if qm.size else 0
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "q": pa.FixedSizeListArray.from_arrays(
                    pa.array(qm.ravel(), pa.int64()), d
                )
                if d
                else pa.array([], pa.list_(pa.int64())),
            }
        )

    ds_q = ds.select_columns([id_col, vec_col]).map_batches(
        quantize, batch_format="pyarrow"
    ).materialize()

    # ---- init: quantized vectors of the k lowest ids (per-batch
    # k-smallest partials -> driver merge; driver holds O(blocks * k)
    # candidate rows, each k small — the same bounded-init contract as
    # cluster_assign's train sample)
    def k_smallest(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) <= k:
            return batch
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    cand = ds_q.map_batches(k_smallest, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(id_col).head(k)
    cen = np.stack(
        [np.asarray(v, dtype=np.int64) for v in cand["q"]]
    )  # (k, d)
    d_dim = cen.shape[1]

    def assign_for(cen_ref):
        def f(batch: pa.Table) -> np.ndarray:
            cen_b = ray.get(cen_ref).astype(np.float64)
            mat = _arrow_matrix(batch["q"])  # int64 -> float64, exact
            # score_j = -2 q.c_j + |c_j|^2; every term is an integer
            # exactly representable in float64 (< 2^53)
            score = -2.0 * _gemm_t(mat, cen_b) + (cen_b * cen_b).sum(axis=1)
            return score.argmin(axis=1)  # first occurrence = lowest j

        return f

    for _ in range(iters):
        cen_ref = ray.put(cen)
        assign = assign_for(cen_ref)

        def partials(batch: pa.Table) -> pa.Table:
            j = assign(batch)
            qm = np.floor(_arrow_matrix(batch["q"]) + 0.0).astype(np.int64)
            sums = np.zeros((k, d_dim), np.int64)
            np.add.at(sums, j, qm)
            n = np.bincount(j, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "j": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(n, pa.int64()),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.ravel(), pa.int64()), d_dim
                    ),
                }
            )

        def fold(group):
            import pandas as _pd

            sv = np.stack(
                [np.asarray(v, dtype=np.int64) for v in group["s"]]
            ).sum(axis=0)
            return _pd.DataFrame(
                {
                    "j": [int(group["j"].iloc[0])],
                    "n": [int(group["n"].sum())],
                    "s": [sv.tolist()],
                }
            )

        agg = (
            ds_q.map_batches(partials, batch_format="pyarrow")
            .groupby("j")
            .map_groups(fold, batch_format="pandas")
            .to_pandas()
        )  # exactly k rows
        new_cen = cen.copy()
        for _, row in agg.iterrows():
            n = int(row["n"])
            if n > 0:
                sv = np.asarray(row["s"], dtype=np.int64)
                # truncated division toward zero == SQL //
                new_cen[int(row["j"])] = (
                    np.sign(sv) * (np.abs(sv) // n)
                ).astype(np.int64)
        cen = new_cen

    cen_ref = ray.put(cen)
    assign = assign_for(cen_ref)

    def final(batch: pa.Table) -> pa.Table:
        j = assign(batch)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(j.astype(np.int64), pa.int64()),
            }
        )

    return ds_q.map_batches(final, batch_format="pyarrow")
