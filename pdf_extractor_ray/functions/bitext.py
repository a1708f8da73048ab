"""Margin-based bitext mining (LASER / CCMatrix family).

Behavioral spec (public): to mine parallel sentence/document pairs for
translation training data, Artetxe & Schwenk 2019 ("Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings") score a
cross-lingual candidate pair (x, y) not by raw cosine — which is
mis-calibrated across hubness regions — but by the RATIO margin

    margin(x, y) = cos(x, y) /
                   ( (avg cos of x's k-NN in Y) / 2
                   + (avg cos of y's k-NN in X) / 2 )

and keep the globally best-margin pairs. Schwenk et al. 2021 (CCMatrix)
run exactly this over Common-Crawl-scale corpora; it is the standard
mining step in every public bitext pipeline.

Distributed shape here (the sandbox-honest version of the CCMatrix
sharding): mining is per language pair, and the TARGET-language side of
a pair shard is broadcast once (``ray.put`` of its normalized matrix)
while the source side STREAMS:

  pass A  one ``map_batches`` over X: each x's top-k in Y (complete
          per batch — Y is whole in the broadcast), emitting the
          (x, y, cos, avg_x) candidate rows.  X x k rows stream; the
          driver never sees X.
  pass B  per-y top-k over X = the existing ``knn_bruteforce`` with
          Y as the query matrix (per-batch partial top-k + tree
          merge) -> the driver holds only |Y| x k rows -> the
          per-y averages, broadcast as one |Y| float vector.
  pass C  margin on the candidate stream (broadcast avg_y lookup),
          per-batch local top-n, then a single bounded merge to the
          global top-n — the exact global best-margin pair list.

When BOTH sides are too large to broadcast, compose the same margin
arithmetic with the IVF-bucketed neighbor machinery
(``similarity.knn_ivf`` / ``embedding_neardup_bucketed``) per bucket;
the margin step itself only ever consumes bounded candidate rows.

Float contract: cosines and margins are IEEE doubles on both engines;
ordering ties are broken by (src_id, tgt_id), the same convention as
the repo's knn oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from pdf_extractor_ray.functions.similarity import (
    _arrow_matrix,
    _gemm_t,
    _normalize,
    _topk_per_query,
    knn_bruteforce,
)

__all__ = ["bitext_margin_pairs"]


def bitext_margin_pairs(
    x_ds: ray.data.Dataset,
    y_ids,
    y_mat: np.ndarray,
    k: int = 4,
    top_n: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Global top-``top_n`` cross-lingual pairs by ratio margin.

    ``x_ds``: streaming source-language side (id + embedding columns).
    ``y_ids`` / ``y_mat``: the target-language side (the smaller
    language of the pair shard), broadcast to every task.

    Returns (src_id, tgt_id, rank) with rank 1..top_n ordered by
    (margin DESC, src_id ASC, tgt_id ASC).
    """
    y_ids_np = np.asarray(y_ids, dtype=np.int64)
    # sort the broadcast side by id so argsort's stable tie-break
    # (lower column first) IS "lower y id first" — the oracle's order
    y_order = np.argsort(y_ids_np)
    y_ids_np = y_ids_np[y_order]
    y_mat = np.asarray(y_mat, dtype=np.float64)[y_order]
    yn = _normalize(y_mat)
    y_ref = ray.put(yn)
    kk = min(k, len(y_ids_np))

    # pass B first (its result is an input to pass C): per-y average
    # similarity to y's top-k in X — driver holds |Y| x k rows only.
    # k here is the FULL k (y's neighbors live in X, so the bound is
    # min(k, |X|), which the per-batch top-k realizes naturally).
    bwd = knn_bruteforce(
        x_ds, y_mat, list(y_ids_np), k=k, vec_col=vec_col, id_col=id_col
    )
    # true average over the neighbors actually available: group size
    # is min(k, |X|) by construction, so .mean() == sum / min(k, |X|)
    # — the same divisor the SQL oracle's avg(cos) computes.
    avg_y = bwd.groupby("query_id")["cosine"].mean()  # indexed by y id
    avg_y_map = {int(q): float(v) for q, v in avg_y.items()}
    avg_y_vec = np.array(
        [avg_y_map.get(int(y), 0.0) for y in y_ids_np], dtype=np.float64
    )
    avg_y_ref = ray.put(avg_y_vec)

    # pass A + C fused: forward top-k per x (complete in-batch), margin
    # with the broadcast per-y averages, local top-n per batch
    def batch_pairs(batch: pa.Table) -> pa.Table:
        y = ray.get(y_ref)
        ay = ray.get(avg_y_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        x = _normalize(_arrow_matrix(batch[vec_col]))
        sims = _gemm_t(x, y)  # (B, |Y|)
        # per-x top-k columns via the shared tie-exact pruner — the
        # ids passed are COLUMN indices (0..|Y|-1, ascending like the
        # y ids they map to), so (cos desc, col asc) == the oracle's
        # ORDER BY cos DESC, yid
        rows, cols, cos = _topk_per_query(
            sims, np.arange(sims.shape[1], dtype=np.int64), kk
        )
        avg_x = cos.reshape(len(ids), kk).sum(axis=1) / float(kk)
        margin = cos / ((np.repeat(avg_x, kk) + ay[cols]) / 2.0)
        df = pd.DataFrame(
            {
                "src_id": ids[rows],
                "tgt_id": y_ids_np[cols],
                "margin": margin,
            }
        )
        df = df.sort_values(
            ["margin", "src_id", "tgt_id"], ascending=[False, True, True]
        ).head(top_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = x_ds.map_batches(
        batch_pairs, batch_format="pyarrow", batch_size=4096
    )

    # bounded global merge: n_batches x top_n rows -> top_n
    merged = cand.to_pandas()
    merged = merged.sort_values(
        ["margin", "src_id", "tgt_id"], ascending=[False, True, True]
    ).head(top_n)
    merged = merged.reset_index(drop=True)
    merged["rank"] = np.arange(1, len(merged) + 1, dtype=np.int64)
    return merged[["src_id", "tgt_id", "rank"]]
