"""Reciprocal-rank-fusion (RRF) of ranked retrieval lists.

The reference fuses a BM25 leg and a semantic (embedding) leg per
search call with ``score(doc) = sum over legs of 1 / (k + rank)``,
deduplicating by document and keeping the top n
(``/root/reference/src/pdf_extractor/arangodb/search_api/hybrid.py:154-226``).
Here the score is exact integer micro-units — ``1_000_000 // (k +
rank)`` summed over legs — so a SQL oracle replays every fused score
bit for bit (the driver contract compares integer columns only).

Scale shape: each leg is a top-k list (k-bounded BY CONSTRUCTION — the
legs are the outputs of ``bm25_topk`` / ``knn_*``), so the fusion
operates on n_legs x k rows regardless of corpus size. It still runs
as one streaming Dataset pipeline (tag -> union -> groupby sum ->
sort/limit) so legs that are lazy Dataset tails fuse without a
driver materialization.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data


RRF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("rrf_score_u", pa.int64()),
        ("rank", pa.int64()),
    ]
)


def rank_from_scores(
    ds: ray.data.Dataset,
    score_col: str,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id, score) -> (id, rank) with rank = row_number by
    (score DESC, id ASC).

    The input must be a k-bounded ranked list (e.g. ``bm25_topk``
    output) — ranking needs a total order, so the list collapses to
    ONE block (`repartition(1)`); that is k rows by contract, never
    corpus-sized."""

    def assign(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -s))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = np.arange(1, len(ids) + 1)
        return pa.table(
            {
                id_col: pa.array(ids),
                "rank": pa.array(rank),
            }
        )

    return ds.repartition(1).map_batches(assign, batch_format="pyarrow")


def rrf_fuse(
    legs: Sequence[ray.data.Dataset],
    rrf_k: int = 60,
    top_n: int = 10,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Fuse ranked lists (each ``(id_col, rank)``, rank 1-based) into
    the RRF top-n: ``rrf_score_u = sum(1_000_000 // (rrf_k + rank))``,
    deduped by id, ordered by (rrf_score_u DESC, id ASC), rank
    re-assigned 1..top_n. A document missing from a leg simply
    contributes nothing for that leg (the reference's semantics)."""
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")

    def to_contrib(batch: pa.Table) -> pa.Table:
        ranks = batch["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "rrf_score_u": pa.array(1_000_000 // (rrf_k + ranks)),
            }
        )

    tagged = [
        leg.map_batches(to_contrib, batch_format="pyarrow") for leg in legs
    ]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.union(t)

    fused = unioned.groupby(id_col).sum("rrf_score_u")

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sum(rrf_score_u)"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((ids, -s))[:top_n]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "rrf_score_u": pa.array(s[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            },
            schema=RRF_SCHEMA,
        )

    # the fused set is n_legs x k rows — one block, exact global order
    return fused.repartition(1).map_batches(finish, batch_format="pyarrow")
