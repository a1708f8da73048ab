"""IR quality evaluation: exact-integer nDCG@k of a ranked run.

Behavioral spec (public): nDCG (Jarvelin & Kekalainen 2002) is the
standard graded-relevance retrieval metric — DCG = sum of
``gain_i / log2(i + 1)`` over ranks, normalized by the ideal ranking's
DCG. Every search/retrieval data pipeline evaluates its rankers with
it before swapping one in (and a training-data engine that ships a
BM25/ANN/RRF retrieval stack needs the evaluation leg to be as
engine-replayable as the rankers themselves).

Exactness contract: the per-rank discounts are PRECOMPUTED integer
milli-constants (``round(1000 / log2(i+1))`` for i = 1..k, inlined as
literals on both engines — no runtime log on either side), gains are
small integers, and the final score is
``ndcg_pm = 1_000_000 * DCG_milli // IDCG_milli`` — pure integer
arithmetic end to end, so the SQL oracle replays it bit for bit.

Distributed shape: the run is already bounded (k rows); gains for the
run's documents come from one broadcast-filter pass over the corpus
gain dataset, and the IDEAL top-k comes from per-batch (gain DESC, id
ASC) partials merged on the driver (k x n_blocks candidate rows) —
no sort, no full materialization.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

__all__ = ["discount_milli", "ndcg_at_k"]


def discount_milli(k: int) -> list[int]:
    """Integer milli-discounts round(1000 / log2(i+1)), i = 1..k.
    Computed once here and inlined as LITERALS into any oracle — the
    contract is the constant list, not a runtime log."""
    return [round(1000.0 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg_at_k(
    run: pd.DataFrame,
    gains: ray.data.Dataset,
    k: int = 10,
    id_col: str = "doc_id",
    gain_col: str = "gain",
) -> pd.DataFrame:
    """nDCG@k of ``run`` (bounded frame with ``id_col`` ordered by
    rank — row order IS the ranking) against per-document integer
    ``gains``. Returns one row: (dcg_milli, idcg_milli, ndcg_pm)."""
    disc = discount_milli(k)
    run_ids = run[id_col].to_numpy().astype(np.int64)[:k]
    want = ray.put(run_ids)

    def run_gains(batch: pa.Table) -> pa.Table:
        keep = np.isin(
            batch[id_col].to_numpy(zero_copy_only=False), ray.get(want)
        )
        return batch.filter(pa.array(keep)).select([id_col, gain_col])

    got = gains.map_batches(run_gains, batch_format="pyarrow").to_pandas()
    gmap = dict(zip(got[id_col].astype(int), got[gain_col].astype(int)))
    dcg = sum(
        gmap.get(int(d), 0) * disc[i] for i, d in enumerate(run_ids)
    )

    # ideal top-k: per-batch (gain DESC, id ASC) partials, driver merge
    def block_top(batch: pa.Table) -> pa.Table:
        g = batch[gain_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -g))[:k]
        return batch.take(order.tolist()).select([id_col, gain_col])

    cand = gains.map_batches(block_top, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        [gain_col, id_col], ascending=[False, True]
    ).head(k)
    idcg = sum(
        int(g) * disc[i] for i, g in enumerate(cand[gain_col])
    )

    ndcg_pm = 1_000_000 * dcg // idcg if idcg > 0 else 0
    return pd.DataFrame(
        {
            "dcg_milli": [np.int64(dcg)],
            "idcg_milli": [np.int64(idcg)],
            "ndcg_pm": [np.int64(ndcg_pm)],
        }
    )
