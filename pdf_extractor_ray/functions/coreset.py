"""Greedy k-center coreset selection (Gonzalez 1985 farthest-first).

Behavioral spec (public): coreset / active-learning data selection
routinely uses the farthest-first traversal — pick a seed, then
repeatedly add the point FARTHEST from the current center set — which
2-approximates the k-center objective (Gonzalez, "Clustering to
minimize the maximum intercluster distance", TCS 1985) and is the
selection rule in public coreset pipelines (e.g. Sener & Savarese 2018
"Active Learning for CNNs: A Core-Set Approach"). The selected rows
are maximally spread — the opposite end of the curation toolbox from
SemDeDup's redundancy pruning.

Exactness contract: distances are EXACT INTEGERS over centi-quantized
embeddings (``q = floor(v * 100 + 0.5)`` per coordinate — the repo's
embedding_gram convention), so argmax ties are real ties and the
(min-dist DESC, id ASC) rule makes the trajectory engine-replayable
bit for bit; a SQL oracle unrolls the k steps as chained CTEs.

Distributed shape (the textbook one): the center set lives on the
DRIVER (k x d ints — the algorithm's own output, constant-bounded);
per round one ``map_batches`` updates each point's running min-dist
against the ONE new center (broadcast via closure capture) and one
1-row-per-block reduce surfaces the global farthest point. k rounds =
2k linear passes, no shuffle at all; the per-round state dataset
(id, q, mind) is materialized so lineage stays flat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from pdf_extractor_ray.functions.similarity import _arrow_matrix

__all__ = ["kcenter_select"]


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * 100.0 + 0.5).astype(np.int64)


def kcenter_select(
    ds: ray.data.Dataset,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Farthest-first k centers; seed = lowest id. Returns
    (rank, center_id) with rank 0..k-1 in selection order."""

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = _quantize(_arrow_matrix(batch[vec_col]))
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "q": pa.array(q.tolist(), pa.list_(pa.int64())),
                "mind": pa.array(
                    np.full(len(ids), np.iinfo(np.int64).max), pa.int64()
                ),
            }
        )

    state = ds.map_batches(prep, batch_format="pyarrow").materialize()

    # seed: the lowest-id row (per-block 1-row partials -> driver min)
    def block_min(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        j = int(np.argmin(ids))
        return batch.take([j]).select(["id", "q"])

    seeds = state.map_batches(block_min, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values("id").iloc[0]
    center_id = int(seeds["id"])
    center_q = np.asarray(seeds["q"], dtype=np.int64)

    out = [(0, center_id)]
    for r in range(1, k):
        # early-stop guard lives below: once every remaining point is
        # coincident with a chosen center (round max mind == 0) the
        # farthest-first trajectory is exhausted — continuing would
        # re-select the lowest-id point forever (duplicate centers).
        cq = center_q  # captured by value for this round's closures

        def update(batch: pa.Table) -> pa.Table:
            # flatten()+reshape, not to_pylist: zero-copy off the list
            # column (the same _arrow_matrix lesson — pylist built
            # n*d Python ints per pass and dominated the round wall)
            qc = batch["q"]
            if isinstance(qc, pa.ChunkedArray):
                qc = qc.combine_chunks()
            q = (
                qc.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
                .reshape(len(qc), -1)
            )
            diff = q - cq[None, :]
            d2 = np.einsum("ij,ij->i", diff, diff)
            mind = np.minimum(
                batch["mind"].to_numpy(zero_copy_only=False), d2
            )
            return pa.table(
                {
                    "id": batch["id"],
                    "q": batch["q"],
                    "mind": pa.array(mind, pa.int64()),
                }
            )

        state = state.map_batches(update, batch_format="pyarrow").materialize()

        # farthest point: 1 row per block, tie (mind DESC, id ASC)
        def block_max(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy(zero_copy_only=False)
            mind = batch["mind"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -mind))
            return batch.take([int(order[0])])

        cands = state.map_batches(
            block_max, batch_format="pyarrow"
        ).to_pandas()
        cands = cands.sort_values(
            ["mind", "id"], ascending=[False, True]
        ).iloc[0]
        if int(cands["mind"]) == 0:
            break  # k >= distinct points: no farther point exists
        center_id = int(cands["id"])
        center_q = np.asarray(cands["q"], dtype=np.int64)
        out.append((r, center_id))

    return pd.DataFrame(out, columns=["rank", "center_id"]).astype(
        {"rank": np.int64, "center_id": np.int64}
    )
