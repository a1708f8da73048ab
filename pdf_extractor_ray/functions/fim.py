"""Fill-in-the-middle (FIM) training transform (Bavarian et al. 2022).

Behavioral spec (public): "Efficient Training of Language Models to
Fill in the Middle" (OpenAI, 2022) showed that reordering a fraction of
training sequences as prefix/suffix/middle — with sentinel tokens
marking the three segments — teaches infilling at no autoregressive
cost. Every public code-model pipeline (StarCoder/SantaCoder's
exact implementation, CodeLlama) applies this transform to a fixed
RATE of sequences during data prep. This module is that step over the
chunked token stream, deterministic and engine-replayable:

  - selection: a chunk is transformed iff
    ``int(md5(str(chunk_id))[:8], 16) % 100 < rate_pct`` — the repo's
    standard salted-hash membership (partition/run invariant, exactly
    replayable in SQL).
  - split: token positions ``a = n // 3`` and ``b = 2n // 3``
    (deterministic; the published sampler draws uniform split points,
    the engine contract here pins them so two engines agree bit for
    bit — the distributed shape is identical either way).
  - layout: PSM ("prefix-suffix-middle"):
    ``[PRE] p0..p_{a-1} [SUF] t_b..t_{n-1} [MID] t_a..t_{b-1}``
    with sentinel ids above the vocab ceiling.

Pure per-row map — no exchange at all; the transform composes with
``token_stream_chunks`` upstream and ``binexport`` downstream (the
sentinels push the vocab to 32003 < 65536, still uint16).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["fim_transform"]


def fim_transform(
    chunks: ray.data.Dataset,
    rate_pct: int = 50,
    pre_id: int = 32001,
    suf_id: int = 32002,
    mid_id: int = 32003,
    chunk_col: str = "chunk_id",
    ids_col: str = "ids",
) -> ray.data.Dataset:
    """Apply PSM fill-in-the-middle to ``rate_pct``% of chunks.

    Output: (chunk_id, fim_applied, n_tokens, ids: list<int32>) —
    transformed chunks are 3 tokens longer (the sentinels).
    """

    def apply(batch: pa.Table) -> pa.Table:
        cids = batch[chunk_col].to_pylist()
        col = batch[ids_col]
        sel = [
            int(hashlib.md5(str(c).encode()).hexdigest()[:8], 16) % 100
            < rate_pct
            for c in cids
        ]
        out_ids = []
        applied = []
        for keep, arr in zip(sel, col.to_pylist()):
            t = np.asarray(arr, dtype=np.int32)
            n = len(t)
            if not keep or n < 3:
                out_ids.append(t)
                applied.append(False)
                continue
            a, b = n // 3, 2 * n // 3
            out_ids.append(
                np.concatenate(
                    [
                        [np.int32(pre_id)],
                        t[:a],
                        [np.int32(suf_id)],
                        t[b:],
                        [np.int32(mid_id)],
                        t[a:b],
                    ]
                )
            )
            applied.append(True)
        return pa.table(
            {
                "chunk_id": pa.array(cids, pa.int64()),
                "fim_applied": pa.array(applied, pa.bool_()),
                "n_tokens": pa.array(
                    [len(x) for x in out_ids], pa.int64()
                ),
                "ids": pa.array(
                    [x.tolist() for x in out_ids], pa.list_(pa.int32())
                ),
            }
        )

    return chunks.map_batches(apply, batch_format="pyarrow")
