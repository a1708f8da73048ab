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

__all__ = ["fim_transform", "span_corrupt"]


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


def span_corrupt(
    chunks: ray.data.Dataset,
    span_len: int = 3,
    stride: int = 20,
    sentinel_base: int = 32100,
    chunk_col: str = "chunk_id",
    ids_col: str = "ids",
) -> ray.data.Dataset:
    """T5-style span corruption (Raffel et al. 2020 section 3.1.4):
    replace regular token spans with sentinel ids and emit the removed
    spans, sentinel-prefixed, as the target sequence — the
    encoder-decoder pretraining objective every T5/UL2-family model
    trains on. The published sampler draws span positions from a
    Poisson; the engine contract here pins a deterministic layout —
    span ``j`` covers positions ``[j*stride, j*stride + span_len)`` —
    so two engines (and the SQL oracle) agree bit for bit, with the
    same ~15%% corruption rate at the default ``3/20`` geometry.

    Output per chunk: (chunk_id, n_inputs, n_targets,
    inputs: list<int32>, targets: list<int32>), where inputs =
    uncorrupted tokens with each span collapsed to ``sentinel_base +
    j`` and targets = ``[sentinel_0] span_0 [sentinel_1] span_1 ...``.
    Pure per-row map, no exchange; composes with token_stream_chunks
    upstream and the uint16 bin export downstream (sentinels stay
    below 65536 for vocab + 256 spans)."""

    def apply(batch: pa.Table) -> pa.Table:
        cids = batch[chunk_col].to_pylist()
        out_in, out_tg = [], []
        for arr in batch[ids_col].to_pylist():
            t = np.asarray(arr, dtype=np.int32)
            n = len(t)
            inputs, targets = [], []
            pos = 0
            j = 0
            while pos < n:
                span_start = j * stride
                if span_start >= n:
                    inputs.append(t[pos:])
                    break
                # copy up to the span, then collapse the span
                if pos < span_start:
                    inputs.append(t[pos:span_start])
                span_end = min(span_start + span_len, n)
                if span_end > span_start:
                    sent = np.int32(sentinel_base + j)
                    inputs.append(np.array([sent], dtype=np.int32))
                    targets.append(np.array([sent], dtype=np.int32))
                    targets.append(t[span_start:span_end])
                pos = span_end
                j += 1
            ii = (
                np.concatenate(inputs)
                if inputs
                else np.empty(0, dtype=np.int32)
            )
            tt = (
                np.concatenate(targets)
                if targets
                else np.empty(0, dtype=np.int32)
            )
            out_in.append(ii)
            out_tg.append(tt)
        return pa.table(
            {
                "chunk_id": pa.array(cids, pa.int64()),
                "n_inputs": pa.array(
                    [len(x) for x in out_in], pa.int64()
                ),
                "n_targets": pa.array(
                    [len(x) for x in out_tg], pa.int64()
                ),
                "inputs": pa.array(
                    [x.tolist() for x in out_in], pa.list_(pa.int32())
                ),
                "targets": pa.array(
                    [x.tolist() for x in out_tg], pa.list_(pa.int32())
                ),
            }
        )

    return chunks.map_batches(apply, batch_format="pyarrow")
