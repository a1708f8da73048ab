"""Shared exchange-shape helpers for the corpus operators."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ["coalesce_width", "coalesce_for_exchange", "bucket_ids"]


def bucket_ids(col, n_buckets: int) -> np.ndarray:
    """Vectorized per-row bucket ids for a coarse-bucket exchange.

    Integer columns bucket by ``value % n_buckets`` (cheap, and keeps
    the existing int-key bucket layout); everything else hashes with
    ``pd.util.hash_array`` — the repo's standard vectorized 64-bit
    hash (C-speed siphash, PYTHONHASHSEED-independent, deterministic
    across processes). Replaces per-row ``zlib.crc32(str(k).encode())``
    Python loops that sat on 10M-row measured paths. Bucket values
    never leave the operator that made them (groups are merged/reduced
    in-bucket), so only uniformity and run-to-run determinism matter,
    not any specific hash function.

    Accepts a ``pa.Array`` / ``pa.ChunkedArray`` / numpy array / list.
    """
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            return np.abs(vals) % n_buckets
        arr = np.asarray(col.to_pandas(), dtype=object)
    else:
        arr = np.asarray(col)
        if arr.dtype.kind in "iu":
            return np.abs(arr.astype(np.int64, copy=False)) % n_buckets
        if arr.dtype != object:
            arr = arr.astype(object)
    # categorize=False is NOT an optimization knob here: the
    # categorize path factorizes with C-string semantics, so strings
    # containing '\x00' collapse to the first-seen representative —
    # the SAME key then buckets DIFFERENTLY in different tasks
    # (order-dependent), silently splitting groups. Direct hashing is
    # value-exact (and measured no slower on repetitive key arrays).
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def coalesce_width() -> int:
    """Target block count for pre-exchange coalesces: 2x cluster CPUs.

    Sort-based groupby pays per-block reduce-task overhead, so a pile
    of near-empty blocks (per-batch partial streams are usually tiny)
    makes the exchange overhead-bound instead of data-bound; a local
    no-shuffle coalesce keeps the partition count matched to the
    cluster rather than to the upstream block count, and still scales
    on a multi-node run (2 x total cores grows with the cluster).
    Measured effects in BASELINE.md (round 2).
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 2 * cpus)


def coalesce_for_exchange(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Local (no-shuffle) coalesce ahead of a groupby/sort exchange.
    Use on NARROW pre-aggregated partial streams; full-row streams
    should keep data-proportional block counts instead."""
    return ds.repartition(coalesce_width(), shuffle=False)
