"""Data-selection importance weighting (DSIR-shaped, integer-exact).

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores every corpus document by how much its
hashed n-gram features look like a small TARGET sample versus the
SOURCE corpus, then samples by that importance. This module implements
the same pipeline shape with unigram features and an integer-exact
weight so the whole computation is replayable by a SQL oracle:

  1. features: lowercase ``[a-z0-9]+`` words hashed into ``n_bins``
     buckets with the md5-low-64 hash (DuckDB ``md5_number_lower``);
  2. per-bin Laplace-smoothed target/source probability ratio, kept as
     an exact integer in permille:
         w(bin) = ((ct+1) * (st+n_bins) * 1000)
                  // ((cs+1) * (tt+n_bins))
     with ct/cs the bin's target/source counts and tt/st the totals
     (Python arbitrary-precision ints driver-side; HUGEINT in SQL);
  3. per-document importance score = sum of w(bin) over word
     OCCURRENCES — an integer-exact ratio-sum importance heuristic in
     the DSIR spirit (the published method sums LOG ratios; logs are
     floats and would not hash-match, so the monotone per-bin ratio is
     kept in exact permille instead, trading the product/log form for
     bit-reproducibility).

Distributed shape: bin counting is a per-batch partial (at most
``n_bins`` rows per batch) into a 256-group aggregate — the ONLY
driver state is the two (n_bins,) count vectors and the derived weight
table, all broadcast once; scoring is a stateless shuffle-free
``map_batches`` pass over the corpus.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

__all__ = ["dsir_importance", "bin_word_counts"]

_WORD_RE = re.compile(r"[a-z0-9]+")


def _word_bin(word: str, n_bins: int) -> int:
    """md5-low-64 little-endian == DuckDB md5_number_lower."""
    h = hashlib.md5(word.encode("utf-8")).digest()
    return int.from_bytes(h[8:16], "little") % n_bins


def _batch_word_bins(
    texts: list, n_bins: int
) -> tuple[np.ndarray, np.ndarray]:
    """All word occurrences of a batch -> (bin id per occurrence,
    per-doc occurrence counts). md5 runs once per DISTINCT word in the
    batch (np.unique + inverse gather); everything else is numpy."""
    words: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = _WORD_RE.findall((t or "").lower())
        counts[i] = len(ws)
        words.extend(ws)
    if not words:
        return np.empty(0, dtype=np.int64), counts
    uniq, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
    ubins = np.fromiter(
        (_word_bin(w, n_bins) for w in uniq), dtype=np.int64, count=len(uniq)
    )
    return ubins[inv], counts


def bin_word_counts(
    ds: ray.data.Dataset, text_col: str = "text", n_bins: int = 256
) -> np.ndarray:
    """(n_bins,) int64 word-OCCURRENCE counts per hash bin, plus the
    total as counts.sum(). Per-batch partials are at most n_bins rows;
    the 256-group aggregate is tiny; the driver holds one small
    vector."""

    def partial(batch: pa.Table) -> pa.Table:
        occ_bins, _ = _batch_word_bins(batch[text_col].to_pylist(), n_bins)
        counts = np.bincount(occ_bins, minlength=n_bins).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "c": pa.array(counts[nz]),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # at most n_bins rows
    )
    out = np.zeros(n_bins, dtype=np.int64)
    if len(agg):
        out[agg["bin"].to_numpy()] = agg["c"].to_numpy()
    return out


def dsir_importance(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 256,
) -> ray.data.Dataset:
    """Per-document integer importance score vs a target sample.

    Output: (id_col, dsir_score int64). Higher = more target-like.
    The weight table derivation is exact integer arithmetic (module
    docstring), so the SQL oracle reproduces every score bit for bit.
    """
    # ds is consumed twice (bin_word_counts source pass + the scoring
    # map below); materialize once so a lazy/expensive upstream is not
    # re-executed and the weight table can't diverge from the scored
    # rows under a nondeterministic upstream
    ds = ds.materialize()
    tgt = bin_word_counts(target, text_col, n_bins)
    src = bin_word_counts(ds, text_col, n_bins)
    tt, st = int(tgt.sum()), int(src.sum())
    # exact permille ratio per bin (Python ints: no intermediate
    # overflow; values fit int64 afterwards for any real corpus shape)
    w = np.array(
        [
            ((int(tgt[b]) + 1) * (st + n_bins) * 1000)
            // ((int(src[b]) + 1) * (tt + n_bins))
            for b in range(n_bins)
        ],
        dtype=np.int64,
    )
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)  # zero-copy plasma read
        occ_bins, counts = _batch_word_bins(
            batch[text_col].to_pylist(), n_bins
        )
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        occ_w = wt[occ_bins]
        totals = np.concatenate([[0], np.cumsum(occ_w)])
        scores = totals[offsets[1:]] - totals[offsets[:-1]]
        return pa.table(
            {
                id_col: batch[id_col],
                "dsir_score": pa.array(scores.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
