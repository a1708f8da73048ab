"""Benchmark decontamination — flag documents that overlap an eval set.

Training corpora must not contain benchmark/eval text (the
contamination problem): the standard check flags any document sharing a
long word n-gram with the benchmark set. The distributed shape:

  - the benchmark side is SMALL by definition (eval sets are KBs-MBs,
    not corpora), so its n-gram hash set builds in one bounded pass
    and broadcasts via a single ``ray.put``;
  - the corpus-side check is a shuffle-free ``map_batches`` pass: each
    document's distinct n-grams hash and probe the broadcast set.

N-grams are word (``\\S+``) windows joined with single spaces, hashed
with full md5 hex — exactly the value DuckDB's ``md5()`` produces, so
the driver oracle reproduces per-document hit counts and flags with a
plain join (list_slice + array_to_string + md5).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray
import ray.data

__all__ = ["benchmark_ngram_hashes", "contamination_flags"]

_WORD_RE = re.compile(r"\S+")


def _doc_ngram_hashes(text: str, n: int) -> set[str]:
    """md5 hex of every distinct word n-gram of ``text``."""
    words = _WORD_RE.findall(text or "")
    if len(words) < n:
        return set()
    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    return {
        hashlib.md5(g.encode("utf-8", "replace")).hexdigest() for g in grams
    }


def benchmark_ngram_hashes(
    benchmark: ray.data.Dataset, n: int = 8, text_col: str = "text"
):
    """Frozen set of every benchmark n-gram hash (bounded: eval sets
    are small). Returns an object ref ready to broadcast into the
    corpus-side check."""

    def grams(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch[text_col].to_pylist():
            out |= _doc_ngram_hashes(t, n)
        return pa.table({"h": pa.array(sorted(out), pa.string())})

    parts = benchmark.map_batches(grams, batch_format="pyarrow").to_pandas()
    return ray.put(frozenset(parts["h"]) if "h" in parts.columns else frozenset())


def contamination_flags(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per document: how many of its distinct n-grams appear in the
    benchmark set, and a contaminated flag (any overlap). Output:
    (id_col, n_hits, contaminated)."""
    bench_ref = benchmark_ngram_hashes(benchmark, n, text_col)

    def check(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # read once per task, zero-copy-ish
        ids, hits = [], []
        for doc_id, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = _doc_ngram_hashes(t, n)
            ids.append(doc_id)
            hits.append(len(h & bench))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array([x > 0 for x in hits], pa.bool_()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")
