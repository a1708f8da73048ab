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

__all__ = [
    "benchmark_ngram_hashes",
    "contamination_flags",
    "strip_contaminated_spans",
]

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


def strip_contaminated_spans(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple = (),
) -> ray.data.Dataset:
    """Contamination REMOVAL: cut every word position covered by a
    word n-gram that appears in the benchmark set, keep the rest —
    the "remove the span, keep the document" policy (the flag-only
    :func:`contamination_flags` wastes the whole document when one
    quoted benchmark sentence contaminates it; published
    decontamination pipelines cut the overlapping span instead).

    Same distributed shape as the flag check: the benchmark hash set
    broadcasts once, and the removal is ONE shuffle-free
    ``map_batches`` pass — per document, hit positions fold into an
    interval-union mask ([p, p+n) per hit) via the +1/-1 diff-array
    trick shared with ``dedup.strip_dup_spans``, and survivors
    re-join with single spaces (original casing — the module's
    convention, so the md5-per-gram SQL oracle replays everything).

    Output: (id_col, n_words, n_removed, kept_text).
    """
    import numpy as np

    bench_ref = benchmark_ngram_hashes(benchmark, n, text_col)

    def cut(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        out_id, out_nw, out_rm, out_txt = [], [], [], []
        for doc_id, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            words = _WORD_RE.findall(t or "")
            m = len(words)
            ps = np.array(
                [
                    i
                    for i in range(max(m - n + 1, 0))
                    if hashlib.md5(
                        " ".join(words[i : i + n]).encode(
                            "utf-8", "replace"
                        )
                    ).hexdigest()
                    in bench
                ],
                dtype=np.int64,
            )
            if m == 0 or len(ps) == 0:
                out_id.append(doc_id)
                out_nw.append(m)
                out_rm.append(0)
                out_txt.append(" ".join(words))
                continue
            diff = np.zeros(m + n + 1, dtype=np.int64)
            np.add.at(diff, ps, 1)
            np.add.at(diff, ps + n, -1)
            mask = np.cumsum(diff[:m]) > 0
            kept = [w for w, dead in zip(words, mask) if not dead]
            out_id.append(doc_id)
            out_nw.append(m)
            out_rm.append(int(mask.sum()))
            out_txt.append(" ".join(kept))
        out = pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "n_words": pa.array(out_nw, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "kept_text": pa.array(out_txt, pa.string()),
            }
        )
        # pass-through columns (e.g. lang for a downstream mixture
        # stage) — row order is preserved, so a direct append is exact
        for c in carry_cols:
            out = out.append_column(c, batch[c])
        return out

    return ds.map_batches(cut, batch_format="pyarrow")
