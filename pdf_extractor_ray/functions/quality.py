"""Gopher-style document quality filtering (Rae et al. 2021, §A1.1).

The classic rule-based quality gate every web-scale training pipeline
runs between extraction and dedup: per-document surface statistics
(word count, mean word length, alphabetic-word fraction, duplicate-line
fraction, stop-word presence) and a pass/fail verdict over published
thresholds. Pure per-row computation — one vectorizable ``map_batches``
pass, no shuffle, embarrassingly parallel at 100 TB.

Every statistic is defined by a regex/splitting rule that DuckDB's RE2
can replicate exactly, so the driver oracle checks per-document values,
not just counts. Fractions are exposed as exact centi-unit integers
(floor(x*100 + 0.5)) to make the comparison bit-exact.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

import ray.data

__all__ = ["gopher_stats_batch", "gopher_quality"]

_WORD_RE = re.compile(r"\S+")
_ALPHA_WORD_RE = re.compile(r"\S*[A-Za-z]\S*")
_WS_RE = re.compile(r"\s")
_STOP_RE = re.compile(r"\b(?:the|be|to|of|and|that|have|with)\b")

# Published Gopher thresholds (the subset whose inputs survive
# extraction; symbol/hash rules target raw crawl text)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_FRAC = 0.80
MAX_DUP_LINE_FRAC = 0.30
MIN_STOPWORDS = 2


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def gopher_stats_batch(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_mean_word_len: float = MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = MAX_MEAN_WORD_LEN,
    min_alpha_frac: float = MIN_ALPHA_FRAC,
    max_dup_line_frac: float = MAX_DUP_LINE_FRAC,
    min_stopwords: int = MIN_STOPWORDS,
) -> pa.Table:
    """Per-document Gopher statistics + verdict for one Arrow batch.
    Thresholds default to the published Gopher values; corpora with a
    different register (code, non-English, synthetic) tune them."""
    out = {
        "n_words": [], "mean_word_len_c": [], "alpha_frac_c": [],
        "dup_line_frac_c": [], "n_stopwords": [], "passes": [],
    }
    for t in batch[text_col].to_pylist():
        t = t or ""
        n_words = len(_WORD_RE.findall(t))
        word_chars = len(_WS_RE.sub("", t))
        mean_len = word_chars / n_words if n_words else 0.0
        n_alpha = len(_ALPHA_WORD_RE.findall(t))
        alpha_frac = n_alpha / n_words if n_words else 0.0
        lines = [ln for ln in t.split("\n") if ln.strip()]
        dup_frac = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
        n_stop = len(set(_STOP_RE.findall(t.lower())))
        passes = (
            min_words <= n_words <= max_words
            and min_mean_word_len <= mean_len <= max_mean_word_len
            and alpha_frac >= min_alpha_frac
            and dup_frac <= max_dup_line_frac
            and n_stop >= min_stopwords
        )
        out["n_words"].append(n_words)
        out["mean_word_len_c"].append(_cents(mean_len))
        out["alpha_frac_c"].append(_cents(alpha_frac))
        out["dup_line_frac_c"].append(_cents(dup_frac))
        out["n_stopwords"].append(n_stop)
        out["passes"].append(passes)
    cols = {}
    for name in batch.column_names:
        if name != text_col:
            cols[name] = batch[name]
    cols.update(
        {
            "n_words": pa.array(out["n_words"], pa.int64()),
            "mean_word_len_c": pa.array(out["mean_word_len_c"], pa.int64()),
            "alpha_frac_c": pa.array(out["alpha_frac_c"], pa.int64()),
            "dup_line_frac_c": pa.array(out["dup_line_frac_c"], pa.int64()),
            "n_stopwords": pa.array(out["n_stopwords"], pa.int64()),
            "passes": pa.array(out["passes"], pa.bool_()),
        }
    )
    return pa.table(cols)


def gopher_quality(
    ds: ray.data.Dataset, text_col: str = "text", **thresholds
) -> ray.data.Dataset:
    """Per-document Gopher statistics + pass/fail verdict (keeps every
    non-text column; drops the text payload from the output).
    ``thresholds`` forward to :func:`gopher_stats_batch`."""
    return ds.map_batches(
        lambda b: gopher_stats_batch(b, text_col, **thresholds),
        batch_format="pyarrow",
    )
