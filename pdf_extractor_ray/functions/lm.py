"""Character n-gram language-model scoring (CCNet-style quality tier).

CCNet ranks web documents by KenLM perplexity under a clean-corpus LM;
documents far from the reference distribution (gibberish, boilerplate,
wrong language) score badly. KenLM is unavailable offline, so the model
here is a self-trained character n-gram LM with add-one smoothing —
small, deterministic, and honest about what it is — while the
DISTRIBUTED SHAPE is exactly the production one:

  - train once on a bounded sample (driver-side, same discipline as
    the k-means centroids in similarity.py: fixed-size state no matter
    the corpus);
  - ship the model to the object store ONCE (``ray.put``) and score
    with a callable-class actor pool — the model is deserialized into
    each worker in ``__init__``, never per batch (SURVEY §2.3 A1/A2:
    warmed per-worker model state, the tiktoken/KenLM slot);
  - scoring is a pure per-document pass, shuffle-free.

Log-probabilities are float64 with a fixed summation order (document
character order), so scores are bit-deterministic across runs and
cluster layouts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ["train_char_lm", "CharLmScorer", "lm_score"]

_ORDER = 3  # trigram


def train_char_lm(texts: list[str], order: int = _ORDER) -> dict:
    """Train an add-one-smoothed char n-gram LM on an in-memory sample.
    Returns a plain dict (numpy-free, cheaply picklable) with context ->
    {char: count} tables and the vocabulary size."""
    counts: dict[str, dict[str, int]] = {}
    vocab: set[str] = set()
    for t in texts:
        t = "\x02" * (order - 1) + (t or "") + "\x03"
        vocab.update(t)
        for i in range(order - 1, len(t)):
            ctx = t[i - order + 1 : i]
            ch = t[i]
            slot = counts.setdefault(ctx, {})
            slot[ch] = slot.get(ch, 0) + 1
    return {"order": order, "counts": counts, "vocab_size": max(len(vocab), 1)}


# Codepoint base for packing (ctx, char) windows into uint64 keys:
# ctx = c2*B + c1 < B^2, pair = ctx*B + c0 < B^3 < 2^63.
_B = np.uint64(0x110000)


def _model_arrays(model: dict):
    """Sorted uint64 key arrays for vectorized lookups: (pair_keys,
    pair_counts, ctx_keys, ctx_totals, vocab_size). Only order==3 is
    packed this way (the shipped configuration)."""
    assert model["order"] == 3
    pair_keys, pair_counts, ctx_keys, ctx_totals = [], [], [], []
    for ctx, slot in model["counts"].items():
        ck = np.uint64(ord(ctx[0])) * _B + np.uint64(ord(ctx[1]))
        ctx_keys.append(ck)
        ctx_totals.append(sum(slot.values()))
        for ch, c in slot.items():
            pair_keys.append(ck * _B + np.uint64(ord(ch)))
            pair_counts.append(c)
    pk = np.array(pair_keys, dtype=np.uint64)
    po = np.argsort(pk, kind="stable")
    ck = np.array(ctx_keys, dtype=np.uint64)
    co = np.argsort(ck, kind="stable")
    return (
        pk[po],
        np.array(pair_counts, dtype=np.int64)[po],
        ck[co],
        np.array(ctx_totals, dtype=np.int64)[co],
        model["vocab_size"],
    )


def _lookup(sorted_keys: np.ndarray, vals: np.ndarray, keys: np.ndarray):
    idx = np.searchsorted(sorted_keys, keys)
    idx_c = np.minimum(idx, len(sorted_keys) - 1) if len(sorted_keys) else idx
    hit = (
        (idx < len(sorted_keys)) & (sorted_keys[idx_c] == keys)
        if len(sorted_keys)
        else np.zeros(len(keys), dtype=bool)
    )
    out = np.zeros(len(keys), dtype=np.int64)
    if len(sorted_keys):
        out[hit] = vals[idx_c[hit]]
    return out


def _score_arrays(arrays, text: str) -> tuple[float, int]:
    """Vectorized (log2 prob, n) for one text — rolling uint64 window
    codes + two searchsorted lookups, one np.sum. The SINGLE scoring
    code path: the reference helper and the actor-pool scorer both use
    it, so their outputs are bit-identical by construction."""
    pk, pc, ck, ct, v = arrays
    t = "\x02\x02" + (text or "") + "\x03"
    arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    ctx = arr[:-2] * _B + arr[1:-1]
    pair = ctx * _B + arr[2:]
    c = _lookup(pk, pc, pair)
    tot = _lookup(ck, ct, ctx)
    logp = float(np.sum(np.log2((c + 1) / (tot + np.float64(v)))))
    return logp, len(pair)


def _score_text(model: dict, text: str) -> tuple[float, int]:
    """(total log2 prob, n_chars scored) under the add-one-smoothed LM
    (reference helper — builds the lookup arrays per call)."""
    return _score_arrays(_model_arrays(model), text)


class CharLmScorer:
    """Actor-pool scoring stage: the model is fetched from the object
    store and indexed ONCE per worker in ``__init__`` (per-context
    totals precomputed); ``__call__`` scores a batch. Output adds
    ``bits_per_char`` (lower = closer to the reference corpus) in
    milli-units for exact comparisons."""

    def __init__(self, model_ref, text_col: str = "text"):
        model = ray.get(model_ref)  # zero-copy plasma read, once
        self._arrays = _model_arrays(model)  # sorted lookup arrays, once
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arrays = self._arrays
        bpc_m = []
        for text in batch[self._text_col].to_pylist():
            logp, n = _score_arrays(arrays, text)
            bpc = -logp / n if n else 0.0
            bpc_m.append(int(math.floor(bpc * 1000 + 0.5)))
        cols = {
            name: batch[name]
            for name in batch.column_names
            if name != self._text_col
        }
        cols["bits_per_char_m"] = pa.array(bpc_m, pa.int64())
        return pa.table(cols)


def lm_score(
    ds: ray.data.Dataset,
    train_ds: ray.data.Dataset,
    text_col: str = "text",
    train_rows: int = 512,
    order: int = _ORDER,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Score every document's bits-per-char under a char-LM trained on
    a bounded sample of ``train_ds`` (the clean reference corpus).
    Training state is fixed-size; the model broadcasts once; scoring
    runs on a warmed actor pool."""
    sample = train_ds.limit(train_rows).to_pandas()[text_col].tolist()
    model_ref = ray.put(train_char_lm(sample, order))
    return ds.map_batches(
        CharLmScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
