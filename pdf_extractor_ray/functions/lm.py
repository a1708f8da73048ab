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


def _score_text(model: dict, text: str) -> tuple[float, int]:
    """(total log2 prob, n_chars scored) under the add-one-smoothed LM."""
    order = model["order"]
    counts = model["counts"]
    v = model["vocab_size"]
    t = "\x02" * (order - 1) + (text or "") + "\x03"
    logp = 0.0
    n = 0
    for i in range(order - 1, len(t)):
        ctx = t[i - order + 1 : i]
        ch = t[i]
        slot = counts.get(ctx)
        if slot is None:
            c, tot = 0, 0
        else:
            c, tot = slot.get(ch, 0), sum(slot.values())
        logp += math.log2((c + 1) / (tot + v))
        n += 1
    return logp, n


class CharLmScorer:
    """Actor-pool scoring stage: the model is fetched from the object
    store and indexed ONCE per worker in ``__init__`` (per-context
    totals precomputed); ``__call__`` scores a batch. Output adds
    ``bits_per_char`` (lower = closer to the reference corpus) in
    milli-units for exact comparisons."""

    def __init__(self, model_ref, text_col: str = "text"):
        model = ray.get(model_ref)  # zero-copy plasma read, once
        self._model = model
        self._totals = {
            ctx: sum(slot.values()) for ctx, slot in model["counts"].items()
        }
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        model = self._model
        order, counts, v = model["order"], model["counts"], model["vocab_size"]
        totals = self._totals
        bpc_m = []
        for text in batch[self._text_col].to_pylist():
            t = "\x02" * (order - 1) + (text or "") + "\x03"
            logp = 0.0
            n = 0
            for i in range(order - 1, len(t)):
                ctx = t[i - order + 1 : i]
                slot = counts.get(ctx)
                if slot is None:
                    c, tot = 0, 0
                else:
                    c, tot = slot.get(t[i], 0), totals[ctx]
                logp += math.log2((c + 1) / (tot + v))
                n += 1
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
