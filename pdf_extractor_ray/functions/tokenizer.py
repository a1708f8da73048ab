"""Distributed tokenizer training: piece histogram + BPE merge loop.

The scalable shape of BPE training (Sennrich et al. 2016; the same
reduction HuggingFace tokenizers uses): the corpus contributes ONLY a
(distinct piece -> count) histogram — computed here as a streaming
Ray Data pass with per-batch Counter partials and one coarse
piece-hash-bucket exchange — and the iterative merge loop runs over
that bounded table on the driver (kernel/bpe.py
:func:`train_from_histogram`, incremental pair updates). At 100 TB
the corpus is unbounded but the distinct-piece table is not (Heaps'
law); ``min_count`` prunes the long singleton tail to keep the driver
table small, exactly the knob real tokenizer trainers expose
(min_frequency).

The reference counts tokens with tiktoken's cl100k_base
(/root/reference/src/pdf_extractor/markdown_extractor.py:237,287);
this module is how that table's SHAPE gets produced from a corpus in
the first place — engine (kernel/bpe.py), trainer (here), counter
(stages via textutils) complete the tokenizer story end to end.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from pdf_extractor_ray.functions.common import (
    coalesce_for_exchange,
    coalesce_width as _coalesce_width,
)
from pdf_extractor_ray.kernel.bpe import (
    BPEEncoder,
    CL100K_PATTERN,
    train_from_histogram,
)

__all__ = ["piece_histogram", "train_bpe", "encode_corpus"]


class _EncodeBatch:
    """Actor-pool encoding stage: the ranks table loads and the
    pre-tokenizer compiles ONCE per actor in ``__init__``; ``__call__``
    encodes a batch. ``ranks_path=None`` uses the vendored builtin
    table; a real cl100k_base.tiktoken path drops in unchanged."""

    def __init__(self, ranks_path: Optional[str], pattern: str):
        from pdf_extractor_ray.kernel.bpe import (
            BPEEncoder,
            get_builtin_encoder,
        )

        if ranks_path is None:
            self.enc = get_builtin_encoder()
        else:
            self.enc = BPEEncoder.from_tiktoken_file(
                ranks_path, pattern=pattern
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = self.enc
        ids_out = [
            np.asarray(enc.encode(t or ""), dtype=np.int32)
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ids": pa.array(
                    [a.tolist() for a in ids_out], pa.list_(pa.int32())
                ),
                "n_tokens": pa.array(
                    [len(a) for a in ids_out], pa.int64()
                ),
            }
        )


def encode_corpus(
    ds: ray.data.Dataset,
    ranks_path: Optional[str] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = CL100K_PATTERN,
    concurrency: int = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Tokenize every document into BPE token ids — the step that
    turns curated text into model-ready input. Output: (doc_id,
    ids: list<int32>, n_tokens). Streaming actor-pool map_batches;
    the encoder state lives per actor, never per batch."""
    if text_col != "text" or id_col != "doc_id":
        ds = ds.map_batches(
            lambda b: pa.table(
                {"doc_id": b[id_col], "text": b[text_col]}
            ),
            batch_format="pyarrow",
        )
    return ds.map_batches(
        _EncodeBatch,
        fn_constructor_args=(ranks_path, pattern),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def piece_histogram(
    ds: ray.data.Dataset,
    text_col: str = "text",
    pattern: str = CL100K_PATTERN,
    min_count: int = 1,
    n_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Corpus pre-tokenization histogram: one row per DISTINCT piece,
    (piece: string, cnt: int64). Per-batch Counter partials (each
    batch emits its distinct pieces once), ONE coarse piece-hash
    exchange to total, per-bucket min_count pruning. Driver holds
    nothing; the output is the bounded distinct-piece table."""
    if n_buckets is None:
        n_buckets = 4 * _coalesce_width()

    def partial(batch: pa.Table) -> pa.Table:
        import regex as _regex
        from collections import Counter

        pat = _regex.compile(pattern)  # regex module caches compiles
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(pat.findall(t or ""))
        if not c:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "piece": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        pieces = list(c.keys())
        import pandas as pd

        hb = pd.util.hash_array(
            np.array(pieces, dtype=object), categorize=False
        ).astype(
            np.int64
        ) & np.int64(0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "bucket": pa.array(hb % n_buckets),
                "piece": pa.array(pieces, pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    def merge(group):
        import pandas as pd

        g = group.groupby("piece", as_index=False)["cnt"].sum()
        if min_count > 1:
            g = g[g["cnt"] >= min_count]
        return pd.DataFrame({"piece": g["piece"], "cnt": g["cnt"]})

    partials = coalesce_for_exchange(
        ds.map_batches(partial, batch_format="pyarrow")
    )
    return partials.groupby("bucket").map_groups(merge, batch_format="pandas")


def train_bpe(
    ds: ray.data.Dataset,
    vocab_size: int,
    text_col: str = "text",
    pattern: str = CL100K_PATTERN,
    min_count: int = 1,
) -> BPEEncoder:
    """Distributed BPE training: the Ray histogram pass above feeds
    the deterministic incremental merge loop. Returns a ready
    :class:`BPEEncoder`. Driver state = the (pruned) distinct-piece
    histogram — corpus-size-independent by construction."""
    hist: dict[bytes, int] = {}
    for batch in piece_histogram(
        ds, text_col=text_col, pattern=pattern, min_count=min_count
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        for piece, cnt in zip(
            batch["piece"].to_pylist(), batch["cnt"].to_pylist()
        ):
            hist[piece.encode("utf-8")] = (
                hist.get(piece.encode("utf-8"), 0) + int(cnt)
            )
    ranks = train_from_histogram(hist, vocab_size)
    return BPEEncoder(ranks, pattern=pattern)
