"""Train the small vendored BPE ranks table (standard BPE training).

The classic algorithm (Sennrich et al. 2016 / GPT-2 style, byte
level): pre-tokenize the corpus with the cl100k pattern, start from
the 256 single-byte tokens, and repeatedly merge the most frequent
adjacent pair (ties -> lexicographically smallest pair, so training
is fully deterministic), assigning ranks in merge order. Output is
tiktoken's ``.tiktoken`` format, loadable by kernel/bpe.py.

This gives the repo a REAL byte-pair encoder end to end (trainer ->
ranks file -> loader -> merge loop) at a small vocabulary; the real
cl100k_base table drops into the same loader when available (the
table itself is public data but absent from this offline sandbox).

Usage: python scripts/train_bpe.py [vocab_size] [out_path]
(defaults: 1024, pdf_extractor_ray/data/graft_bpe_small.tiktoken;
trains on /root/testdata/sf0.001/documents.parquet)
"""

from __future__ import annotations

import base64
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow.parquet as pq
import regex as _regex

from pdf_extractor_ray.kernel.bpe import CL100K_PATTERN


def train(texts, vocab_size: int) -> dict[bytes, int]:
    """Serial wrapper: corpus -> piece histogram -> the shared
    deterministic merge loop (kernel/bpe.py train_from_histogram)."""
    from pdf_extractor_ray.kernel.bpe import train_from_histogram

    pat = _regex.compile(CL100K_PATTERN)
    piece_freq: Counter[bytes] = Counter()
    for t in texts:
        for piece in pat.findall(t or ""):
            piece_freq[piece.encode("utf-8")] += 1
    return train_from_histogram(dict(piece_freq), vocab_size)


def main() -> None:
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(__file__), "..", "pdf_extractor_ray", "data",
            "graft_bpe_small.tiktoken",
        )
    )
    texts = (
        pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )["text"].to_pylist()
    )
    ranks = train(texts, vocab)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    print(f"wrote {len(ranks)} ranks to {out}")


if __name__ == "__main__":
    main()
