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
    pat = _regex.compile(CL100K_PATTERN)
    piece_freq: Counter[bytes] = Counter()
    for t in texts:
        for piece in pat.findall(t or ""):
            piece_freq[piece.encode("utf-8")] += 1

    ranks: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    # each distinct piece as its current segmentation
    segs: dict[bytes, list[bytes]] = {
        p: [p[i : i + 1] for i in range(len(p))] for p in piece_freq
    }
    while len(ranks) < vocab_size:
        pair_counts: Counter[tuple[bytes, bytes]] = Counter()
        for p, seg in segs.items():
            f = piece_freq[p]
            for i in range(len(seg) - 1):
                pair_counts[(seg[i], seg[i + 1])] += f
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        # the same byte string can be reachable via two different
        # splits (ab+c and a+bc); if it's already a token, re-segment
        # with the existing rank and keep going
        if merged not in ranks:
            ranks[merged] = len(ranks)
        for p, seg in segs.items():
            i, out = 0, []
            while i < len(seg):
                if (
                    i + 1 < len(seg)
                    and seg[i] == best[0]
                    and seg[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[p] = out
    return ranks


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
