"""Byte-level BPE encoder — a tiktoken-compatible engine.

The reference counts tokens with tiktoken's ``cl100k_base`` encoding
(/root/reference/src/pdf_extractor/markdown_extractor.py:237,287). The
encoder ALGORITHM and the cl100k_base pre-tokenization pattern are
public knowledge; the 100k-entry merges/ranks TABLE is public data but
is not present in this offline environment and cannot be fabricated.
So this module ships the exact engine, parameterized by the table:

  - :class:`BPEEncoder` implements tiktoken's byte-pair merge loop
    (repeatedly merge the adjacent pair with the LOWEST rank; leftmost
    occurrence first) over regex pre-tokenized pieces — byte-exact
    tiktoken behavior for any ranks table;
  - :func:`BPEEncoder.from_tiktoken_file` loads the standard
    ``.tiktoken`` format (``<base64 token> <rank>`` per line) — drop a
    real ``cl100k_base.tiktoken`` at ``$GRAFT_CL100K_PATH`` (or
    ``pdf_extractor_ray/data/cl100k_base.tiktoken``) and
    :func:`textutils.token_count_cl100k` counts exactly like tiktoken
    on ARBITRARY text, not just the pinned golden fixture;
  - a small self-trained ranks table
    (``pdf_extractor_ray/data/graft_bpe_small.tiktoken``, produced by
    ``scripts/train_bpe.py`` with the standard BPE training loop over
    the deterministic synthetic corpus) ships in-repo so the loader +
    encoder run end to end at a realistic vocabulary shape in tests
    and offline counting stays a REAL BPE, with exact-count pins.

Offline counting precedence (see textutils.token_count_cl100k): real
cl100k table if present > pinned golden-fixture calibration > regex
approximation.
"""

from __future__ import annotations

import base64
import functools
import os
from typing import Iterable, Optional

import regex as _regex

__all__ = [
    "CL100K_PATTERN",
    "BPEEncoder",
    "get_cl100k_encoder",
    "get_builtin_encoder",
    "train_from_histogram",
]

# The published cl100k_base pre-tokenization pattern (tiktoken
# openai_public.py). The `regex` module supports \p{...} classes and
# the possessive-free lookahead exactly as Rust's fancy-regex does.
CL100K_PATTERN = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)"""
    r"""|[^\r\n\p{L}\p{N}]?\p{L}+"""
    r"""|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]+[\r\n]*"""
    r"""|\s*[\r\n]+"""
    r"""|\s+(?!\S)"""
    r"""|\s+"""
)


class BPEEncoder:
    """tiktoken-compatible byte-level BPE over a ranks table.

    ``ranks`` maps token bytes -> rank (merge priority AND token id,
    as in tiktoken). All 256 single-byte tokens must be present so
    every byte string is encodable.
    """

    def __init__(self, ranks: dict[bytes, int], pattern: str = CL100K_PATTERN):
        missing = [b for b in range(256) if bytes([b]) not in ranks]
        if missing:
            raise ValueError(
                f"ranks table lacks {len(missing)} single-byte tokens "
                f"(first: {missing[0]}); every byte string must be encodable"
            )
        self.ranks = dict(ranks)
        self._pat = _regex.compile(pattern)
        # piece-level memo: natural text re-uses a small set of pieces
        # (words with leading space), exactly why tiktoken caches too
        self._encode_piece = functools.lru_cache(maxsize=65536)(
            self._encode_piece_uncached
        )

    @classmethod
    def from_tiktoken_file(
        cls, path: str, pattern: str = CL100K_PATTERN
    ) -> "BPEEncoder":
        """Load a standard ``.tiktoken`` ranks file
        (``<base64 token> <rank>`` per non-empty line)."""
        ranks: dict[bytes, int] = {}
        with open(path, "rb") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                tok_b64, rank = line.split()
                ranks[base64.b64decode(tok_b64)] = int(rank)
        return cls(ranks, pattern=pattern)

    def to_tiktoken_file(self, path: str) -> None:
        with open(path, "wb") as f:
            for tok, rank in sorted(self.ranks.items(), key=lambda kv: kv[1]):
                f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")

    # ---- core merge loop (tiktoken byte_pair_encode semantics) ----

    def _encode_piece_uncached(self, piece: bytes) -> tuple[int, ...]:
        whole = self.ranks.get(piece)
        if whole is not None:
            return (whole,)
        parts = [piece[i : i + 1] for i in range(len(piece))]
        get = self.ranks.get
        while len(parts) > 1:
            best_rank: Optional[int] = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = get(parts[i] + parts[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return tuple(self.ranks[p] for p in parts)

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for piece in self._pat.findall(text):
            out.extend(self._encode_piece(piece.encode("utf-8")))
        return out

    def count(self, text: str) -> int:
        """Token count without materializing the id list."""
        n = 0
        for piece in self._pat.findall(text):
            n += len(self._encode_piece(piece.encode("utf-8")))
        return n

    def decode(self, ids: Iterable[int]) -> str:
        inv = getattr(self, "_inv", None)
        if inv is None:
            inv = self._inv = {r: t for t, r in self.ranks.items()}
        return b"".join(inv[i] for i in ids).decode("utf-8", errors="replace")


def train_from_histogram(
    piece_freq: dict[bytes, int], vocab_size: int
) -> dict[bytes, int]:
    """Standard BPE training (Sennrich et al. 2016 / GPT-2 style, byte
    level) over a WEIGHTED PIECE HISTOGRAM — the classic reduction that
    makes tokenizer training corpus-size-independent: the corpus only
    contributes (distinct piece -> count), and the merge loop runs over
    that bounded table. Start from the 256 single-byte tokens and
    repeatedly merge the most frequent adjacent pair (ties -> the
    lexicographically smallest pair, so training is fully
    deterministic), assigning ranks in merge order.

    Pair counts are maintained INCREMENTALLY: each merge re-segments
    only the pieces that contain the merged pair (tracked in an
    inverted pair->pieces index), so a merge costs O(sum of affected
    segment lengths), not a full histogram sweep — the shape that
    stays viable at 100k merges over millions of distinct pieces.
    """
    ranks: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    segs: dict[bytes, list[bytes]] = {
        p: [p[i : i + 1] for i in range(len(p))] for p in piece_freq
    }
    from collections import Counter

    pair_counts: Counter = Counter()
    pair_pieces: dict[tuple[bytes, bytes], set[bytes]] = {}
    for p, seg in segs.items():
        f = piece_freq[p]
        for i in range(len(seg) - 1):
            pair = (seg[i], seg[i + 1])
            pair_counts[pair] += f
            pair_pieces.setdefault(pair, set()).add(p)

    while len(ranks) < vocab_size and pair_counts:
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        # the same byte string can be reachable via two different
        # splits (ab+c and a+bc); if it's already a token, re-segment
        # with the existing rank and keep going
        if merged not in ranks:
            ranks[merged] = len(ranks)
        for p in list(pair_pieces.get(best, ())):
            seg = segs[p]
            f = piece_freq[p]
            # retract this piece's old pairs, re-segment, re-add new
            for i in range(len(seg) - 1):
                pair = (seg[i], seg[i + 1])
                pair_counts[pair] -= f
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                ps = pair_pieces.get(pair)
                if ps is not None:
                    ps.discard(p)
                    if not ps:
                        del pair_pieces[pair]
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
            for i in range(len(out) - 1):
                pair = (out[i], out[i + 1])
                pair_counts[pair] += f
                pair_pieces.setdefault(pair, set()).add(p)
    return ranks


_CL100K_SENTINEL = object()
_cl100k_cached: object = _CL100K_SENTINEL
_builtin_cached: object = _CL100K_SENTINEL

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def get_cl100k_encoder() -> Optional[BPEEncoder]:
    """The REAL cl100k_base encoder, when its public ranks table is on
    disk ($GRAFT_CL100K_PATH or data/cl100k_base.tiktoken); None
    offline. Result (including None) is cached for the process."""
    global _cl100k_cached
    if _cl100k_cached is _CL100K_SENTINEL:
        path = os.environ.get("GRAFT_CL100K_PATH") or os.path.join(
            _DATA_DIR, "cl100k_base.tiktoken"
        )
        _cl100k_cached = (
            BPEEncoder.from_tiktoken_file(path) if os.path.exists(path) else None
        )
    return _cl100k_cached  # type: ignore[return-value]


def get_builtin_encoder() -> BPEEncoder:
    """The vendored self-trained ranks table (always available): a
    real BPE for loader/engine end-to-end use. Vocab is 383 — the
    synthetic training corpus's merge saturation point (every distinct
    piece fully merged); novel text still drives the merge loop
    through partial merges."""
    global _builtin_cached
    if _builtin_cached is _CL100K_SENTINEL:
        _builtin_cached = BPEEncoder.from_tiktoken_file(
            os.path.join(_DATA_DIR, "graft_bpe_small.tiktoken")
        )
    return _builtin_cached  # type: ignore[return-value]
