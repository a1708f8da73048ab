"""Unigram-LM (SentencePiece-style) tokenizer — deterministic
integer-exact Viterbi-EM over a candidate-piece lattice.

Behavioral spec (public): Kudo 2018 ("Subword Regularization: ...
Multiple Subword Candidates", §3) trains a unigram language model
over subword pieces: seed a large candidate vocabulary from corpus
substrings, run EM where the E-step segments words over the piece
lattice and the M-step re-estimates piece probabilities, then prune
to the target vocabulary. SentencePiece is the reference
implementation and the standard BPE alternative (T5, mT5, LLaMA's
tokenizer family all train this way).

This module is the DETERMINISTIC integer form of that loop, so the
distributed == serial == hand-computed-lattice pytest pins are exact:

- piece scores are raw integer COUNTS c(p) with total T; a
  segmentation s_1..s_k scores prod c(s_i) / T^k.
- hard (Viterbi) EM: the E-step takes each word's single BEST
  segmentation; scores compare EXACTLY by cross-multiplying
  arbitrary-precision integers (num_a * T^k_b vs num_b * T^k_a) —
  no float ever touches a decision.
- ties break by (fewer pieces, then lexicographically smallest piece
  sequence) — total order, replayable anywhere.
- the M-step re-counts pieces from the Viterbi segmentations weighted
  by word frequency; single characters are always retained (coverage
  guarantee), and pruning keeps the top ``vocab_size`` pieces by
  (count DESC, piece ASC).

Like `kernel/bpe.py::train_from_histogram`, training consumes ONLY
the bounded distinct-word histogram — the 100-TB corpus contributes
one streaming histogram pass (functions/tokenizer.py), never rows.
"""

from __future__ import annotations

__all__ = [
    "seed_candidates",
    "viterbi_segment",
    "train_unigram_from_histogram",
    "UnigramModel",
]


def seed_candidates(
    hist: dict[str, int],
    max_piece_len: int = 8,
    seed_size: int = 100_000,
) -> dict[str, int]:
    """Candidate pieces = every substring (length <= max_piece_len)
    of every distinct word, counted with the word's corpus frequency
    per occurrence; capped at the ``seed_size`` most frequent (ties
    piece ASC) plus ALL single characters (coverage)."""
    cand: dict[str, int] = {}
    for w, f in hist.items():
        m = len(w)
        for i in range(m):
            for l in range(1, min(max_piece_len, m - i) + 1):
                p = w[i : i + l]
                cand[p] = cand.get(p, 0) + f
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    kept = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = dict(kept)
    out.update(singles)  # singles always present
    return out


def _better(a, b, total: int) -> bool:
    """True if segmentation a beats b. a/b = (num, k, seq): score
    num / total^k; exact cross-multiplied compare, ties to fewer
    pieces then lexicographically smallest sequence."""
    la = a[0] * total ** b[1]
    lb = b[0] * total ** a[1]
    if la != lb:
        return la > lb
    if a[1] != b[1]:
        return a[1] < b[1]
    return a[2] < b[2]


def viterbi_segment(
    word: str, counts: dict[str, int], total: int, max_piece_len: int
) -> tuple:
    """Best segmentation of ``word`` under the current counts.
    Characters absent from ``counts`` act as count-0 pieces (score 0
    but still segmentable — the deterministic unknown-char fallback).
    Returns (num, k, seq)."""
    m = len(word)
    best: list = [None] * (m + 1)
    best[0] = (1, 0, ())
    for j in range(1, m + 1):
        bb = None
        for l in range(1, min(max_piece_len, j) + 1):
            prev = best[j - l]
            if prev is None:
                continue
            p = word[j - l : j]
            c = counts.get(p)
            if c is None:
                if l > 1:
                    continue
                c = 0  # unknown single char: count-0 fallback
            cand = (prev[0] * c, prev[1] + 1, prev[2] + (p,))
            if bb is None or _better(cand, bb, total):
                bb = cand
        best[j] = bb
    return best[m]


class UnigramModel:
    """Trained piece inventory: integer counts + total, plus the
    Viterbi encoder. Equality of (counts, total) across engines is
    the training contract; `encode` is the deterministic tokenizer."""

    def __init__(self, counts: dict[str, int], max_piece_len: int):
        self.counts = dict(counts)
        self.total = sum(self.counts.values())
        self.max_piece_len = max_piece_len
        # deterministic piece ids: (count DESC, piece ASC) rank order
        self.piece_id = {
            p: i
            for i, (p, _) in enumerate(
                sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }

    def encode(self, word: str) -> list[str]:
        return list(
            viterbi_segment(
                word, self.counts, self.total, self.max_piece_len
            )[2]
        )

    def encode_ids(self, word: str) -> list[int]:
        # unknown single chars map to id -1
        return [self.piece_id.get(p, -1) for p in self.encode(word)]


def train_unigram_from_histogram(
    hist: dict[str, int],
    vocab_size: int,
    n_em: int = 2,
    max_piece_len: int = 8,
    seed_size: int = 100_000,
) -> UnigramModel:
    """Viterbi-EM over the bounded distinct-word histogram.

    Each round: segment every distinct word once (Viterbi under the
    current integer counts), re-count pieces weighted by word
    frequency, retain all single chars at count >= 1. After the
    rounds, prune to ``vocab_size`` by (count DESC, piece ASC),
    singles always kept."""
    counts = seed_candidates(hist, max_piece_len, seed_size)
    words = sorted(hist.items())  # deterministic iteration order
    singles = sorted({ch for w, _ in words for ch in w})
    for _ in range(max(0, int(n_em))):
        total = sum(counts.values())
        new: dict[str, int] = {}
        for w, f in words:
            seq = viterbi_segment(w, counts, total, max_piece_len)[2]
            for p in seq:
                new[p] = new.get(p, 0) + f
        for ch in singles:  # coverage floor
            if new.get(ch, 0) < 1:
                new[ch] = 1
        counts = new
    kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :vocab_size
    ]
    out = dict(kept)
    for ch in singles:
        if ch not in out:
            out[ch] = counts.get(ch, 1)
    return UnigramModel(out, max_piece_len)
