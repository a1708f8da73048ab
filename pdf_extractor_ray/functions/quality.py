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

__all__ = [
    "gopher_stats_batch",
    "gopher_quality",
    "repetition_stats_batch",
    "repetition_stats",
    "LexiconCounter",
    "lexicon_hits",
    "readability_scores",
    "garbled_stats_batch",
    "garbled_stats",
    "compression_stats",
]

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


# --------------------------------------------------- repetition filters

_ALNUM_WORD_RE = re.compile(r"[a-z0-9]+")

# Published Gopher repetition thresholds (§A1.2): fraction of
# characters in the most frequent word n-gram / in duplicated n-grams
MAX_TOP2_FRAC = 0.20
MAX_TOP3_FRAC = 0.18
MAX_DUP5_FRAC = 0.15


def _ngram_counts(words: list[str], n: int) -> dict[tuple, int]:
    counts: dict[tuple, int] = {}
    for i in range(len(words) - n + 1):
        g = tuple(words[i : i + n])
        counts[g] = counts.get(g, 0) + 1
    return counts


def repetition_stats_batch(
    batch: pa.Table,
    text_col: str = "text",
    max_top2: float = MAX_TOP2_FRAC,
    max_top3: float = MAX_TOP3_FRAC,
    max_dup5: float = MAX_DUP5_FRAC,
) -> pa.Table:
    """Gopher repetition statistics per document:

      - top-n-gram character fraction (n=2,3): characters covered by
        the heaviest repeated n-gram, ``max(count * chars)`` over
        n-grams with count >= 2, divided by total word characters;
      - duplicated-5-gram character fraction: characters covered by
        ALL 5-grams appearing >= 2 times (overlap-naive: each
        occurrence counts its full characters — the
        order-of-iteration-free definition the SQL oracle replicates).

    Words are ``[a-z0-9]+`` runs of the lowercased text; fractions are
    also exposed as exact centi-units.
    """
    out = {"top2_frac_c": [], "top3_frac_c": [], "dup5_frac_c": [],
           "rep_passes": []}
    for t in batch[text_col].to_pylist():
        words = _ALNUM_WORD_RE.findall((t or "").lower())
        total = sum(len(w) for w in words)
        fracs = {}
        for n, mode in ((2, "top"), (3, "top"), (5, "dup")):
            if total == 0 or len(words) < n:
                fracs[(n, mode)] = 0.0
                continue
            counts = _ngram_counts(words, n)
            if mode == "top":
                val = max(
                    (c * sum(len(w) for w in g) for g, c in counts.items() if c >= 2),
                    default=0,
                )
            else:
                val = sum(
                    c * sum(len(w) for w in g) for g, c in counts.items() if c >= 2
                )
            fracs[(n, mode)] = val / total
        top2, top3, dup5 = fracs[(2, "top")], fracs[(3, "top")], fracs[(5, "dup")]
        out["top2_frac_c"].append(_cents(top2))
        out["top3_frac_c"].append(_cents(top3))
        out["dup5_frac_c"].append(_cents(dup5))
        out["rep_passes"].append(
            top2 <= max_top2 and top3 <= max_top3 and dup5 <= max_dup5
        )
    cols = {n: batch[n] for n in batch.column_names if n != text_col}
    cols.update(
        {
            "top2_frac_c": pa.array(out["top2_frac_c"], pa.int64()),
            "top3_frac_c": pa.array(out["top3_frac_c"], pa.int64()),
            "dup5_frac_c": pa.array(out["dup5_frac_c"], pa.int64()),
            "rep_passes": pa.array(out["rep_passes"], pa.bool_()),
        }
    )
    return pa.table(cols)


def repetition_stats(
    ds: ray.data.Dataset, text_col: str = "text", **thresholds
) -> ray.data.Dataset:
    """Per-document repetition statistics + verdict (shuffle-free)."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col, **thresholds),
        batch_format="pyarrow",
    )


class LexiconCounter:
    """Actor-pool lexicon-match stage (the UT1/LDNOOBW-style blocklist
    gate): the term list is fetched from the object store and compiled
    into ONE word-boundary alternation ONCE per worker in
    ``__init__``; ``__call__`` counts per document. Matching is
    case-insensitive on whole words only — a term embedded in a longer
    word does not count. Emits ``n_hits`` (total matches),
    ``n_terms`` (distinct terms hit) and ``flagged``
    (n_hits >= threshold)."""

    def __init__(self, lexicon_ref, text_col: str = "text",
                 flag_threshold: int = 2):
        import ray as _ray

        terms = _ray.get(lexicon_ref)
        self._re = re.compile(
            r"\b(?:" + "|".join(re.escape(t) for t in sorted(terms))
            + r")\b",
            re.IGNORECASE,
        )
        self._text_col = text_col
        self._threshold = flag_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_hits, n_terms, flagged = [], [], []
        for t in batch[self._text_col].to_pylist():
            hits = self._re.findall(t or "")
            n_hits.append(len(hits))
            n_terms.append(len({h.lower() for h in hits}))
            flagged.append(1 if len(hits) >= self._threshold else 0)
        cols = {name: batch[name] for name in batch.column_names
                if name != self._text_col}
        cols["n_hits"] = pa.array(n_hits, pa.int64())
        cols["n_terms"] = pa.array(n_terms, pa.int64())
        cols["flagged"] = pa.array(flagged, pa.int64())
        return pa.table(cols)


def lexicon_hits(
    ds: ray.data.Dataset,
    lexicon: list[str],
    text_col: str = "text",
    flag_threshold: int = 2,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Blocklist-lexicon matching over the corpus: the term list ships
    to the object store ONCE (``ray.put``) and each worker compiles it
    once — never per batch. Shuffle-free."""
    import ray as _ray

    lexicon_ref = _ray.put(list(lexicon))
    return ds.map_batches(
        LexiconCounter,
        fn_constructor_kwargs={
            "lexicon_ref": lexicon_ref,
            "text_col": text_col,
            "flag_threshold": flag_threshold,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


_SENT_RE = re.compile(r"[.!?]")
_VOWEL_RUN_RE = re.compile(r"[aeiouy]+")


def readability_scores(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Flesch Reading Ease per document in exact milli-units — the
    classic readability gate (very low or implausibly high scores mark
    boilerplate, word salad, and template text in crawl curation):

        fre_m = 206835 - (1015 * n_words) // n_sents
                       - (84600 * n_syll) // n_words

    with n_sents = max(#[.!?], 1), syllables per word = max(vowel-run
    count, 1) over [aeiouy]+ on the lowercased word — the standard
    heuristic, chosen because every term is an integer a SQL oracle
    replays exactly (no float division). Wordless docs emit all-zero
    rows. One vectorizable map_batches pass, no shuffle."""

    def stats(batch: pa.Table) -> pa.Table:
        ids, nw, ns, sy, fre = [], [], [], [], []
        for i, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            ids.append(i)
            words = _WORD_RE.findall(text) if text else []
            if not words:
                nw.append(0); ns.append(0); sy.append(0); fre.append(0)
                continue
            n_words = len(words)
            n_sents = max(len(_SENT_RE.findall(text)), 1)
            n_syll = sum(
                max(len(_VOWEL_RUN_RE.findall(w.lower())), 1)
                for w in words
            )
            nw.append(n_words)
            ns.append(n_sents)
            sy.append(n_syll)
            fre.append(
                206_835
                - (1_015 * n_words) // n_sents
                - (84_600 * n_syll) // n_words
            )
        out = {
            id_col: pa.array(ids),
            "n_words": pa.array(nw, pa.int64()),
            "n_sents": pa.array(ns, pa.int64()),
            "n_syll": pa.array(sy, pa.int64()),
            "fre_m": pa.array(fre, pa.int64()),
        }
        for c in keep_cols:  # passthrough (e.g. lang for group stats)
            out[c] = batch[c]
        return pa.table(out)

    return ds.map_batches(stats, batch_format="pyarrow")


# -- garbled-text / encoding-artifact detection ----------------------
#
# OCR noise and mojibake survive every length/stopword gate: the
# document is long, "wordy", and mostly alphabetic, yet unusable for
# training. The classic artifact signals, each an exact integer count
# replayable by DuckDB's RE2 (no lookahead, maximal-munch counts match
# Python's leftmost-greedy findall on these patterns):
#
#   n_words     \S+ runs (denominator for any rate)
#   n_mixed     maximal [a-z0-9]+ runs of lower(text) containing BOTH a
#               letter and a digit (OCR confusions like 'l0rem', 'co1d';
#               inside an alnum run, "contains both" implies an adjacent
#               letter-digit switch, which the pattern anchors on)
#   n_consrun   runs of >=5 consonants (keyboard mash / binary-as-text)
#   n_repl      U+FFFD replacement characters (hard decode failures)
#   n_nonascii  codepoints > 0x7f (mojibake shows up as bursts of them)
_GARBLED_MIXED_RE = re.compile(
    r"[a-z0-9]*(?:[a-z][0-9]|[0-9][a-z])[a-z0-9]*"
)
_GARBLED_CONSRUN_RE = re.compile(r"[bcdfghjklmnpqrstvwxz]{5,}")


def garbled_stats_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-document garbled-text artifact counts (exact integers).

    Stateless per-row map — compiled module-level regexes, C-level
    scans per row, no shuffle; embarrassingly parallel at 100 TB."""
    ids = batch[id_col]
    n_words, n_mixed, n_consrun, n_repl, n_nonascii = [], [], [], [], []
    for t in batch[text_col].to_pylist():
        t = t or ""
        lower = t.lower()
        n_words.append(len(_WORD_RE.findall(t)))
        n_mixed.append(len(_GARBLED_MIXED_RE.findall(lower)))
        n_consrun.append(len(_GARBLED_CONSRUN_RE.findall(lower)))
        n_repl.append(t.count("�"))
        # codepoints > 0x7f: ascii-encode with errors='ignore' drops
        # exactly the non-ASCII codepoints (C-speed, no per-char loop)
        n_nonascii.append(len(t) - len(t.encode("ascii", "ignore")))
    return pa.table(
        {
            id_col: ids,
            "n_words": pa.array(n_words, pa.int64()),
            "n_mixed": pa.array(n_mixed, pa.int64()),
            "n_consrun": pa.array(n_consrun, pa.int64()),
            "n_repl": pa.array(n_repl, pa.int64()),
            "n_nonascii": pa.array(n_nonascii, pa.int64()),
        }
    )


def garbled_stats(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document garbled-text artifact counts (see
    :func:`garbled_stats_batch`)."""
    return ds.map_batches(
        lambda b: garbled_stats_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def compression_stats(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> ray.data.Dataset:
    """Per-document zlib compression ratio in exact milli-units:
    (doc_id, raw_len, zlib_len, ratio_milli) with ratio_milli =
    (1000 * zlib_len) // max(raw_len, 1) over the utf-8 bytes.

    The classic cheap quality signal (used by large public web-corpus
    pipelines): highly repetitive/templated text compresses far below
    natural prose (~250-450 milli), while already-compressed garbage
    or random bytes sit near or above 1000. Deterministic for a fixed
    zlib build, but NOT SQL-replayable (no DEFLATE in the oracle
    engine), so the gate checks rows-only and the test suite pins the
    discrimination property plus distributed == serial equality.

    One vectorizable map_batches pass, no shuffle; zlib is C-speed so
    the loop body is dominated by compression itself.
    """
    import zlib

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        raw_l, zl, ratio = [], [], []
        for t in batch[text_col].to_pylist():
            b = (t or "").encode("utf-8")
            c = len(zlib.compress(b, level))
            raw_l.append(len(b))
            zl.append(c)
            ratio.append((1000 * c) // max(len(b), 1))
        return pa.table(
            {
                id_col: ids,
                "raw_len": pa.array(raw_l, pa.int64()),
                "zlib_len": pa.array(zl, pa.int64()),
                "ratio_milli": pa.array(ratio, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")
