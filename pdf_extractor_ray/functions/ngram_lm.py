"""Corpus-count n-gram familiarity scoring and positional phrase
search — the two workhorse "does the corpus know this sequence"
primitives, in exact integer arithmetic.

``bigram_familiarity`` is the integer-exact cousin of n-gram-LM
perplexity filtering (CCNet/KenLM-style): a document scores high when
its bigrams are common corpus-wide and low when they are rare. The
log is ``floor(log2(count))`` — computed as bit length, which SQL
replays verbatim via ``length(printf('%b', n)) - 1`` — so there is no
float in the pipeline and the DuckDB oracle hash-matches. Two
corpus-sized exchanges: bigram counts (hash-bucketed sum), then a
big-big join of per-doc bigram occurrences against those counts with
per-(bucket, doc) pre-aggregation before the final per-doc sum.

``phrase_count`` is the positional-index phrase intersection: postings
(doc, position) are built ONLY for the phrase's words (everything else
is dropped at the scan), exchanged by doc bucket, and the match count
per doc is |pos(w1) ∩ (pos(w2) - 1) ∩ ...| — the classic positional
AND. The SQL oracle replays it over the tokenized word arrays.

Reference parity: the reference scores/validates extracted text
quality per document (SURVEY.md §2.9 G4) and searches it via its DB
layer; these are the corpus-scale, from-scratch equivalents of its
sequence-frequency and phrase-lookup shapes.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .common import bucket_ids, coalesce_for_exchange

__all__ = ["bigram_familiarity", "phrase_count"]

_WORD_RE = re.compile(r"[a-z0-9]+")


def _words(text: str) -> list[str]:
    return _WORD_RE.findall((text or "").lower())


def bigram_familiarity(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 128,
) -> ray.data.Dataset:
    """Per-document bigram familiarity: (doc_id, n_bigrams, fam_sum,
    fam_milli) where fam_sum = sum over the doc's bigram TOKENS
    (multiplicity counts) of floor(log2(corpus_count(bigram))) and
    fam_milli = (1000 * fam_sum) // n_bigrams. Docs with < 2 words
    emit no row (mirrored by the oracle).

    Boilerplate/templated text scores high (its bigrams repeat
    corpus-wide), rare/garbled text scores near zero — the same
    discrimination KenLM perplexity gates buy, in exact integers.

    The input is consumed twice (count pass + score pass), so it is
    materialized once up front — the repo's standard multi-consumer
    contract (see packing.sequence_pack).
    """
    ds = ds.select_columns([id_col, text_col]).materialize()

    # ---- pass 1: corpus bigram counts (hash-bucketed partial sums)
    def bigram_partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            ws = _words(t)
            c.update(" ".join(p) for p in zip(ws, ws[1:]))
        if not c:
            return pa.table(
                {
                    "_bucket": pa.array([], pa.int64()),
                    "bg": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        bgs = np.asarray(list(c.keys()), dtype=object)
        return pa.table(
            {
                "_bucket": pa.array(bucket_ids(bgs, n_buckets)),
                "bg": pa.array(bgs, pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    def sum_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("bg", as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = (
        coalesce_for_exchange(
            ds.map_batches(bigram_partials, batch_format="pyarrow")
        )
        .groupby("_bucket")
        .map_groups(sum_in_bucket, batch_format="pandas")
    )

    # ---- pass 2: per-(doc, bigram) occurrences cogrouped with counts
    def doc_partials(batch: pa.Table) -> pa.Table:
        ids, bgs, ms = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            ws = _words(t)
            if len(ws) < 2:
                continue
            c = Counter(" ".join(p) for p in zip(ws, ws[1:]))
            ids.extend([int(i)] * len(c))
            bgs.extend(c.keys())
            ms.extend(c.values())
        arr = np.asarray(bgs, dtype=object)
        return pa.table(
            {
                "_bucket": pa.array(
                    bucket_ids(arr, n_buckets)
                    if bgs
                    else np.empty(0, dtype=np.int64)
                ),
                "side": pa.array(np.ones(len(bgs), dtype=np.int8)),
                "bg": pa.array(bgs, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "n": pa.array(ms, pa.int64()),
            }
        )

    def tag_counts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_bucket": pa.array(
                    bucket_ids(
                        np.asarray(batch["bg"].to_pandas(), dtype=object),
                        n_buckets,
                    )
                ),
                "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
                "bg": batch["bg"],
                "doc_id": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64), pa.int64()
                ),
                "n": batch["n"].cast(pa.int64()),
            }
        )

    def score_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cnt = group.loc[group["side"] == 0, ["bg", "n"]].rename(
            columns={"n": "cn"}
        )
        occ = group.loc[group["side"] == 1, ["bg", "doc_id", "n"]]
        m = occ.merge(cnt, on="bg", how="inner")
        # floor(log2(count)) = bit_length - 1, via frexp's exponent
        # (exact: counts < 2^53 convert to float64 losslessly and the
        # exponent field is integer metadata, no rounding involved);
        # SQL replays it as length(printf('%b', n)) - 1
        cn = m["cn"].to_numpy(dtype=np.int64)
        lg = np.frexp(cn.astype(np.float64))[1].astype(np.int64) - 1
        m = m.assign(fam=m["n"].to_numpy(np.int64) * lg)
        out = m.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n", "sum"), fam_sum=("fam", "sum")
        )
        return out.astype(
            {"doc_id": np.int64, "n_bigrams": np.int64, "fam_sum": np.int64}
        )

    per_bucket = (
        coalesce_for_exchange(
            ds.map_batches(doc_partials, batch_format="pyarrow").union(
                counts.map_batches(tag_counts, batch_format="pyarrow")
            )
        )
        .groupby("_bucket")
        .map_groups(score_in_bucket, batch_format="pandas")
    )

    # final per-doc sum: coarse doc-bucket map_groups, NOT the
    # Aggregate API — a ~doc-cardinality key through Ray's Aggregate
    # reduce is the measured 40x-CPU trap recorded in BASELINE.md
    # (clf_train, round 4); one vectorized pandas sum per bucket
    def tag_doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_dbucket": pa.array(np.abs(d) % n_buckets),
                "doc_id": pa.array(d, pa.int64()),
                "n_bigrams": batch["n_bigrams"].cast(pa.int64()),
                "fam_sum": batch["fam_sum"].cast(pa.int64()),
            }
        )

    def sum_per_doc(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("doc_id", as_index=False)[
            ["n_bigrams", "fam_sum"]
        ].sum()
        return out.astype(np.int64)

    per_doc = (
        coalesce_for_exchange(
            per_bucket.map_batches(tag_doc_bucket, batch_format="pyarrow")
        )
        .groupby("_dbucket")
        .map_groups(sum_per_doc, batch_format="pandas")
    )

    def finish(batch: pa.Table) -> pa.Table:
        nb = batch["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        fs = batch["fam_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "fam_sum": pa.array(fs, pa.int64()),
                "fam_milli": pa.array((1000 * fs) // nb, pa.int64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def phrase_count(
    ds: ray.data.Dataset,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact phrase-match counts via positional-postings intersection:
    (doc_id, n_matches) for every document where the phrase's words
    occur consecutively at least once (word alphabet = [a-z0-9]+ of
    lower(text), same as the rest of the text family).

    The scan emits postings (doc, word_index, position) ONLY for words
    that appear in the phrase — column pruning applied to the posting
    stream itself — then one doc-bucket exchange intersects
    pos(w_k) - k per doc. Phrases of length 1 degenerate to a term
    count; empty phrases are rejected.
    """
    pw = _words(phrase)
    if not pw:
        raise ValueError("phrase must contain at least one [a-z0-9]+ word")
    word_to_idx: dict[str, list[int]] = {}
    for k, w in enumerate(pw):
        word_to_idx.setdefault(w, []).append(k)
    n_words = len(pw)

    uniq_words = sorted(word_to_idx)
    # per unique phrase word: its widx list, for vectorized expansion
    widx_lists = [np.asarray(word_to_idx[w], dtype=np.int64) for w in uniq_words]

    def postings(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized tokenize: lower + split on non-[a-z0-9] in Arrow
        # C kernels; word positions are per-doc offsets into the flat
        # token stream (empties from leading/trailing separators are
        # skipped positionally, matching the regex-findall alphabet)
        low = pc.utf8_lower(
            pc.coalesce(batch[text_col], pa.scalar("", pa.string()))
        )
        split = pc.split_pattern_regex(low, r"[^a-z0-9]+")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        offsets = split.offsets.to_numpy()
        n_flat = len(flat)
        nonempty = pc.invert(pc.equal(flat, "")).to_numpy(
            zero_copy_only=False
        ) if n_flat else np.empty(0, dtype=bool)
        doc_ids_np = (
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # doc index of each flat token + position within its doc's
        # NON-EMPTY token sequence (exactly the findall order):
        # pos(i) = (# non-empty before i) - (# non-empty before the
        # doc's first token)
        doc_of = np.repeat(np.arange(len(doc_ids_np)), np.diff(offsets))
        if n_flat:
            cum_before = np.cumsum(nonempty) - nonempty
            starts = offsets[:-1]
            doc_start_cum = cum_before[starts.clip(max=n_flat - 1)]
            pos_in_doc = cum_before - doc_start_cum[doc_of]
        else:
            pos_in_doc = np.empty(0, dtype=np.int64)

        ids_l, idxs_l, poss_l = [], [], []
        for w, wl in zip(uniq_words, widx_lists):
            if not n_flat:
                break
            # Arrow C-kernel equality, not object-dtype numpy compare
            m = pc.equal(flat, w).to_numpy(zero_copy_only=False) & nonempty
            if not m.any():
                continue
            d = doc_ids_np[doc_of[m]]
            p = pos_in_doc[m]
            for k in wl:
                ids_l.append(d)
                idxs_l.append(np.full(len(d), k, dtype=np.int64))
                poss_l.append(p)
        if ids_l:
            ids = np.concatenate(ids_l)
            idxs = np.concatenate(idxs_l)
            poss = np.concatenate(poss_l)
        else:
            ids = idxs = poss = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "_bucket": pa.array(np.abs(ids) % n_buckets),
                "doc_id": pa.array(ids, pa.int64()),
                "widx": pa.array(idxs, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
            }
        )

    def intersect_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized positional AND across the whole bucket: an
        # anchor (doc, p) survives iff word k appears at (doc, p + k)
        # for every k — one hash merge per phrase word, never a
        # per-document Python loop (measured: the loop version spent
        # its wall time iterating ~1M pandas groups)
        anchors = group.loc[group["widx"] == 0, ["doc_id", "pos"]]
        anchors = anchors.drop_duplicates()
        for k in range(1, n_words):
            wk = group.loc[group["widx"] == k, ["doc_id", "pos"]].copy()
            if anchors.empty or wk.empty:
                anchors = anchors.iloc[0:0]
                break
            wk["pos"] = wk["pos"] - k
            anchors = anchors.merge(
                wk.drop_duplicates(), on=["doc_id", "pos"], how="inner"
            )
        out = anchors.groupby("doc_id", as_index=False).size()
        out = out.rename(columns={"size": "n_matches"})
        return out.astype(np.int64)

    return (
        coalesce_for_exchange(
            ds.select_columns([id_col, text_col]).map_batches(
                postings, batch_format="pyarrow"
            )
        )
        .groupby("_bucket")
        .map_groups(intersect_in_bucket, batch_format="pandas")
    )
