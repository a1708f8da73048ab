"""Document chunking — split long documents into overlapping windows.

The step between a cleaned corpus and both pretraining (fixed-length
windows feeding sequence packing) and retrieval indexing (RAG chunk
stores): each document becomes ceil(n_words / stride) chunks of up to
``chunk_words`` words, consecutive chunks sharing ``overlap`` words.

The explode never leaves the task (flat-map inside ``map_batches`` —
one input row becomes a few output rows in the same block), so the
operator is shuffle-free and embarrassingly parallel. Chunk boundaries
are word-index arithmetic over ``\\S+`` runs, exactly reproducible in
SQL via list slicing, which is what the driver oracle does.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray.data

__all__ = ["chunk_documents_batch", "chunk_documents", "sentence_split"]

_WORD_RE = re.compile(r"\S+")


def chunk_documents_batch(
    batch: pa.Table,
    chunk_words: int = 200,
    overlap: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """One input row -> ceil(n_words / (chunk_words - overlap)) chunk
    rows: (id, chunk_idx, n_words_chunk, chunk_text). Documents with
    zero words produce zero chunks."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    out_id, out_idx, out_n, out_text = [], [], [], []
    for doc_id, t in zip(
        batch[id_col].to_pylist(), batch[text_col].to_pylist()
    ):
        words = _WORD_RE.findall(t or "")
        idx = 0
        for start in range(0, len(words), stride):
            chunk = words[start : start + chunk_words]
            out_id.append(doc_id)
            out_idx.append(idx)
            out_n.append(len(chunk))
            out_text.append(" ".join(chunk))
            idx += 1
    return pa.table(
        {
            id_col: pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "n_words_chunk": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
        }
    )


def chunk_documents(
    ds: ray.data.Dataset,
    chunk_words: int = 200,
    overlap: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_fingerprint: bool = False,
) -> ray.data.Dataset:
    """Chunk every document (shuffle-free in-batch explode). With
    ``with_fingerprint`` each chunk also carries md5(chunk_text) — the
    form a downstream chunk-level dedup or vector indexer consumes."""

    def explode(batch: pa.Table) -> pa.Table:
        t = chunk_documents_batch(batch, chunk_words, overlap, text_col, id_col)
        if with_fingerprint:
            fps = [
                hashlib.md5(x.encode("utf-8", "replace")).hexdigest()
                for x in t["chunk_text"].to_pylist()
            ]
            t = t.append_column("chunk_fp", pa.array(fps, pa.string()))
        return t

    return ds.map_batches(explode, batch_format="pyarrow")


_SENT_PIECE_RE = __import__("re").compile(r"[^.!?]+[.!?]*")
_ASCII_WS = " \t\n\r\f\v"


def sentence_split(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Sentence-level explode for pretraining/dedup: one row per
    sentence, ``(doc_id, sent_idx, sentence, n_words)``.

    Rule (chosen RE2-compatible — no lookbehind, so a SQL oracle
    replays it verbatim): a sentence is a maximal run of
    non-terminator characters plus its trailing ``[.!?]+``; each
    piece is trimmed of ASCII whitespace and empty pieces drop
    (leading bare terminators therefore never form a sentence —
    documented contract, not an accident). ``sent_idx`` numbers the
    SURVIVING sentences. Pure flat-map, no exchange."""

    def explode(batch: pa.Table) -> pa.Table:
        import re

        ids, idxs, sents, nw = [], [], [], []
        for i, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            if not text:
                continue
            k = 0
            for piece in _SENT_PIECE_RE.findall(text):
                s = piece.strip(_ASCII_WS)
                if not s:
                    continue
                ids.append(i)
                idxs.append(k)
                sents.append(s)
                nw.append(len(re.findall(r"\S+", s)))
                k += 1
        return pa.table(
            {
                id_col: pa.array(ids),
                "sent_idx": pa.array(idxs, pa.int64()),
                "sentence": pa.array(sents, pa.string()),
                "n_words": pa.array(nw, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
