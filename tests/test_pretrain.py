"""Flagship pretraining-corpus chain (functions/pretrain.py)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.mixture import temperature_quotas
from pdf_extractor_ray.functions.pretrain import (
    drop_rows_by_ids,
    pretrain_corpus_chain,
)


def _mk_ds(ray_session, df, parts=4):
    import ray.data

    return ray.data.from_pandas(df).repartition(parts)


class TestDropRowsByIds:
    def test_anti_join_keeps_full_rows(self, ray_session):
        import ray.data

        rows = pd.DataFrame(
            {
                "doc_id": np.arange(20, dtype=np.int64),
                "text": [f"text {i}" for i in range(20)],
                "lang": ["en", "de"] * 10,
            }
        )
        drops = pd.DataFrame(
            {"doc_id": np.array([3, 7, 11, 99], dtype=np.int64)}
        )
        out = (
            drop_rows_by_ids(
                _mk_ds(ray_session, rows), _mk_ds(ray_session, drops, 2)
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            rows[~rows["doc_id"].isin({3, 7, 11})]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, want)


def _serial_chain(df, bench_ids, chunk_len=8, n_shards=2):
    """Plain-python replay of the whole chain on a tiny frame."""
    from pdf_extractor_ray.functions.quality import gopher_stats_batch

    # 1. gopher gate (reuse the per-batch kernel — separately tested)
    t = pa.Table.from_pandas(df, preserve_index=False)
    passes = gopher_stats_batch(t, min_stopwords=1)["passes"].to_pylist()
    df = df[np.array(passes)].reset_index(drop=True)
    # 2. exact dedup, keep min id
    df = df.sort_values("doc_id").drop_duplicates("text").reset_index(
        drop=True
    )
    # 3. exact 3-gram jaccard clusters, transitive, keep canonical
    def shingles(text):
        ws = text.lower().split()
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sh = {r.doc_id: shingles(r.text) for r in df.itertuples()}
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a in ids:
        for b in ids:
            if a < b:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= 0.8:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    keep = {i for i in ids if find(i) == i}
    df = df[df["doc_id"].isin(keep)].reset_index(drop=True)
    # 4. 8-gram contamination strip
    bench = set()
    for r in df.itertuples():
        pass
    bench_texts = bench_ids  # dict id -> text
    for text in bench_texts.values():
        ws = text.split()
        for i in range(max(len(ws) - 7, 0)):
            bench.add(
                hashlib.md5(
                    " ".join(ws[i : i + 8]).encode("utf-8", "replace")
                ).hexdigest()
            )
    kept_texts = {}
    for r in df.itertuples():
        ws = r.text.split()
        m = len(ws)
        dead = np.zeros(m, bool)
        for i in range(max(m - 7, 0)):
            h = hashlib.md5(
                " ".join(ws[i : i + 8]).encode("utf-8", "replace")
            ).hexdigest()
            if h in bench:
                dead[i : i + 8] = True
        kept_texts[r.doc_id] = [w for w, d in zip(ws, dead) if not d]
    # 5. mixture selection
    counts = df.groupby("lang").size().to_dict()
    budget = 2 * len(df) // 5
    quotas = temperature_quotas(counts, budget)
    sel_ids = []
    for lang, g in df.groupby("lang"):
        ranked = sorted(
            g["doc_id"],
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        sel_ids.extend(ranked[: quotas[lang]["quota"]])
    sel_ids = sorted(sel_ids)
    # 6. token stream -> chunks
    stream = []
    for d in sel_ids:
        for j in range(len(kept_texts[d])):
            stream.append((d * 31 + j) % 32000)
    # 7. shard fingerprints
    rows = []
    per_shard = {}
    for pos, tid in enumerate(stream):
        cid = pos // chunk_len
        per_shard.setdefault(cid % n_shards, []).append((cid, pos, tid))
    for s, items in sorted(per_shard.items()):
        items.sort(key=lambda x: x[1])
        toks = np.array([t for _, _, t in items], dtype=np.int64)
        raw = toks.astype("<u2").tobytes()
        cids = sorted({c for c, _, _ in items})
        lens = [sum(1 for c, _, _ in items if c == cid) for cid in cids]
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(int)
        trip = ",".join(
            f"{c}:{o}:{n}" for c, o, n in zip(cids, offs, lens)
        )
        rows.append(
            {
                "shard": s,
                "n_chunks": len(cids),
                "n_tokens": len(toks),
                "bin_md5": hashlib.md5(raw.hex().encode()).hexdigest(),
                "idx_md5": hashlib.md5(trip.encode()).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


class TestPretrainChain:
    def test_matches_serial_replay(self, ray_session, tmp_path):
        rng = np.random.RandomState(17)
        vocab = [
            "the", "data", "pipeline", "token", "stream", "quality",
            "corpus", "shard", "model", "train", "batch", "graph",
        ]
        rows = []
        for i in range(30):
            n = rng.randint(55, 90)
            words = [vocab[v] for v in rng.randint(0, len(vocab), n)]
            rows.append(
                {
                    "doc_id": np.int64(i),
                    "text": " ".join(words),
                    "lang": "en" if i % 3 else "de",
                }
            )
        df = pd.DataFrame(rows)
        # plant: exact dup of doc 2, near dup of doc 5, a doc quoting
        # 8 consecutive words of benchmark doc 0
        df.loc[len(df)] = {
            "doc_id": np.int64(100),
            "text": df.loc[2, "text"],
            "lang": "en",
        }
        df.loc[len(df)] = {
            "doc_id": np.int64(101),
            "text": df.loc[5, "text"] + " extra",
            "lang": "en",
        }
        quoted = " ".join(df.loc[0, "text"].split()[10:18])
        df.loc[len(df)] = {
            "doc_id": np.int64(102),
            "text": df.loc[7, "text"] + " " + quoted + " closing words "
            + df.loc[8, "text"],
            "lang": "de",
        }

        bench = {0: df.loc[0, "text"]}
        bench_df = pd.DataFrame(
            {"doc_id": [np.int64(0)], "text": [bench[0]]}
        )
        got = pretrain_corpus_chain(
            _mk_ds(ray_session, df),
            _mk_ds(ray_session, bench_df, 1),
            str(tmp_path / "shards"),
            chunk_len=8,
            n_shards=2,
        ).reset_index(drop=True)
        want = _serial_chain(df, bench, chunk_len=8, n_shards=2)
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False
        )
        assert got["n_tokens"].sum() > 0
