"""Corpus-level deduplication operators.

All shuffles here move NARROW data (hashes + ids), never full documents:

  - exact dedup: per-batch partial aggregation (hash -> min id, count)
    BEFORE the groupby, so the all-to-all exchange carries one row per
    distinct hash per batch instead of one per document
  - MinHash-LSH near-dup: shingle -> 64-perm minhash per batch
    (vectorized numpy over crc32 shingle hashes, deterministic across
    processes — no PYTHONHASHSEED dependence) -> explode to
    (band, band_hash, doc_id) rows -> groupby band bucket -> candidate
    pairs -> exact-Jaccard verification
  - SimHash near-dup: 64-bit sign-sum sketch, 4x16-bit band blocking,
    Hamming-distance verification

Verification joins candidate pairs back to texts via a broadcast
(`ray.put`) that contains ONLY candidate docs' texts (selected by a
broadcast-filter pass after LSH) — broadcast size scales with the
near-dup fraction, not the corpus. If even the candidate set outgrows
one node, replace the broadcast with a hash-partitioned pair join: emit
(doc_id -> features) and (pair) datasets keyed by doc_id bucket and join
per bucket (the groupby-bucket pattern in /opt guides). The LSH banding
itself already scales — it is the only all-to-all step and carries
16 x 8-byte keys per document.
"""

from __future__ import annotations

import hashlib
import itertools
import re
import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min, Sum

__all__ = [
    "md5_hex",
    "exact_dedup_summary",
    "exact_dedup",
    "key_dedup_summary",
    "minhash_signature",
    "minhash_candidates",
    "minhash_dedup_pairs",
    "simhash64",
    "simhash_dedup_pairs",
    "ngram_jaccard",
]

_WORD_RE = re.compile(r"\S+")

# 64 fixed random-ish odd multipliers/offsets for the minhash
# permutations (seeded once at import; deterministic).
_N_PERM = 64
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64) | 1
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64)


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", errors="replace")).hexdigest()


# ---------------------------------------------------------------- exact


def exact_dedup_summary(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per distinct content hash: the kept (minimum) id and the
    duplicate count.

    Shuffle carries per-batch partials (one row per distinct hash per
    batch), keyed by a COARSE bucket of the hash — a corpus has one
    group per distinct document, and keying the exchange on the raw
    hash put millions of groups into the aggregate machinery (the
    10M-row pathology fixed across this repo); the fine merge is a
    vectorized pandas groupby inside each bucket."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        agg: dict[str, list] = {}
        for i, t in zip(ids, texts):
            h = md5_hex(t or "")
            cur = agg.get(h)
            if cur is None:
                agg[h] = [i, 1]
            else:
                cur[0] = min(cur[0], i)
                cur[1] += 1
        hashes = list(agg.keys())
        return pa.table(
            {
                "text_hash": hashes,
                "keep_doc_id": [v[0] for v in agg.values()],
                "dup_count": [v[1] for v in agg.values()],
                "_bucket": pa.array(
                    [zlib.crc32(h.encode()) % 1024 for h in hashes], pa.int64()
                ),
            }
        )

    def merge(group) -> "pa.Table":
        import pandas as pd

        g = group.groupby("text_hash", as_index=False).agg(
            keep_doc_id=("keep_doc_id", "min"), dup_count=("dup_count", "sum")
        )
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
        .select_columns(["text_hash", "keep_doc_id", "dup_count"])
    )


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the minimum-id row per distinct content hash.

    Shuffle shape: the partition key is a COARSE bucket of the hash
    (1024 of them), not the hash itself — a corpus has one group per
    distinct document and per-group task overhead would dominate. Rows
    co-locate by hash inside a bucket, where a vectorized pandas
    sort + drop_duplicates keeps the min-id row per hash. One pass,
    one shuffle (unavoidable: the output is full surviving rows).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [md5_hex(t or "") for t in batch[text_col].to_pylist()]
        buckets = [zlib.crc32(h.encode()) % 1024 for h in hashes]
        batch = batch.append_column("text_hash", pa.array(hashes, pa.string()))
        return batch.append_column("_bucket", pa.array(buckets, pa.int64()))

    def keep_first(group):  # one coarse bucket of rows
        g = group.sort_values(["text_hash", id_col])
        return g.drop_duplicates(subset=["text_hash"], keep="first").drop(
            columns=["_bucket"]
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(keep_first, batch_format="pandas")
    )


def key_dedup_summary(
    ds: ray.data.Dataset, key_col: str = "url", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup on a key column (url-dedup, SURVEY.md §7.1 step 8):
    per distinct key, the kept (minimum) id and the duplicate count.

    Same shuffle shape as ``exact_dedup_summary``: per-batch partials
    (one row per distinct key per batch), a coarse key-bucket exchange,
    and a vectorized in-bucket merge — never one aggregate group per
    distinct key.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table({key_col: batch[key_col], id_col: batch[id_col]}).to_pandas()
        g = df.groupby(key_col, as_index=False).agg(
            keep_doc_id=(id_col, "min"), dup_count=(id_col, "size")
        )
        g["_bucket"] = [zlib.crc32(str(k).encode()) % 1024 for k in g[key_col]]
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(group):
        return group.groupby(key_col, as_index=False).agg(
            keep_doc_id=("keep_doc_id", "min"), dup_count=("dup_count", "sum")
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
        .select_columns([key_col, "keep_doc_id", "dup_count"])
    )


# Per-worker cache of broadcast verify sides (keyed by object ref hex):
# Arrow bytes live zero-copy in plasma; the Python dict view of them is
# built once per process, not once per batch.
_VERIFY_SIDE_CACHE: dict = {}


def _verify_side_cached(side_ref, id_col: str, text_col: str) -> dict:
    key = side_ref.hex()
    cached = _VERIFY_SIDE_CACHE.get(key)
    if cached is None:
        side_t = ray.get(side_ref)
        cached = dict(
            zip(side_t[id_col].to_pylist(), side_t[text_col].to_pylist())
        )
        _VERIFY_SIDE_CACHE.clear()  # one corpus at a time per worker
        _VERIFY_SIDE_CACHE[key] = cached
    return cached


# -------------------------------------------------------------- minhash


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 of word k-shingles (deterministic across processes)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.array(
        [zlib.crc32(s.encode("utf-8")) for s in set(shingles)], dtype=np.int64
    )


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-perm minhash signature (int64[64])."""
    h = _shingle_hashes(text, k)
    # (a*h + b) mod p for each permutation, min over shingles
    vals = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


# Odd multipliers for the vectorized band hash (splitmix-style mixing;
# any deterministic injective-ish combine works — identical signatures
# always produce identical band hashes, which is the only property the
# LSH banding relies on).
_BAND_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93],
    dtype=np.uint64,
)


def _band_hashes(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_docs, 64) signatures -> (n_docs, n_bands) int64 band hashes,
    fully vectorized (no per-band Python hashing)."""
    n, width = sigs.shape
    rows = width // n_bands
    assert rows * n_bands == width
    bands = sigs.astype(np.uint64).reshape(n, n_bands, rows)
    mix = _BAND_MIX[:rows]
    acc = np.zeros((n, n_bands), dtype=np.uint64)
    for j in range(rows):
        acc ^= (bands[:, :, j] + np.uint64(j + 1)) * mix[j]
        acc ^= acc >> np.uint64(29)
    return acc.view(np.int64)


def minhash_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Candidate near-dup pairs via LSH banding.

    Emits unique (doc_a < doc_b) pairs from any shared band bucket.
    Buckets larger than ``max_bucket`` are truncated (logged via the
    ``truncated`` column) — a hot bucket at corpus scale means a
    degenerate shingle (boilerplate); salt or drop it rather than
    exploding O(n^2) pairs.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        if not ids:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        sigs = np.stack(
            [minhash_signature(t or "", shingle_k) for t in texts]
        )  # (n, 64)
        hashes = _band_hashes(sigs, n_bands)  # (n, n_bands), vectorized
        n = len(ids)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(n_bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(hashes.ravel()),
                "doc_id": pa.array(
                    np.repeat(np.asarray(ids, dtype=np.int64), n_bands)
                ),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        hashes = batch["band_hash"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((hashes % 128).astype("int64"))
        )

    def pairs(group):  # pandas group: one hash bucket of band rows
        import pandas as pd

        seen: set[tuple] = set()
        for (_, _), sub in group.groupby(["band", "band_hash"]):
            ids = sorted(sub["doc_id"].tolist())[:max_bucket]
            seen.update(itertools.combinations(ids, 2))
        if not seen:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        out = sorted(seen)
        return pd.DataFrame(
            {"doc_a": [p[0] for p in out], "doc_b": [p[1] for p in out]}
        )

    # The shuffle key is a COARSE bucket (128 of them), not the raw
    # (band, band_hash): a corpus has millions of tiny band groups and
    # per-group task overhead dwarfs the work — the fine grouping
    # happens in pandas inside each bucket. Same result, ~100x fewer
    # groups. Cross-bucket duplicate pairs (same pair from bands in
    # different buckets) are possible; callers dedupe the (small)
    # verified output.
    bands = ds.map_batches(to_bands, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow"
    )
    return bands.groupby("bucket").map_groups(pairs, batch_format="pandas")


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity."""
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """LSH candidates verified by exact n-gram Jaccard >= threshold.

    The verify broadcast contains ONLY the texts of candidate docs: the
    LSH pass runs first, the distinct ids in its (bounded) pair output
    select the needed rows via a broadcast-filter pass over the corpus,
    and that candidate-sized side ships to the verify tasks. Broadcast
    size therefore scales with the near-dup fraction, not the corpus —
    at 505k docs this cut the op's wall time ~3x versus broadcasting
    every text (driver materialize + per-worker dict builds dominated).
    """
    cand_df = (
        minhash_candidates(ds, text_col, id_col, shingle_k=shingle_k)
        .to_pandas()
        .drop_duplicates(subset=["doc_a", "doc_b"])
    )
    if cand_df.empty:
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        )
    ids = np.sort(
        np.unique(
            np.concatenate(
                [cand_df["doc_a"].to_numpy(), cand_df["doc_b"].to_numpy()]
            )
        )
    )
    ids_ref = ray.put(ids)

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)  # zero-copy
        vals = batch[id_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(wanted, vals)
        idx[idx >= len(wanted)] = 0
        mask = wanted[idx] == vals
        return pa.table(
            {
                id_col: batch[id_col],
                text_col: batch[text_col],
            }
        ).filter(pa.array(mask))

    side = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    # Arrow-table broadcast (plasma zero-copy); verify tasks build the
    # dict view once per worker (_verify_side_cached)
    side_ref = ray.put(
        pa.table({id_col: side[id_col].tolist(), text_col: side[text_col].tolist()})
    )
    cand = ray.data.from_pandas(cand_df)

    def verify(batch: pa.Table) -> pa.Table:
        # The id->text dict is built ONCE per worker process and cached
        # (rebuilding Python strings from the Arrow broadcast per batch
        # would cost O(corpus) per candidate batch).
        texts = _verify_side_cached(side_ref, id_col, text_col)
        doc_a = batch["doc_a"].to_pylist()
        doc_b = batch["doc_b"].to_pylist()
        jac = [
            ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
            for a, b in zip(doc_a, doc_b)
        ]
        out = pa.table(
            {
                "doc_a": pa.array(doc_a, pa.int64()),
                "doc_b": pa.array(doc_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    # cross-bucket duplicate pairs were already dropped driver-side
    return cand.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (crc32 features, weight 1).

    Bit expansion via ``np.unpackbits`` on the little-endian byte view
    (bit i of the unpacked row == ``(x >> i) & 1``) — ~25% cheaper than
    the shift-matrix formulation, identical output.
    """
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    feats = np.array([zlib.crc32(w.encode("utf-8")) for w in words], dtype=np.uint64)
    # expand crc32 to 64 bits deterministically
    feats = feats * np.uint64(0x9E3779B97F4A7C15)
    bytes_ = feats.view(np.uint8).reshape(len(feats), 8)
    bits = np.unpackbits(bytes_, axis=1, bitorder="little")
    sums = (2 * bits.astype(np.int32) - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if sums[i] > 0:
            out |= 1 << i
    return out


def simhash_dedup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Blocking: 4 x 16-bit bands — any pair within Hamming distance 3
    shares at least one exact band (pigeonhole), so candidate recall is
    exact. The shuffle carries (band, band16, doc_id, simhash) only.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sh = simhash64(text or "")
            for b in range(4):
                band16 = (sh >> (16 * b)) & 0xFFFF
                rows.append((b, band16, doc_id, sh))
        return pa.table(
            {
                "band": pa.array([r[0] for r in rows], pa.int32()),
                "band16": pa.array([r[1] for r in rows], pa.int64()),
                "doc_id": pa.array([r[2] for r in rows], pa.int64()),
                "simhash": pa.array(
                    [np.int64(np.uint64(r[3]).astype(np.int64)) for r in rows],
                    pa.int64(),
                ),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bands_np = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        band16 = batch["band16"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(((bands_np * 65536 + band16) % 128).astype("int64"))
        )

    def pairs(group):  # one coarse bucket; fine grouping in pandas
        import pandas as pd

        out: dict[tuple, int] = {}
        for (_, _), sub in group.groupby(["band", "band16"]):
            recs = sorted(zip(sub["doc_id"].tolist(), sub["simhash"].tolist()))[:200]
            for (ida, sa), (idb, sb) in itertools.combinations(recs, 2):
                key = (ida, idb)
                if key in out:
                    continue
                ham = bin(
                    (int(sa) & 0xFFFFFFFFFFFFFFFF)
                    ^ (int(sb) & 0xFFFFFFFFFFFFFFFF)
                ).count("1")
                if ham <= max_hamming:
                    out[key] = ham
        if not out:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        items = sorted(out.items())
        return pd.DataFrame(
            {
                "doc_a": [k[0] for k, _ in items],
                "doc_b": [k[1] for k, _ in items],
                "hamming": [v for _, v in items],
            }
        )

    def dedupe_pairs(batch):  # cross-bucket duplicates (hamming equal)
        return batch.drop_duplicates(subset=["doc_a", "doc_b"])

    bands = ds.map_batches(to_bands, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow"
    )
    cand = bands.groupby("bucket").map_groups(pairs, batch_format="pandas")
    return cand.repartition(1).map_batches(dedupe_pairs, batch_format="pandas")
