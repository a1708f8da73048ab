"""Mergeable sketches: HyperLogLog, Count-Min, Bloom.

``distinct_users_per_type`` computes exact distinct counts with a
two-stage groupby — the right answer when the distinct pairs fit the
shuffle. At 10^12 rows the (key, user) pair stream itself is the
bottleneck; the sketch path keeps per-(key, batch) state at a fixed
2^p registers, merges by element-wise max (associative, so Ray's
groupby aggregate applies), and estimates with the standard HLL
bias-corrected harmonic mean. Deterministic: the hash is pandas'
fixed-key siphash (vectorized, PYTHONHASHSEED-independent), no seeds,
no RNG.

The ``*_md5_*`` / ``cms_*`` / ``bloom_*`` family below trades the
siphash kernel for md5 — slower per value, but stable across
LANGUAGES AND ENGINES, so every register / counter / bit is
bit-for-bit replayable by the DuckDB oracle (md5 + integer div/mod +
``bin()`` leading-zero counts + HUGEINT power sums). That makes the
sketches exact-value-verifiable at the gate, not merely
accuracy-pinned in tests: the sketch CONTENT is the contract, and the
estimates are pure integer arithmetic (milli-units) on top of it.
Shuffle volume is the usual sketch win: registers/counters per
(key, batch), never the value stream.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = [
    "hll_distinct_per_key",
    "hll_estimate",
    "sampled_quantiles",
    "hll_md5_registers",
    "hll_md5_estimate",
    "cms_register_table",
    "cms_topk_report",
    "bloom_membership_report",
]

_P = 12           # 2^12 = 4096 registers, ~1.6% standard error
_M = 1 << _P


def _hash64(values) -> np.ndarray:
    """Vectorized deterministic 64-bit hash (pandas' siphash kernel —
    C speed, PYTHONHASHSEED-independent, stable across processes).
    Replaces a per-value hashlib.md5 Python loop; HLL only needs
    uniform bits, not a cryptographic digest."""
    import pandas as pd

    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "US":
        arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def _registers(values) -> np.ndarray:
    """HLL register array for a batch of values."""
    h = _hash64(values)
    idx = (h & np.uint64(_M - 1)).astype(np.int64)
    rest = h >> np.uint64(_P)
    # rank = number of leading zeros of the remaining 52 bits + 1,
    # computed as position of the lowest set bit from the top
    ranks = np.full(len(h), 64 - _P + 1, dtype=np.int64)
    nz = rest != 0
    # floor(log2(rest)) via float conversion is exact for < 2^52
    ranks[nz] = (64 - _P) - np.floor(np.log2(rest[nz].astype(np.float64))).astype(
        np.int64
    )
    regs = np.zeros(_M, dtype=np.int8)
    np.maximum.at(regs, idx, ranks.astype(np.int8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate (with small-range correction)."""
    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct_per_key(
    ds: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "user_id",
) -> ray.data.Dataset:
    """Approximate count(distinct value) per key via mergeable HLL.

    Per batch: one register array per key (bytes, fixed size). Shuffle
    carries (key, 4 KiB sketch) per batch — independent of the number
    of distinct values. Merge = element-wise max inside a per-key
    group. Output: (key, approx_distinct).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {key_col: batch[key_col].to_pylist(), "v": batch[value_col].to_pylist()}
        )
        keys, blobs = [], []
        for key, sub in df.groupby(key_col):
            keys.append(key)
            blobs.append(_registers(sub["v"].tolist()).tobytes())
        return pa.table(
            {key_col: pa.array(keys), "regs": pa.array(blobs, pa.binary())}
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(_M, dtype=np.int8)
        for blob in group["regs"]:
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.int8))
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                "approx_distinct": [int(round(hll_estimate(regs)))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
    )


def sampled_quantiles(
    ds: ray.data.Dataset,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    qs: tuple = (0.5, 0.9),
    pct: int = 10,
    salt: str = "",
) -> ray.data.Dataset:
    """Approximate per-group quantiles from a deterministic hash sample.

    The scale path for UNBOUNDED-cardinality values, where
    ``exact_quantiles``' value-histogram exchange grows with the number
    of distinct values: sample ~``pct``% of rows by id hash (pure
    per-row predicate, shuffle-free, reproducible across runs/engines —
    ``sampling.hash_sample``), then run the exact histogram quantiles
    on the sample. Error is the usual order-statistic sampling bound
    (~1/sqrt(pct% * n) quantile deviation), while the exchange carries
    only the SAMPLE's value cardinality.

    Because membership is (salt, id)-pure — never RNG or order — the
    result is bit-deterministic, so the driver oracle can replay the
    identical sample in SQL and match exactly; accuracy vs the full
    data is pinned separately in tests.
    """
    from .relational import exact_quantiles
    from .sampling import hash_sample

    sample = hash_sample(ds, pct=pct, id_col=id_col, salt=salt)
    return exact_quantiles(
        sample, value_col=value_col, group_col=group_col, qs=qs
    )


# ------------------------------------------------------------------
# Cross-engine-exact sketch family (md5-hashed, oracle-replayable)
# ------------------------------------------------------------------

import hashlib


def _md5_u64(s: str) -> int:
    """First 64 bits of md5(s) as an unsigned int — replayed in SQL as
    ``('0x' || substring(md5(s), 1, 16))::UBIGINT``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def _md5_u32(s: str) -> int:
    """First 32 bits of md5(s) — SQL: ``('0x' || substring(md5(s), 1,
    8))::UBIGINT`` (the idiom every salted-order oracle here uses)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def hll_md5_registers(
    ds: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
) -> ray.data.Dataset:
    """HLL register table per key, md5-hashed so the DuckDB oracle can
    rebuild every register exactly.

    h = first 64 md5 bits of str(value); bucket = h % 2^p (low p
    bits); rest = h // 2^p; register = max over values of
    rank = (64-p+1) - bit_length(rest)  (bit_length(0) == 0, so an
    all-zero rest scores the full 64-p+1). SQL replays bit_length as
    ``length(bin(rest))`` — DuckDB's ``bin()`` prints no leading
    zeros, so the two engines agree bit-for-bit.

    Distributed shape: per-batch dict max collapses each batch to at
    most (keys-in-batch × 2^p) rows; the exchange then carries
    registers, never values. Output: (key, bucket, register) for every
    bucket hit by at least one value — empty buckets are implicit
    (register 0), exactly as the oracle's GROUP BY sees them.
    """
    from ray.data.aggregate import Max

    m = 1 << p
    kmax = 64 - p + 1

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        vals = batch[value_col].to_pylist()
        # md5 once per DISTINCT value in the batch (values repeat
        # heavily in event streams), not once per row
        cache: dict[str, tuple[int, int]] = {}
        best: dict[tuple, int] = {}
        for k, v in zip(keys, vals):
            s = str(v)
            br = cache.get(s)
            if br is None:
                h = _md5_u64(s)
                br = (h % m, kmax - (h >> p).bit_length())
                cache[s] = br
            kk = (k, br[0])
            if best.get(kk, 0) < br[1]:
                best[kk] = br[1]
        if not best:
            return pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        ks, bs = zip(*best.keys())
        return pa.table(
            {
                key_col: pa.array(list(ks), pa.string()),
                "bucket": pa.array(list(bs), pa.int64()),
                "rank": pa.array(list(best.values()), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "bucket"])
        .aggregate(Max("rank", alias_name="register"))
    )


def hll_md5_estimate(
    ds: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
) -> ray.data.Dataset:
    """Per-key HLL summary in EXACT integer arithmetic.

    raw_est = alpha_m * m^2 / sum_j 2^(-M_j) with alpha_m =
    0.7213/(1 + 1.079/m) (Flajolet et al.'s large-m constant). Scale
    the harmonic sum by 2^K (K = 64-p+1, the max register): S =
    sum(2^(K - M_j)) over all m buckets (empty buckets contribute
    2^K), a bounded big integer, and

        raw_est_milli = (1000 * 7213*m * m^2 * 2^K)
                        // ((10000*m + 10790) * S)

    — pure integer ops on both engines (Python bigint / DuckDB
    HUGEINT), so the gate hashes match exactly. ``est_milli`` is the
    standard HLL final estimate: linear counting
    floor(1000 * m * ln(m / V)) when raw <= 2.5m and V = m - regs_hit
    empty buckets exist, else the raw estimate. The ln() branch is
    float, but its input domain is exactly the 2^p possible V values —
    exhaustively verified bit-identical between Python's libm and
    DuckDB's on this image (see tests), so it still gates exact.
    """
    import math
    m = 1 << p
    kmax = 64 - p + 1
    num = 1000 * 7213 * m * m * m * (1 << kmax)
    den_a = 10000 * m + 10790

    regs = hll_md5_registers(ds, key_col, value_col, p=p)

    def summarize(group: pd.DataFrame) -> pd.DataFrame:
        s = int(
            sum(1 << (kmax - int(r)) for r in group["register"])
            + (m - len(group)) * (1 << kmax)
        )
        raw = num // (den_a * s)
        empty = m - len(group)
        if empty > 0 and raw <= 2500 * m:
            est = math.floor(1000.0 * float(m) * math.log(float(m) / empty))
        else:
            est = raw
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                "regs_hit": [len(group)],
                "raw_est_milli": [raw],
                "est_milli": [est],
            }
        )

    return regs.groupby(key_col).map_groups(summarize, batch_format="pandas")


def cms_register_table(
    ds: ray.data.Dataset,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
) -> ray.data.Dataset:
    """Count-Min sketch over the corpus word stream (depth × width
    integer counters), md5-row-salted so the oracle rebuilds every
    counter exactly.

    Tokenization is the repo-wide ``[a-z0-9]+`` over lower(text)
    (word_topk's contract). Row r hashes word w to bucket
    md5(w + '#' + r)[:32 bits] % width; counter = total occurrences
    landing there. Per batch the token stream collapses to one row per
    (r, bucket) — at most depth×width rows — before the exchange, so
    shuffle volume is sketch-sized, not corpus-sized. Counters are
    exact integers: CMS point queries (min over rows) are then
    deterministic overestimates of true frequency.
    """
    import re
    from collections import Counter

    from ray.data.aggregate import Sum

    word_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch[text_col].to_pylist():
            counts.update(word_re.findall((t or "").lower()))
        cells: Counter = Counter()
        for w, n in counts.items():
            for r in range(depth):
                cells[(r, _md5_u32(f"{w}#{r}") % width)] += n
        rows = list(cells.items())
        return pa.table(
            {
                "r": pa.array([k[0] for k, _ in rows], pa.int64()),
                "bucket": pa.array([k[1] for k, _ in rows], pa.int64()),
                "cnt": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r", "bucket"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_topk_report(
    ds: ray.data.Dataset,
    k: int = 20,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
) -> pa.Table:
    """Exact global top-k words annotated with their Count-Min
    estimate: (word, n_exact, n_cms), n_cms = min over sketch rows of
    the counter each row maps the word to. n_cms >= n_exact always
    (CMS never undercounts); equality shows collision-free cells. One
    corpus pass builds the sketch, one builds the exact top-k
    (word_topk's pre-aggregated vocabulary exchange); the join is
    k-bounded on the driver. Sketch is depth×width rows — bounded —
    so the driver-side to_pandas() is constant-size by construction.
    """
    from .textstats import word_topk

    regs = cms_register_table(ds, text_col=text_col, depth=depth, width=width)
    # bounded: depth*width rows (<= a few thousand), never corpus-sized
    grid = regs.to_pandas()
    lut = {
        (int(r), int(b)): int(c)
        for r, b, c in zip(grid["r"], grid["bucket"], grid["cnt"])
    }
    top = word_topk(ds, k=k, text_col=text_col).to_pandas()  # k rows
    est = [
        min(lut[(r, _md5_u32(f"{w}#{r}") % width)] for r in range(depth))
        for w in top["word"]
    ]
    return pa.table(
        {
            "word": pa.array(list(top["word"]), pa.string()),
            "n_exact": pa.array([int(x) for x in top["n"]], pa.int64()),
            "n_cms": pa.array(est, pa.int64()),
        }
    )


def bloom_membership_report(
    members: ray.data.Dataset,
    probes: ray.data.Dataset,
    member_col: str = "v",
    probe_col: str = "v",
    id_col: str = "doc_id",
    truth_col: str = "truth",
    k: int = 5,
    bits_p: int = 16,
) -> ray.data.Dataset:
    """Build a Bloom filter over ``members`` and test every probe:
    output (id, truth, bloom_hit) with bloom_hit = all k bit positions
    set. Bit i of value v is md5(v + '#' + i)[:32 bits] % 2^bits_p —
    fully oracle-replayable, so false positives are DETERMINISTIC and
    the gate hashes the exact hit pattern, not a tolerance.

    Distributed shape: per-batch distinct-bit collapse (each batch
    emits at most 2^bits_p rows), one bounded unique() to the driver
    (<= 2^bits_p ints — the filter itself, 8 KiB as a bitmap), then
    one ray.put broadcast and a shuffle-free probe pass. This is the
    seen-set pattern for crawl frontiers: the filter is the only
    state that moves.
    """
    mbits = 1 << bits_p

    def member_bits(batch: pa.Table) -> pa.Table:
        out: set[int] = set()
        for v in batch[member_col].to_pylist():
            for i in range(k):
                out.add(_md5_u32(f"{v}#{i}") % mbits)
        return pa.table({"bit": pa.array(sorted(out), pa.int64())})

    bit_rows = members.map_batches(member_bits, batch_format="pyarrow")
    # bounded: <= 2^bits_p distinct bit indices (the filter itself)
    bits = np.zeros(mbits, dtype=bool)
    bits[[int(b) for b in bit_rows.unique("bit")]] = True
    bits_ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bits_ref)
        hits = []
        for v in batch[probe_col].to_pylist():
            hits.append(
                int(all(bm[_md5_u32(f"{v}#{i}") % mbits] for i in range(k)))
            )
        return pa.table(
            {
                id_col: batch[id_col],
                truth_col: batch[truth_col],
                "bloom_hit": pa.array(hits, pa.int64()),
            }
        )

    return probes.map_batches(probe, batch_format="pyarrow")
