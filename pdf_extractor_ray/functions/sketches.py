"""Mergeable cardinality sketches (HyperLogLog).

``distinct_users_per_type`` computes exact distinct counts with a
two-stage groupby — the right answer when the distinct pairs fit the
shuffle. At 10^12 rows the (key, user) pair stream itself is the
bottleneck; the sketch path keeps per-(key, batch) state at a fixed
2^p registers, merges by element-wise max (associative, so Ray's
groupby aggregate applies), and estimates with the standard HLL
bias-corrected harmonic mean. Deterministic: the hash is pandas'
fixed-key siphash (vectorized, PYTHONHASHSEED-independent), no seeds,
no RNG.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = ["hll_distinct_per_key", "hll_estimate", "sampled_quantiles"]

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
