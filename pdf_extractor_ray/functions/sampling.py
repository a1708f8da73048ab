"""Deterministic sampling operators.

The reference has no sampling anywhere (SURVEY.md §2.6); a 100 TB
training-data pipeline needs it constantly (dev subsets, ablations,
holdouts). The primitive here is HASH sampling — membership depends only
on (salt, id), never on row order, partitioning, or a RNG stream — so a
sample is reproducible across runs, machines, and engines, and the SQL
oracle can compute the exact same subset:

    keep(id)  <=>  int(md5(salt || id)[:8], 16) % 100 < pct

Hash membership is also the correct distributed shape: a pure per-row
predicate inside ``map_batches`` (embarrassingly parallel, no shuffle),
unlike reservoir or sorted sampling which need coordination.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

__all__ = [
    "hash_keep_mask",
    "hash_sample",
    "stratified_sample",
    "shuffle_shards",
    "weighted_sample",
    "domain_holdout_split",
]


def hash_keep_mask(ids, pct: int, salt: str = "") -> list[bool]:
    """Deterministic membership for each id: md5-bucket % 100 < pct."""
    out = []
    for i in ids:
        h = hashlib.md5(f"{salt}{i}".encode("utf-8")).hexdigest()
        out.append(int(h[:8], 16) % 100 < pct)
    return out


def hash_sample(
    ds: ray.data.Dataset,
    pct: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> ray.data.Dataset:
    """Keep ~pct% of rows by id hash (deterministic, shuffle-free)."""

    def keep(batch: pa.Table) -> pa.Table:
        mask = hash_keep_mask(batch[id_col].to_pylist(), pct, salt)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    rates: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "",
) -> ray.data.Dataset:
    """Per-stratum hash sampling: keep ~``rates[stratum]``% of each
    stratum's rows (the language-rebalancing step of a training-data
    mix). Same deterministic per-row predicate as ``hash_sample`` —
    membership is (salt, id)-pure, so the mix is reproducible and
    SQL-checkable; strata not in ``rates`` keep ``default_pct``%.
    Shuffle-free: one vectorized filter per batch."""

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        mask = [
            int(
                hashlib.md5(f"{salt}{i}".encode("utf-8")).hexdigest()[:8], 16
            ) % 100
            < rates.get(s, default_pct)
            for i, s in zip(ids, strata)
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def shuffle_shards(
    ds: ray.data.Dataset,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> ray.data.Dataset:
    """Deterministic training shuffle + sharding: every row gets
    (shard, pos) such that reading shards in order, each sorted by
    pos, replays a fixed md5 permutation of the corpus.

    shard = md5(salt||id) low-64 % n_shards (uniform regardless of id
    skew); pos = the row's rank within its shard by (salt_hex, id).
    Both are (salt, id)-pure — re-running on a re-partitioned input
    gives byte-identical shard assignments, which is what makes the
    export resumable (a finished shard never changes).

    Exchange shape: ONE groupby on the shard key (shards are the
    natural output partitions, corpus/n_shards rows each); the
    in-shard rank is a vectorized argsort. SQL replay: row_number()
    OVER (PARTITION BY shard ORDER BY salt_hex, id).
    """

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hexes = [
            hashlib.md5(f"{salt}{i}".encode("utf-8")).hexdigest()
            for i in ids
        ]
        shards = [
            int.from_bytes(bytes.fromhex(h[16:32]), "little") % n_shards
            for h in hexes
        ]
        batch = batch.append_column("salt_hex", pa.array(hexes, pa.string()))
        return batch.append_column(
            "shard", pa.array(shards, pa.int64())
        )

    def rank(group):  # one whole shard
        g = group.sort_values(["salt_hex", id_col]).reset_index(drop=True)
        g["pos"] = g.index.astype("int64")
        return g

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )


def weighted_sample(
    ds: ray.data.Dataset,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    salt: str = "",
    n_cell_bits: int = 16,
) -> ray.data.Dataset:
    """Exact deterministic weighted sampling without replacement: the
    ``k`` rows with the smallest integer priority

        priority(id, w) = u // max(w, 1),
        u = int(md5(salt || id)[:15], 16)          (60 uniform bits)

    — Duffield–Lund–Thorup priority sampling with an integer key, so
    higher weight -> smaller priority -> more likely selected, and a
    SQL oracle computes the identical subset. Membership depends only
    on (salt, id, w): reproducible across runs, partitionings and
    engines, like every sampler in this module. Ties (60-bit
    collisions) break by (md5 hex ASC, id ASC).

    Distributed shape — the histogram+boundary pattern of
    ``select_top_k_global``, adapted to a near-unique score domain:
    priorities are bucketed by their top ``n_cell_bits`` bits (the
    driver sees <= 2^n_cell_bits counts, never the priorities), the
    one boundary cell's members come back for an exact in-cell rank
    (expected corpus_fraction ~ w_max / 2^n_cell_bits — small-cell
    skew concentrates HIGH-weight rows, which is exactly the region
    the top-k lives in), and a final pure filter streams the winners.
    Input is consumed three times -> materialized once here.
    Output: the input rows plus an int64 ``priority`` column.
    """
    if k <= 0:
        return ds.filter(lambda row: False)
    ds = ds.materialize()
    shift = 60 - n_cell_bits

    def prio(ids, weights):
        hexes = [
            hashlib.md5(f"{salt}{i}".encode("utf-8")).hexdigest()
            for i in ids
        ]
        pr = [
            int(h[:15], 16) // max(int(w), 1)
            for h, w in zip(hexes, weights)
        ]
        return hexes, pr

    def cells(batch: pa.Table) -> pa.Table:
        _, pr = prio(
            batch[id_col].to_pylist(), batch[weight_col].to_pylist()
        )
        from collections import Counter

        c = Counter(p >> shift for p in pr)
        return pa.table(
            {
                "cell": pa.array(list(c.keys()), pa.int64()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .sum("cnt")
        .to_pandas()  # bounded: <= 2^n_cell_bits rows
        .sort_values("cell")
        .reset_index(drop=True)
    )
    cum = hist["sum(cnt)"].cumsum()
    total = int(cum.iloc[-1]) if len(cum) else 0
    if k >= total:
        out = ds
        boundary = None
    else:
        b = int((cum.to_numpy() >= k).argmax())
        b_cell = int(hist.loc[b, "cell"])
        need = k - (int(cum.iloc[b - 1]) if b > 0 else 0)

        if need == 0:
            boundary = (b_cell, None)
        else:
            def in_cell(batch: pa.Table) -> pa.Table:
                ids = batch[id_col].to_pylist()
                hexes, pr = prio(ids, batch[weight_col].to_pylist())
                rows = [
                    (p, h, i)
                    for p, h, i in zip(pr, hexes, ids)
                    if p >> shift == b_cell
                ]
                return pa.table(
                    {
                        "p": pa.array([r[0] for r in rows], pa.int64()),
                        "h": pa.array([r[1] for r in rows], pa.string()),
                        "i": pa.array([str(r[2]) for r in rows]),
                    }
                )

            members = (
                ds.map_batches(in_cell, batch_format="pyarrow")
                .to_pandas()  # one cell's members
                .sort_values(["p", "h", "i"])
                .reset_index(drop=True)
            )
            row = members.iloc[need - 1]
            boundary = (b_cell, (int(row["p"]), str(row["h"]), str(row["i"])))
        out = None

    if boundary is not None:
        b_cell, cutoff = boundary

        def keep(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            hexes, pr = prio(ids, batch[weight_col].to_pylist())
            sel = []
            for j, (p, h, i) in enumerate(zip(pr, hexes, ids)):
                c = p >> shift
                if c < b_cell or (
                    c == b_cell
                    and cutoff is not None
                    and (p, h, str(i)) <= cutoff
                ):
                    sel.append(j)
            t = batch.take(sel)
            _, pr_sel = prio(
                t[id_col].to_pylist(), t[weight_col].to_pylist()
            )
            return t.append_column(
                "priority", pa.array(pr_sel, pa.int64())
            )

        return ds.map_batches(keep, batch_format="pyarrow")

    def tag_all(batch: pa.Table) -> pa.Table:
        _, pr = prio(
            batch[id_col].to_pylist(), batch[weight_col].to_pylist()
        )
        return batch.append_column("priority", pa.array(pr, pa.int64()))

    return out.map_batches(tag_all, batch_format="pyarrow")


def domain_holdout_split(
    ds: ray.data.Dataset,
    key_col: str = "host",
    thresholds: tuple[int, int] = (900, 950),
    salt: str = "",
) -> ray.data.Dataset:
    """Leakage-safe train/val/test assignment at the GROUP level.

    Every row sharing ``key_col`` (registrable domain / host / source
    site) lands in the same split — the property a per-row hash split
    (:func:`hash_sample`) cannot give: near-duplicate pages from one
    site must never straddle train and eval, or the eval set leaks.
    Assignment is the repo's standard engine-replayable hash rule,

        permille(key) = int(md5(salt || key)[:8], 16) % 1000
        split = train if < thresholds[0] else val if < thresholds[1]
                else test

    so membership depends only on (salt, key): reproducible across
    runs, engines, and cluster sizes, and a new crawl dump routes every
    known domain to its old split automatically. Pure per-row map —
    no shuffle, no coordination, embarrassingly parallel at 100 TB.
    """
    lo, hi = thresholds

    def assign(batch: pa.Table) -> pa.Table:
        splits = []
        for k in batch[key_col].to_pylist():
            p = int(
                hashlib.md5(f"{salt}{k}".encode("utf-8")).hexdigest()[:8], 16
            ) % 1000
            splits.append("train" if p < lo else "val" if p < hi else "test")
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
