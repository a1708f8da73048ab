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
