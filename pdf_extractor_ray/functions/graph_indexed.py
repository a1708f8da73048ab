"""Actor-sharded adjacency index for iterative graph traversal.

``bfs_hops`` (graph.py) is pure Dataset algebra: correct, but every
BFS level re-exchanges the FULL edge set (frontier UNION edges ->
groupby bucket). A 30-level closure pays ~30 full-edge shuffles — the
one place in this repo where the Dataset API genuinely cannot express
the semantics we need: a *partition-pinned, reusable* adjacency index.
This module drops to raw Ray actors exactly for that (the documented
last-resort case): shard the edges ONCE (one exchange), pin each
shard's CSR adjacency in an actor, then each BFS level moves only
frontier node arrays by ObjectRef — zero edge movement, zero driver
data.

Sharding contract: node u is OWNED by shard ``abs(u) % n_shards``.
- build: one ``groupby(shard)`` exchange; the group task pushes its
  edge block into the owning actor (``ray.get`` on the push makes the
  barrier explicit — when the build dataset is consumed, every edge
  is indexed).
- expand(level): each actor intersects the frontier with its owned
  nodes and reads neighbors off its CSR — returns (count, dst-array).
- visit(level): each actor filters candidates to its owned nodes,
  anti-joins against its *local* visited set (the mutable state that
  justifies the actor), records hop = level, returns (count, new).
- The driver only ever ``ray.get``s the counts; node arrays travel
  actor-to-actor through the object store.

At cluster scale each actor fetches each candidate array once per
level (S refs to S actors); the further refinement — expand returning
owner-partitioned arrays so each actor fetches only its slice — is a
num_returns change, noted here, not needed at this fan-out.

Results come back as ``ray.data.from_arrow_refs`` over per-shard
(node, hops) tables — the driver owns those refs (caller-owned task
returns), so the actors can be killed before the dataset is consumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


__all__ = [
    "bfs_hops_indexed",
    "scc_members_indexed",
    "pagerank_indexed",
    "connected_components_indexed",
    "hits_indexed",
    "sssp_indexed",
    "triangle_count_indexed",
    "k_core_indexed",
    "random_walks_indexed",
    "lpa_communities_indexed",
    "mis_indexed",
]


@ray.remote
class _GraphShard:
    """Holds the CSR adjacency and visited set for its owned nodes."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self.sid = shard_id
        self.n = n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self._keys: np.ndarray | None = None  # unique sorted src
        self._starts: np.ndarray | None = None
        self._dst: np.ndarray | None = None
        self._visited: np.ndarray = np.empty(0, np.int64)  # sorted
        self._hops: list[tuple[int, np.ndarray]] = []

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def finalize(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts
            else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts
            else np.empty(0, np.int64)
        )
        self._src_parts, self._dst_parts = [], []
        order = np.argsort(src, kind="stable")
        src, self._dst = src[order], dst[order]
        self._keys, counts = np.unique(src, return_counts=True)
        self._starts = np.concatenate(([0], np.cumsum(counts)))
        return len(src)

    def _mine(self, nodes: np.ndarray) -> np.ndarray:
        return nodes[np.abs(nodes) % self.n == self.sid]

    def seed(self, nodes: np.ndarray) -> tuple[int, np.ndarray]:
        mine = np.unique(self._mine(np.asarray(nodes, np.int64)))
        self._visited = mine
        self._hops = [(0, mine)]
        return len(mine), mine

    def expand(self, *frontiers: np.ndarray) -> tuple[int, np.ndarray]:
        nodes = (
            np.concatenate([np.asarray(f, np.int64) for f in frontiers])
            if frontiers
            else np.empty(0, np.int64)
        )
        mine = np.unique(self._mine(nodes))
        if self._keys is None or not len(self._keys) or not len(mine):
            return 0, np.empty(0, np.int64)
        idx = np.clip(np.searchsorted(self._keys, mine), 0, len(self._keys) - 1)
        hit = mine[self._keys[idx] == mine]
        if not len(hit):
            return 0, np.empty(0, np.int64)
        pos = np.searchsorted(self._keys, hit)
        spans = [
            self._dst[self._starts[p] : self._starts[p + 1]] for p in pos
        ]
        out = np.unique(np.concatenate(spans)) if spans else np.empty(0, np.int64)
        return len(out), out

    def visit(self, level: int, *cands: np.ndarray) -> tuple[int, np.ndarray]:
        nodes = (
            np.concatenate([np.asarray(c, np.int64) for c in cands])
            if cands
            else np.empty(0, np.int64)
        )
        mine = np.unique(self._mine(nodes))
        new = mine[
            ~np.isin(mine, self._visited, assume_unique=False)
        ]
        if len(new):
            self._visited = np.union1d(self._visited, new)
            self._hops.append((level, new))
        return len(new), new

    def visited_table(self) -> pa.Table:
        if not self._hops:
            return pa.table(
                {"node": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())}
            )
        nodes = np.concatenate([n for _, n in self._hops])
        hops = np.concatenate(
            [np.full(len(n), lvl, np.int64) for lvl, n in self._hops]
        )
        return pa.table({"node": nodes, "hops": hops})


@ray.remote
class _CCShard:
    """Symmetrized CSR adjacency + min-label vector for owned nodes.
    Hash-min label propagation with everything src-side local: each
    round emits per-dst MIN partials (pre-folded before they travel)
    and folds incoming mins for its own nodes."""

    def __init__(self, shard_id: int, n_shards: int):
        self.sid, self.n = shard_id, n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self._keys = self._counts = self._starts = self._dst = None
        self._labels = None

    def add_edges(self, src, dst) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def finalize(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts else np.empty(0, np.int64)
        )
        self._src_parts = self._dst_parts = []
        order = np.argsort(src, kind="stable")
        src, self._dst = src[order], dst[order]
        self._keys, counts = np.unique(src, return_counts=True)
        self._starts = np.concatenate(([0], np.cumsum(counts)))
        # round-0 fused init: label(v) = min(v, neighbors(v)) — the
        # whole neighborhood is local (symmetrized edges, src-owned)
        if len(self._keys):
            self._labels = np.minimum(
                self._keys,
                np.minimum.reduceat(self._dst, self._starts[:-1]),
            )
        else:
            self._labels = np.empty(0, np.int64)
        return len(src)

    def messages(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-dst MIN of this shard's current src labels — pre-folded
        so the exchange volume is bounded by distinct dst, not edges."""
        if self._keys is None or not len(self._keys):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        edge_labels = np.repeat(
            self._labels, np.diff(self._starts)
        )
        uniq, inv = np.unique(self._dst, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, edge_labels)
        return uniq, mins

    def fold(self, *msg_pairs) -> int:
        """Fold incoming mins into owned labels; returns the local
        label sum (the convergence scalar — labels only decrease)."""
        for dsts, mins in msg_pairs:
            if not len(dsts) or not len(self._keys):
                continue
            m = np.abs(dsts) % self.n == self.sid
            dsts, mins = dsts[m], mins[m]
            idx = np.clip(
                np.searchsorted(self._keys, dsts), 0, len(self._keys) - 1
            )
            ok = self._keys[idx] == dsts
            np.minimum.at(self._labels, idx[ok], mins[ok])
        return int(self._labels.sum())

    def labels_table(self) -> pa.Table:
        return pa.table(
            {"doc_id": self._keys, "cluster_id": self._labels}
        )


def connected_components_indexed(
    pairs: ray.data.Dataset,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 30,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Drop-in equivalent of ``graph.connected_components`` (hash-min
    label propagation, cluster_id = min member id, covers every node
    in an edge) on the shard index: the symmetrized edge list is
    exchanged ONCE into shard-actor CSRs; each round ships only
    per-dst min-label partials and one int per shard for the
    convergence check. The cogroup engine re-exchanges the edge set
    every round."""
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    shards = [_CCShard.remote(i, n_shards) for i in range(n_shards)]

    def make_xy(batch: pa.Table):
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return np.concatenate([a, b]), np.concatenate([b, a])

    n_edges = _direct_push(pairs, make_xy, shards, "add_edges")
    if n_edges == 0:
        for s in shards:
            ray.kill(s)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )
    ray.get([s.finalize.remote() for s in shards])

    prev = None
    for _ in range(max_iters):
        msg_refs = [s.messages.remote() for s in shards]
        sums = ray.get([s.fold.remote(*msg_refs) for s in shards])
        total = sum(sums)
        if total == prev:  # labels only decrease: fixpoint
            break
        prev = total

    out = ray.data.from_arrow_refs(
        [s.labels_table.remote() for s in shards]
    ).materialize()
    for s in shards:
        ray.kill(s)
    return out


@ray.remote
class _PageRankShard:
    """CSR adjacency + rank vector for the owned src nodes. Integer
    semantics identical to ``graph.pagerank`` (micro-units, floor
    division, rank-0 default for srcs outside the node universe,
    dsts outside the universe dropped)."""

    def __init__(
        self,
        shard_id: int,
        n_shards: int,
        base: int,
        d: int,
        personalized: bool = False,
    ):
        self.sid, self.n, self.base, self.d = shard_id, n_shards, base, d
        self.personalized = personalized
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self._node_parts: list[np.ndarray] = []
        self._seed_parts: list[np.ndarray] = []
        self._keys = self._counts = self._starts = self._dst = None
        self._nodes = self._ranks = self._base_vec = None

    def add_edges(self, src, dst) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def add_nodes(self, nodes) -> int:
        self._node_parts.append(np.asarray(nodes, np.int64))
        return len(nodes)

    def add_seeds(self, nodes) -> int:
        self._seed_parts.append(np.asarray(nodes, np.int64))
        return len(nodes)

    def finalize(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts else np.empty(0, np.int64)
        )
        self._src_parts = self._dst_parts = []
        order = np.argsort(src, kind="stable")
        src, self._dst = src[order], dst[order]
        self._keys, self._counts = np.unique(src, return_counts=True)
        self._starts = np.concatenate(([0], np.cumsum(self._counts)))
        self._nodes = (
            np.unique(np.concatenate(self._node_parts))
            if self._node_parts else np.empty(0, np.int64)
        )
        self._node_parts = []
        if self.personalized:
            seeds = (
                np.unique(np.concatenate(self._seed_parts))
                if self._seed_parts else np.empty(0, np.int64)
            )
            mask = np.isin(self._nodes, seeds)
            self._base_vec = np.where(mask, self.base, 0).astype(np.int64)
            self._ranks = np.where(mask, 1_000_000, 0).astype(np.int64)
        else:
            self._base_vec = np.full(len(self._nodes), self.base, np.int64)
            self._ranks = np.full(len(self._nodes), 1_000_000, np.int64)
        self._seed_parts = []
        return len(src)

    def contribs(self) -> tuple[np.ndarray, np.ndarray]:
        """(dst, contribution) partial sums from this shard's srcs —
        everything local: adjacency, outdeg and ranks co-reside."""
        if self._keys is None or not len(self._keys):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if len(self._nodes):
            idx = np.clip(
                np.searchsorted(self._nodes, self._keys),
                0, len(self._nodes) - 1,
            )
            known = self._nodes[idx] == self._keys
            r = np.where(known, self._ranks[idx], 0)  # unknown src -> 0
        else:
            r = np.zeros(len(self._keys), np.int64)
        per_src = r // self._counts
        edge_vals = np.repeat(per_src, self._counts)
        uniq, inv = np.unique(self._dst, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, edge_vals)
        return uniq, sums

    def apply(self, *contrib_pairs) -> int:
        """Damped update for the owned universe from ALL shards'
        contribution partials; runs after this shard's contribs() by
        actor-serial ordering, so no driver barrier is needed."""
        total = np.zeros(len(self._nodes), np.int64)
        for dsts, vals in contrib_pairs:
            if not len(dsts) or not len(self._nodes):
                continue
            m = np.abs(dsts) % self.n == self.sid
            dsts, vals = dsts[m], vals[m]
            idx = np.clip(
                np.searchsorted(self._nodes, dsts), 0, len(self._nodes) - 1
            )
            ok = self._nodes[idx] == dsts  # unknown dst drops
            np.add.at(total, idx[ok], vals[ok])
        self._ranks = self._base_vec + (self.d * total) // 100
        return len(self._nodes)

    def ranks_table(self) -> pa.Table:
        return pa.table({"doc_id": self._nodes, "rank_u": self._ranks})


def pagerank_indexed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    n_iters: int = 5,
    damping_pct: int = 85,
    id_col: str = "doc_id",
    n_shards: int | None = None,
    seeds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Drop-in equivalent of ``graph.pagerank`` on the shard index:
    adjacency, out-degrees AND ranks are co-located per shard, so an
    iteration exchanges only (dst, contribution) partial-sum arrays —
    the cogroup engine re-exchanges the edge set every iteration. The
    whole iteration chain is submitted without a single driver-side
    ``ray.get``: actor-serial ordering makes contribs(k) wait for
    apply(k-1) on each shard automatically.

    ``seeds`` (Dataset[node]) switches to PERSONALIZED PageRank: the
    teleport mass (base term and initial rank) lands only on the seed
    set, so scores measure proximity to the seeds — the
    topic-sensitive / TrustRank variant used for seed-relative crawl
    prioritization. Same integer semantics, same exchange shape."""
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    base = (100 - damping_pct) * 10_000
    shards = [
        _PageRankShard.remote(
            i, n_shards, base, damping_pct, personalized=seeds is not None
        )
        for i in range(n_shards)
    ]

    def make_xy(batch: pa.Table):
        return (
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    _direct_push(edges, make_xy, shards, "add_edges")

    def push_nodes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        refs = []
        for sid in range(n_shards):
            mine = ids[np.abs(ids) % n_shards == sid]
            if len(mine):
                refs.append(shards[sid].add_nodes.remote(mine))
        ray.get(refs)
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    nodes.map_batches(push_nodes, batch_format="pyarrow").count()
    if seeds is not None:
        def push_seeds(batch: pa.Table) -> pa.Table:
            ids = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            refs = [
                shards[sid].add_seeds.remote(
                    ids[np.abs(ids) % n_shards == sid]
                )
                for sid in range(n_shards)
            ]
            ray.get(refs)
            return pa.table({"n": pa.array([len(ids)], pa.int64())})

        seeds.map_batches(push_seeds, batch_format="pyarrow").count()
    ray.get([s.finalize.remote() for s in shards])

    apply_refs = []
    for _ in range(n_iters):
        contrib_refs = [s.contribs.remote() for s in shards]
        apply_refs.extend(s.apply.remote(*contrib_refs) for s in shards)
    # one barrier at the END (not per iteration): surfaces any actor
    # task error loudly — a swallowed failure would silently return
    # stale ranks otherwise
    ray.get(apply_refs)

    out = ray.data.from_arrow_refs(
        [s.ranks_table.remote() for s in shards]
    ).materialize()
    for s in shards:
        ray.kill(s)
    return out


_INF = np.int64(1) << 62


@ray.remote
class _SSSPShard:
    """Weighted CSR + distance vector for owned nodes. Bellman-Ford
    relaxation rounds: each round ships per-dst MIN(dist+w) partials
    (pre-folded), folds incoming mins locally, and reports whether
    anything improved (the convergence bit)."""

    def __init__(self, shard_id: int, n_shards: int):
        self.sid, self.n = shard_id, n_shards
        self._parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._keys = self._counts = self._dst = self._w = None
        self._nodes = self._dist = None

    def add_edges(self, src, dst, w) -> int:
        self._parts.append(
            (
                np.asarray(src, np.int64),
                np.asarray(dst, np.int64),
                np.asarray(w, np.int64),
            )
        )
        return len(src)

    def add_nodes(self, nodes) -> int:
        # endpoint registration: a node owned here may only appear as
        # the dst of edges held by OTHER shards — without this row its
        # folded distance would have nowhere to live
        self._node_parts = getattr(self, "_node_parts", [])
        self._node_parts.append(np.asarray(nodes, np.int64))
        return len(nodes)

    def finalize(self, seed: int) -> int:
        if self._parts:
            src = np.concatenate([p[0] for p in self._parts])
            dst = np.concatenate([p[1] for p in self._parts])
            w = np.concatenate([p[2] for p in self._parts])
        else:
            src = dst = w = np.empty(0, np.int64)
        self._parts = []
        order = np.argsort(src, kind="stable")
        src, self._dst, self._w = src[order], dst[order], w[order]
        self._keys, self._counts = np.unique(src, return_counts=True)
        registered = (
            [np.concatenate(self._node_parts)]
            if getattr(self, "_node_parts", None)
            else []
        )
        self._node_parts = []
        owned_dst = self._dst[np.abs(self._dst) % self.n == self.sid]
        self._nodes = np.unique(
            np.concatenate([self._keys, owned_dst] + registered)
        )
        self._dist = np.full(len(self._nodes), _INF, np.int64)
        if len(self._nodes) and abs(int(seed)) % self.n == self.sid:
            i = np.searchsorted(self._nodes, seed)
            if i < len(self._nodes) and self._nodes[i] == seed:
                self._dist[i] = 0
        return len(src)

    def relax_messages(self) -> tuple[np.ndarray, np.ndarray]:
        if not len(self._keys):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        idx = np.clip(
            np.searchsorted(self._nodes, self._keys), 0,
            max(len(self._nodes) - 1, 0),
        )
        d = np.where(
            self._nodes[idx] == self._keys, self._dist[idx], _INF
        ) if len(self._nodes) else np.full(len(self._keys), _INF)
        finite = d < _INF
        if not finite.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        edge_d = np.repeat(d, self._counts)
        em = edge_d < _INF
        cand = edge_d[em] + self._w[em]
        dsts = self._dst[em]
        uniq, inv = np.unique(dsts, return_inverse=True)
        mins = np.full(len(uniq), _INF, np.int64)
        np.minimum.at(mins, inv, cand)
        return uniq, mins

    def fold(self, *pairs) -> int:
        """Returns 1 if any owned distance improved this round."""
        changed = 0
        for keys, vals in pairs:
            if not len(keys) or not len(self._nodes):
                continue
            m = np.abs(keys) % self.n == self.sid
            keys, vals = keys[m], vals[m]
            idx = np.clip(
                np.searchsorted(self._nodes, keys), 0, len(self._nodes) - 1
            )
            ok = self._nodes[idx] == keys
            before = self._dist[idx[ok]]
            np.minimum.at(self._dist, idx[ok], vals[ok])
            if (self._dist[idx[ok]] < before).any():
                changed = 1
        return changed

    def dist_table(self) -> pa.Table:
        fin = self._dist < _INF
        return pa.table(
            {"node": self._nodes[fin], "dist": self._dist[fin]}
        )


def sssp_indexed(
    edges: ray.data.Dataset,
    seed: int,
    max_rounds: int = 8,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Single-source shortest paths (Bellman-Ford, ``max_rounds``
    relaxation rounds — paths of at most that many edges; early exit
    when a round improves nothing) on the shard index. Expects
    Dataset[src, dst, w] with int64 weights; returns Dataset[node,
    dist] for nodes reached within the round budget. One edge exchange
    total; each round ships pre-folded per-dst MIN(dist+w) partials
    plus one changed-bit per shard."""
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    shards = [_SSSPShard.remote(i, n_shards) for i in range(n_shards)]

    def push_batch(batch: pa.Table) -> pa.Table:
        """Direct push (see _direct_push): owner-partitioned slices
        straight into the shard actors, no sort exchange. Weighted
        edges go to the src owner; dst endpoints are registered with
        THEIR owners (a dst-only node must exist in its owner's
        universe for folds to land)."""
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        refs = []
        own = np.abs(src) % n_shards
        downs = np.abs(dst) % n_shards
        for sid in range(n_shards):
            m = own == sid
            if m.any():
                refs.append(
                    shards[sid].add_edges.remote(src[m], dst[m], w[m])
                )
            mine = dst[downs == sid]
            if len(mine):
                refs.append(shards[sid].add_nodes.remote(np.unique(mine)))
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    edges.map_batches(push_batch, batch_format="pyarrow").take_all()
    # the seed belongs in its owner's universe even if isolated
    # (the oracle's d0 row exists unconditionally)
    ray.get(
        shards[abs(int(seed)) % n_shards].add_nodes.remote(
            np.asarray([int(seed)], np.int64)
        )
    )
    ray.get([s.finalize.remote(int(seed)) for s in shards])

    for _ in range(max_rounds):
        msg_refs = [s.relax_messages.remote() for s in shards]
        changed = ray.get([s.fold.remote(*msg_refs) for s in shards])
        if not any(changed):
            break

    out = ray.data.from_arrow_refs(
        [s.dist_table.remote() for s in shards]
    ).materialize()
    for s in shards:
        ray.kill(s)
    return out


@ray.remote
class _HITSShard:
    """Both edge orientations + hub/auth vectors for owned nodes.
    Each HITS half-step is one partial-sum message round (the cogroup
    engine pays two edge-moving exchanges per half-step)."""

    def __init__(self, shard_id: int, n_shards: int, scale: int):
        self.sid, self.n, self.scale = shard_id, n_shards, scale
        self._o: list[tuple[np.ndarray, np.ndarray]] = []
        self._i: list[tuple[np.ndarray, np.ndarray]] = []
        self._node_parts: list[np.ndarray] = []
        self._ok = self._oc = self._od = None  # out-CSR (by src)
        self._ik = self._ic = self._is = None  # in-CSR (by dst)
        self._nodes = self._hub = self._auth = None
        self._araw = self._hraw = None

    def add_out(self, src, dst) -> int:
        self._o.append((np.asarray(src, np.int64), np.asarray(dst, np.int64)))
        return len(src)

    def add_in(self, dst, src) -> int:
        self._i.append((np.asarray(dst, np.int64), np.asarray(src, np.int64)))
        return len(dst)

    def add_nodes(self, nodes) -> int:
        self._node_parts.append(np.asarray(nodes, np.int64))
        return len(nodes)

    @staticmethod
    def _csr(parts):
        if parts:
            k = np.concatenate([p[0] for p in parts])
            v = np.concatenate([p[1] for p in parts])
        else:
            k = v = np.empty(0, np.int64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        keys, counts = np.unique(k, return_counts=True)
        return keys, counts, v

    def finalize(self) -> int:
        self._ok, self._oc, self._od = self._csr(self._o)
        self._ik, self._ic, self._is = self._csr(self._i)
        self._o = self._i = []
        self._nodes = (
            np.unique(np.concatenate(self._node_parts))
            if self._node_parts else np.empty(0, np.int64)
        )
        self._node_parts = []
        self._hub = np.full(len(self._nodes), self.scale, np.int64)
        self._auth = np.zeros(len(self._nodes), np.int64)
        return len(self._nodes)

    def _lookup(self, keys: np.ndarray, vec: np.ndarray) -> np.ndarray:
        """Value of ``vec`` (aligned to self._nodes) for ``keys``;
        0 for keys outside the node universe."""
        if not len(self._nodes) or not len(keys):
            return np.zeros(len(keys), np.int64)
        idx = np.clip(
            np.searchsorted(self._nodes, keys), 0, len(self._nodes) - 1
        )
        return np.where(self._nodes[idx] == keys, vec[idx], 0)

    @staticmethod
    def _per_key_sums(dst: np.ndarray, vals: np.ndarray):
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, vals)
        return uniq, sums

    def auth_partials(self) -> tuple[np.ndarray, np.ndarray]:
        """(dst, sum of hub(src)) partials from this shard's out-CSR."""
        if not len(self._ok):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        hub = self._lookup(self._ok, self._hub)
        return self._per_key_sums(self._od, np.repeat(hub, self._oc))

    def fold_araw(self, *pairs) -> int:
        """Fold incoming (dst, partial) into araw for owned universe
        nodes; returns the local max (driver computes the global)."""
        self._araw = self._fold(pairs)
        return int(self._araw.max()) if len(self._araw) else 0

    def normalize_auth(self, gmax: int) -> int:
        self._auth = self._normalize(self._araw, gmax)
        return 0

    def hub_partials(self) -> tuple[np.ndarray, np.ndarray]:
        """(src, sum of auth(dst)) partials from this shard's in-CSR."""
        if not len(self._ik):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        auth = self._lookup(self._ik, self._auth)
        return self._per_key_sums(self._is, np.repeat(auth, self._ic))

    def fold_hraw(self, *pairs) -> int:
        self._hraw = self._fold(pairs)
        return int(self._hraw.max()) if len(self._hraw) else 0

    def normalize_hub(self, gmax: int) -> int:
        self._hub = self._normalize(self._hraw, gmax)
        return 0

    def _fold(self, pairs) -> np.ndarray:
        total = np.zeros(len(self._nodes), np.int64)
        for keys, vals in pairs:
            if not len(keys) or not len(self._nodes):
                continue
            m = np.abs(keys) % self.n == self.sid
            keys, vals = keys[m], vals[m]
            idx = np.clip(
                np.searchsorted(self._nodes, keys), 0, len(self._nodes) - 1
            )
            ok = self._nodes[idx] == keys  # unknown ids drop
            np.add.at(total, idx[ok], vals[ok])
        return total

    def _normalize(self, raw: np.ndarray, gmax: int) -> np.ndarray:
        if gmax <= 0:
            return np.zeros(len(raw), np.int64)
        # Python-int multiply per node: raw * scale never wraps
        return np.fromiter(
            (int(r) * self.scale // gmax for r in raw), np.int64, len(raw)
        )

    def values_table(self) -> pa.Table:
        return pa.table(
            {"doc_id": self._nodes, "auth_u": self._auth, "hub_u": self._hub}
        )


def hits_indexed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    n_iters: int = 3,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Drop-in equivalent of ``graph.hits`` (max-normalized integer
    HITS) on the shard index: both edge orientations are exchanged
    ONCE into shard CSRs; each half-step ships per-key partial sums
    plus one local max per shard (the driver folds the global max in
    Python ints, exactly like the cogroup engine)."""
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    shards = [_HITSShard.remote(i, n_shards, scale) for i in range(n_shards)]

    edges = edges.materialize()  # consumed twice (two orientations)

    def make_out(batch: pa.Table):
        return (
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    def make_in(batch: pa.Table):
        return (
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    _direct_push(edges, make_out, shards, "add_out")
    _direct_push(edges, make_in, shards, "add_in")

    def push_nodes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        refs = []
        for sid in range(n_shards):
            mine = ids[np.abs(ids) % n_shards == sid]
            if len(mine):
                refs.append(shards[sid].add_nodes.remote(mine))
        ray.get(refs)
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    nodes.map_batches(push_nodes, batch_format="pyarrow").count()
    ray.get([s.finalize.remote() for s in shards])

    for _ in range(n_iters):
        a_refs = [s.auth_partials.remote() for s in shards]
        amax = max(ray.get([s.fold_araw.remote(*a_refs) for s in shards]))
        ray.get([s.normalize_auth.remote(amax) for s in shards])
        h_refs = [s.hub_partials.remote() for s in shards]
        hmax = max(ray.get([s.fold_hraw.remote(*h_refs) for s in shards]))
        ray.get([s.normalize_hub.remote(hmax) for s in shards])

    out = ray.data.from_arrow_refs(
        [s.values_table.remote() for s in shards]
    ).materialize()
    for s in shards:
        ray.kill(s)
    return out


def _build_shards(
    edges: ray.data.Dataset, n_shards: int
) -> list["ray.actor.ActorHandle"]:
    shards = [
        _GraphShard.remote(i, n_shards) for i in range(n_shards)
    ]

    def make_xy(batch: pa.Table):
        return (
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    # synchronous direct push: consuming the dataset is the barrier
    _direct_push(edges, make_xy, shards, "add_edges")
    ray.get([s.finalize.remote() for s in shards])
    return shards


def _bfs_on_shards(
    shards: list, seed_nodes: np.ndarray, max_depth: int
) -> list:
    """Run the level loop; returns per-shard visited_table REFS (the
    caller owns them, so the actors may be killed afterwards)."""
    seeded = [s.seed.options(num_returns=2).remote(seed_nodes) for s in shards]
    frontier = [arr for _, arr in seeded]
    for level in range(1, max_depth + 1):
        expanded = [
            s.expand.options(num_returns=2).remote(*frontier) for s in shards
        ]
        cand_refs = [arr for _, arr in expanded]
        visited = [
            s.visit.options(num_returns=2).remote(level, *cand_refs)
            for s in shards
        ]
        new_counts = ray.get([cnt for cnt, _ in visited])  # counts only
        if sum(new_counts) == 0:
            break
        frontier = [arr for _, arr in visited]
    return [s.visited_table.remote() for s in shards]


def bfs_hops_indexed(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    max_depth: int = 256,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Drop-in semantic equivalent of ``graph.bfs_hops`` (Dataset[node,
    hops], min hop per reachable node) that pays ONE edge exchange
    total instead of one per level. Prefer it whenever levels > ~3 or
    the closure is unbounded (SCC, reachability)."""
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    shards = _build_shards(edges, n_shards)
    seed_nodes = (
        seeds.to_pandas()["node"].to_numpy(np.int64)
        if seeds.count()
        else np.empty(0, np.int64)
    )
    table_refs = _bfs_on_shards(shards, seed_nodes, max_depth)
    out = ray.data.from_arrow_refs(table_refs).materialize()
    for s in shards:
        ray.kill(s)
    return out


def scc_members_indexed(
    edges: ray.data.Dataset,
    seed: int,
    max_depth: int = 256,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Forward-backward SCC on the shard index: both closures reuse
    the SAME forward adjacency actors (two edge exchanges total — one
    per direction), then one cogroup-free intersection done shard-local
    (both closures are sharded by the same ownership rule, so the
    intersection of shard i's outputs needs no exchange at all)."""
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8

    edges = edges.materialize()  # consumed twice: fwd + bwd builds

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"]})

    seed_nodes = np.asarray([int(seed)], np.int64)

    fwd_shards = _build_shards(edges, n_shards)
    fwd_refs = _bfs_on_shards(fwd_shards, seed_nodes, max_depth)

    bwd_shards = _build_shards(
        edges.map_batches(swap, batch_format="pyarrow"), n_shards
    )
    bwd_refs = _bfs_on_shards(bwd_shards, seed_nodes, max_depth)

    @ray.remote
    def intersect(f: pa.Table, b: pa.Table) -> pa.Table:
        fn = f["node"].to_numpy(zero_copy_only=False)
        bn = b["node"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.intersect1d(fn, bn)})

    # shard i of fwd and shard i of bwd own the SAME node subset
    both = [intersect.remote(fr, br) for fr, br in zip(fwd_refs, bwd_refs)]
    out = ray.data.from_arrow_refs(both).materialize()
    for s in fwd_shards + bwd_shards:
        ray.kill(s)
    return out


def _direct_push(
    edges: ray.data.Dataset,
    make_xy,
    shards: list,
    method: str,
) -> int:
    """Fused tag+push index build: each scan batch partitions its rows
    by owner shard and pushes them STRAIGHT into the shard actors,
    bypassing the groupby(shard) sort exchange — which an A/B at 2M
    nodes / 6M edges measured as pure overhead for this many-to-few
    routing (14.5 s -> 6.2 s, identical shard contents; push order is
    irrelevant because every finalize does an exact distinct/merge).
    ``ray.get`` per batch applies backpressure so scan tasks cannot
    outrun the shards. Returns the number of pushed rows."""
    S = len(shards)

    def tag_push(batch: pa.Table) -> pa.Table:
        x, y = make_xy(batch)
        if not len(x):
            return pa.table({"n": pa.array([0], pa.int64())})
        own = np.abs(x) % S
        order = np.argsort(own, kind="stable")
        x, y, own = x[order], y[order], own[order]
        bnd = np.flatnonzero(np.diff(own)) + 1
        starts = np.concatenate(([0], bnd, [len(own)]))
        refs = []
        for i in range(len(starts) - 1):
            a, b = int(starts[i]), int(starts[i + 1])
            refs.append(
                getattr(shards[int(own[a])], method).remote(x[a:b], y[a:b])
            )
        ray.get(refs)
        return pa.table({"n": pa.array([len(x)], pa.int64())})

    parts = edges.map_batches(tag_push, batch_format="pyarrow").take_all()
    return sum(int(r["n"]) for r in parts)


@ray.remote
class _TriShard:
    """Owns the incident-edge lists (and later the oriented CSR) for
    its nodes during an indexed triangle count. Lifecycle:
    add_incident* -> finalize_tri -> deg_queries -> deg_lookup (as a
    peer) -> orient -> wedge_queries -> probe (as a peer)."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self.sid = shard_id
        self.n = n_shards
        self._x_parts: list[np.ndarray] = []
        self._y_parts: list[np.ndarray] = []
        # after finalize_tri: incident CSR + owned degrees
        self._x: np.ndarray | None = None  # sorted owned endpoints
        self._y: np.ndarray | None = None  # neighbor per incident row
        self._deg_keys: np.ndarray | None = None
        self._deg: np.ndarray | None = None
        self._q_parts: list[np.ndarray] | None = None  # deg queries
        # after orient: oriented out-edges (tail owned)
        self._o_tail: np.ndarray | None = None
        self._o_head: np.ndarray | None = None
        self._o_dhead: np.ndarray | None = None

    def add_incident(self, x: np.ndarray, y: np.ndarray) -> int:
        self._x_parts.append(np.asarray(x, np.int64))
        self._y_parts.append(np.asarray(y, np.int64))
        return len(x)

    def finalize_tri(self) -> int:
        x = (
            np.concatenate(self._x_parts)
            if self._x_parts
            else np.empty(0, np.int64)
        )
        y = (
            np.concatenate(self._y_parts)
            if self._y_parts
            else np.empty(0, np.int64)
        )
        self._x_parts, self._y_parts = [], []
        # local distinct is global distinct: every copy of undirected
        # edge (u, v) arrives HERE for its u-side iff owner(u) == sid,
        # so (x, y) duplicates collapse exactly
        if len(x):
            uv = np.unique(np.stack([x, y], axis=1), axis=0)
            x, y = uv[:, 0], uv[:, 1]
        self._x, self._y = x, y
        self._deg_keys, counts = np.unique(x, return_counts=True)
        self._deg = counts.astype(np.int64)
        return len(x)

    def deg_queries(self) -> list:
        """Unique neighbor ids partitioned by owner shard (S slots —
        callers route slot t to shard t's deg_lookup)."""
        y = np.unique(self._y) if self._y is not None else np.empty(0, np.int64)
        own = np.abs(y) % self.n
        self._q_parts = [y[own == t] for t in range(self.n)]
        return self._q_parts

    def deg_lookup(self, nodes: np.ndarray) -> np.ndarray:
        nodes = np.asarray(nodes, np.int64)
        if not len(nodes):
            return np.empty(0, np.int64)
        # every queried node has >= 1 incident edge at its owner, so
        # searchsorted always hits
        pos = np.searchsorted(self._deg_keys, nodes)
        return self._deg[pos]

    def orient(self, *deg_replies: np.ndarray) -> int:
        """Build the oriented out-edge set for owned tails: keep
        (x, y) iff (deg(x), x) < (deg(y), y). Returns |N+| (this
        shard's share of the distinct edge count: the orientation
        assigns each undirected edge to exactly one owner)."""
        # neighbor-degree lookup table from the peer replies (aligned
        # with the partitions deg_queries returned)
        qk = np.concatenate(self._q_parts) if self._q_parts else np.empty(0, np.int64)
        qv = (
            np.concatenate([np.asarray(r, np.int64) for r in deg_replies])
            if deg_replies
            else np.empty(0, np.int64)
        )
        order = np.argsort(qk)
        qk, qv = qk[order], qv[order]
        self._q_parts = None
        x, y = self._x, self._y
        dx = self._deg[np.searchsorted(self._deg_keys, x)]
        dy = qv[np.searchsorted(qk, y)]
        keep = (dx < dy) | ((dx == dy) & (x < y))
        tail, head, dhead = x[keep], y[keep], dy[keep]
        # sort segments by (tail, deg_head, head): wedge pairs then
        # come out orientation-ordered for free
        o = np.lexsort((head, dhead, tail))
        self._o_tail, self._o_head, self._o_dhead = tail[o], head[o], dhead[o]
        self._x = self._y = None  # incident lists no longer needed
        return int(len(tail))

    def wedge_queries(self) -> list:
        """All wedge pairs (b, c) of this shard's apexes — b before c
        in (deg, id) order, so the closing edge is oriented b -> c —
        partitioned by owner(b) into S slots, each a (2, K) int64
        array, routed to that owner's probe()."""
        t, h = self._o_tail, self._o_head
        bs: list[np.ndarray] = []
        cs: list[np.ndarray] = []
        if t is not None and len(t):
            # offset-k sweep: positions p, p+k in the same tail
            # segment pair up; max k is the max out-degree, which the
            # orientation bounds at O(sqrt(m)) regardless of hub skew
            k = 1
            while True:
                same = t[:-k] == t[k:] if k < len(t) else np.empty(0, bool)
                if not same.any():
                    break
                p = np.flatnonzero(same)
                bs.append(h[p])
                cs.append(h[p + k])
                k += 1
        if bs:
            b = np.concatenate(bs)
            c = np.concatenate(cs)
        else:
            b = np.empty(0, np.int64)
            c = np.empty(0, np.int64)
        own = np.abs(b) % self.n
        return [
            np.stack([b[own == s], c[own == s]]) for s in range(self.n)
        ]

    def probe(self, *pair_blocks: np.ndarray) -> tuple[int, int]:
        """Count wedge pairs that close: (b, c) is a triangle iff the
        oriented edge b -> c exists in this shard (b is owned here).
        Returns (n_pairs_probed, n_matched)."""
        blocks = [np.asarray(pb, np.int64) for pb in pair_blocks]
        n_pairs = int(sum(pb.shape[1] for pb in blocks))
        if n_pairs == 0 or self._o_tail is None or not len(self._o_tail):
            return n_pairs, 0
        b = np.concatenate([pb[0] for pb in blocks])
        c = np.concatenate([pb[1] for pb in blocks])
        mine = pd.DataFrame({"b": self._o_tail, "c": self._o_head})
        q = pd.DataFrame({"b": b, "c": c})
        return n_pairs, int(len(q.merge(mine, on=["b", "c"], how="inner")))


def triangle_count_indexed(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Drop-in equivalent of ``graph.triangle_count`` (one summary row:
    n_edges, n_wedges, n_triangles; degree-oriented wedge-check with
    the identical (deg, id) orientation rule, so the two engines and
    the SQL oracle agree bit for bit) on the shard index.

    The Dataset-algebra engine pays ~7 coarse-bucket exchanges
    (distinct, degrees, 2x degree-attach, orientation, wedges, match).
    Here the edge set is exchanged ONCE into shard actors (each
    undirected edge lands at both endpoint owners); degrees, the
    orientation, wedge generation and the closing-edge probe all
    happen shard-local, with only neighbor-degree lookups (O(m) ids)
    and the wedge stream (O(m^1.5) worst case, the algorithm's honest
    currency) moving actor-to-actor through the object store. The
    driver sees integers only.

    Scale note: wedge blocks ship in one slot per (apex-shard, owner)
    pair; at extreme m a chunked probe (multiple slots per pair) is a
    num_returns change, same as the module-level BFS note.
    """
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    S = n_shards
    shards = [_TriShard.remote(i, S) for i in range(S)]

    def make_xy(batch: pa.Table):
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        # per-batch distinct bounds the push volume; exact distinct
        # happens at the owning shard (finalize_tri)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return (
            np.concatenate([uv[:, 0], uv[:, 1]]),
            np.concatenate([uv[:, 1], uv[:, 0]]),
        )

    n_pushed = _direct_push(edges, make_xy, shards, "add_incident")
    empty = n_pushed == 0
    if not empty:
        ray.get([s.finalize_tri.remote() for s in shards])
        qs = [
            s.deg_queries.options(num_returns=S).remote() for s in shards
        ]
        replies = [
            [shards[t].deg_lookup.remote(qs[s][t]) for t in range(S)]
            for s in range(S)
        ]
        n_out = ray.get(
            [shards[s].orient.remote(*replies[s]) for s in range(S)]
        )
        wq = [
            s.wedge_queries.options(num_returns=S).remote() for s in shards
        ]
        probes = [
            shards[t].probe.remote(*[wq[s][t] for s in range(S)])
            for t in range(S)
        ]
        res = ray.get(probes)
        n_edges = int(sum(n_out))
        n_wedges = int(sum(p for p, _ in res))
        n_tri = int(sum(m for _, m in res))
    else:
        n_edges = n_wedges = n_tri = 0
    for s in shards:
        ray.kill(s)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
                "n_triangles": pa.array([n_tri], pa.int64()),
            }
        )
    )


@ray.remote
class _KCoreShard:
    """Owns the undirected adjacency (CSR) and live degree of its
    nodes during an indexed k-core peel. Lifecycle: add_incident* ->
    finalize_kcore(k) -> rounds of find_deaths / n_last_died / apply
    -> survivors."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self.sid = shard_id
        self.n = n_shards
        self._x_parts: list[np.ndarray] = []
        self._y_parts: list[np.ndarray] = []
        self._keys: np.ndarray | None = None   # owned nodes, sorted
        self._off: np.ndarray | None = None    # CSR offsets per key
        self._nbr: np.ndarray | None = None    # neighbor ids
        self._deg: np.ndarray | None = None    # live degree per key
        self._alive: np.ndarray | None = None
        self._k = 0
        self._died_last = 0

    def add_incident(self, x: np.ndarray, y: np.ndarray) -> int:
        self._x_parts.append(np.asarray(x, np.int64))
        self._y_parts.append(np.asarray(y, np.int64))
        return len(x)

    def finalize_kcore(self, k: int) -> int:
        self._k = int(k)
        x = (
            np.concatenate(self._x_parts)
            if self._x_parts
            else np.empty(0, np.int64)
        )
        y = (
            np.concatenate(self._y_parts)
            if self._y_parts
            else np.empty(0, np.int64)
        )
        self._x_parts, self._y_parts = [], []
        # local distinct is global distinct: every copy of undirected
        # edge (u, v) reaches THIS shard for its u side iff owner(u)
        # is sid, so per-shard dedupe collapses exactly
        if len(x):
            uv = np.unique(np.stack([x, y], axis=1), axis=0)
            x, y = uv[:, 0], uv[:, 1]
        self._keys, counts = np.unique(x, return_counts=True)
        self._deg = counts.astype(np.int64)
        self._off = np.zeros(len(self._keys) + 1, dtype=np.int64)
        np.cumsum(counts, out=self._off[1:])
        self._nbr = y  # x is sorted by np.unique/stack ordering
        self._alive = np.ones(len(self._keys), dtype=bool)
        return len(x)

    def find_deaths(self) -> list:
        """Mark owned nodes with live degree < k dead; return the
        decrement partials (2, K) int64 [node, dec] for their CSR
        neighbors, partitioned by owner shard (S slots)."""
        dying = self._alive & (self._deg < self._k)
        self._died_last = int(dying.sum())
        self._alive &= ~dying
        if self._died_last == 0 or self._nbr is None:
            e = np.empty((2, 0), np.int64)
            return [e for _ in range(self.n)]
        idx = np.flatnonzero(dying)
        spans = [
            self._nbr[self._off[i] : self._off[i + 1]] for i in idx
        ]
        nbrs = np.concatenate(spans) if spans else np.empty(0, np.int64)
        nodes, decs = np.unique(nbrs, return_counts=True)
        own = np.abs(nodes) % self.n
        return [
            np.stack([nodes[own == t], decs[own == t].astype(np.int64)])
            for t in range(self.n)
        ]

    def n_last_died(self) -> int:
        return self._died_last

    def apply(self, *dec_blocks: np.ndarray) -> int:
        """Subtract neighbor-death decrements from still-alive owned
        nodes (decrements addressed to already-dead nodes are moot —
        the edge left the subgraph when its first endpoint died)."""
        applied = 0
        for blk in dec_blocks:
            blk = np.asarray(blk, np.int64)
            if not blk.shape[1] or self._keys is None or not len(self._keys):
                continue
            pos = np.searchsorted(self._keys, blk[0])
            pos_c = np.minimum(pos, len(self._keys) - 1)
            ok = (self._keys[pos_c] == blk[0]) & self._alive[pos_c]
            np.subtract.at(self._deg, pos_c[ok], blk[1][ok])
            applied += int(ok.sum())
        return applied

    def survivors(self) -> pa.Table:
        if self._keys is None or not len(self._keys):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                }
            )
        m = self._alive
        return pa.table(
            {
                "doc_id": pa.array(self._keys[m], pa.int64()),
                "deg": pa.array(self._deg[m], pa.int64()),
            }
        )


def k_core_indexed(
    edges: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Drop-in equivalent of ``graph.k_core`` (survivor (doc_id, deg)
    rows of the k-core under simultaneous-removal peel rounds — the
    identical round evolution, so the two engines and the chained-CTE
    SQL oracle agree exactly) on the shard index.

    The Dataset-algebra engine pays three corpus-sized cogroups per
    peel round (two survivor semi-joins + a degree rebuild), with the
    edge set re-exchanged every round. Here the edge set is exchanged
    ONCE into shard actors; each round moves only the death-decrement
    partials — (neighbor, count) pairs for edges incident to nodes
    that died THIS round — so total exchange volume across ALL rounds
    is bounded by one pass over the edges (each edge's endpoint dies
    at most once) plus S^2 empty slots per quiet round. The driver
    sees one integer per shard per round.

    Decrements addressed to nodes that died in the same or an earlier
    round are skipped at apply: the edge already left the subgraph
    with its first-dying endpoint, which is exactly the simultaneous
    cogroup semantics. Raises RuntimeError if max_rounds is hit before
    the fixpoint — a truncated peel is NOT the k-core.
    """
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    S = n_shards
    shards = [_KCoreShard.remote(i, S) for i in range(S)]

    def make_xy(batch: pa.Table):
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return (
            np.concatenate([uv[:, 0], uv[:, 1]]),
            np.concatenate([uv[:, 1], uv[:, 0]]),
        )

    n_pushed = _direct_push(edges, make_xy, shards, "add_incident")
    if n_pushed:
        ray.get([s.finalize_kcore.remote(k) for s in shards])
        converged = False
        for _ in range(max_rounds):
            slots = [
                s.find_deaths.options(num_returns=S).remote() for s in shards
            ]
            died = sum(ray.get([s.n_last_died.remote() for s in shards]))
            if died == 0:
                converged = True
                break
            ray.get(
                [
                    shards[t].apply.remote(*[slots[s][t] for s in range(S)])
                    for t in range(S)
                ]
            )
        if not converged:
            for s in shards:
                ray.kill(s)
            raise RuntimeError(
                f"k_core_indexed did not converge within "
                f"max_rounds={max_rounds}"
            )
    out = ray.data.from_arrow_refs([s.survivors.remote() for s in shards])
    out = out.materialize()
    for s in shards:
        ray.kill(s)
    return out


@ray.remote
class _WalkShard:
    """Owns the out-adjacency (CSR, dsts ascending in-span) of its
    nodes during deterministic random-walk generation, plus the output
    buffer of walk positions it emitted. Lifecycle: add_edges* ->
    finalize_walks -> start(walks_per_node) -> step(t)* -> drain."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self.sid = shard_id
        self.n = n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self._keys: np.ndarray | None = None
        self._off: np.ndarray | None = None
        self._nbr: np.ndarray | None = None
        self._out: list[tuple[np.ndarray, np.ndarray, int, np.ndarray]] = []
        self._n_live = 0

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def finalize_walks(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts
            else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts
            else np.empty(0, np.int64)
        )
        self._src_parts, self._dst_parts = [], []
        if len(src):
            # distinct + (src, dst)-sorted in one shot: in-span dsts
            # ascending is the rank order the oracle's row_number
            # replays
            sd = np.unique(np.stack([src, dst], axis=1), axis=0)
            src, dst = sd[:, 0], sd[:, 1]
        self._keys, counts = np.unique(src, return_counts=True)
        self._off = np.zeros(len(self._keys) + 1, dtype=np.int64)
        np.cumsum(counts, out=self._off[1:])
        self._nbr = dst
        return len(src)

    def _advance(
        self, t: int, starts: np.ndarray, ws: np.ndarray, cur: np.ndarray
    ) -> list:
        """Advance walk states sitting on owned nodes: pick the
        H(cur, t, w) % outdeg ranked outlink, record the emitted
        positions, return next states partitioned by owner(next)."""
        import hashlib

        if len(cur) and self._keys is not None and len(self._keys):
            pos = np.searchsorted(self._keys, cur)
            pos_c = np.minimum(pos, len(self._keys) - 1)
            live = self._keys[pos_c] == cur
        else:
            live = np.zeros(len(cur), dtype=bool)
        starts, ws, cur = starts[live], ws[live], cur[live]
        if not len(cur):
            self._n_live = 0
            e = np.empty((3, 0), np.int64)
            return [e for _ in range(self.n)]
        pos = np.searchsorted(self._keys, cur)
        odeg = self._off[pos + 1] - self._off[pos]
        # H = first 8 hex digits of md5("cur:t:w") — replayed verbatim
        # by the oracle's ('0x' || substring(md5(...), 1, 8))::UBIGINT
        choice = np.fromiter(
            (
                int(
                    hashlib.md5(f"{c}:{t}:{w}".encode()).hexdigest()[:8], 16
                )
                for c, w in zip(cur.tolist(), ws.tolist())
            ),
            dtype=np.int64,
            count=len(cur),
        ) % odeg
        nxt = self._nbr[self._off[pos] + choice]
        self._out.append((starts, ws, t, nxt))
        self._n_live = len(nxt)
        own = np.abs(nxt) % self.n
        return [
            np.stack([starts[own == s], ws[own == s], nxt[own == s]])
            for s in range(self.n)
        ]

    def start(self, walks_per_node: int, t: int) -> list:
        """Seed one walk state per (owned source node, walk id) and
        advance them one step (t = 1)."""
        W = walks_per_node
        nodes = self._keys if self._keys is not None else np.empty(0, np.int64)
        starts = np.repeat(nodes, W)
        ws = np.tile(np.arange(W, dtype=np.int64), len(nodes))
        return self._advance(t, starts, ws, starts.copy())

    def step(self, t: int, *state_blocks: np.ndarray) -> list:
        blocks = [np.asarray(b, np.int64) for b in state_blocks]
        if blocks:
            starts = np.concatenate([b[0] for b in blocks])
            ws = np.concatenate([b[1] for b in blocks])
            cur = np.concatenate([b[2] for b in blocks])
        else:
            starts = ws = cur = np.empty(0, np.int64)
        return self._advance(t, starts, ws, cur)

    def n_live(self) -> int:
        return self._n_live

    def drain(self, walks_per_node: int) -> pa.Table:
        """Step-0 positions for owned start nodes + every emitted
        step-t position."""
        nodes = self._keys if self._keys is not None else np.empty(0, np.int64)
        W = walks_per_node
        s0 = np.repeat(nodes, W)
        w0 = np.tile(np.arange(W, dtype=np.int64), len(nodes))
        starts = [s0] + [s for s, _, _, _ in self._out]
        ws = [w0] + [w for _, w, _, _ in self._out]
        steps = [np.zeros(len(s0), np.int64)] + [
            np.full(len(s), t, np.int64) for s, _, t, _ in self._out
        ]
        nodes_o = [s0] + [n for _, _, _, n in self._out]
        return pa.table(
            {
                "start": pa.array(np.concatenate(starts), pa.int64()),
                "walk": pa.array(np.concatenate(ws), pa.int64()),
                "step": pa.array(np.concatenate(steps), pa.int64()),
                "node": pa.array(np.concatenate(nodes_o), pa.int64()),
            }
        )


def random_walks_indexed(
    edges: ray.data.Dataset,
    walk_len: int = 8,
    walks_per_node: int = 1,
    src: str = "src",
    dst: str = "dst",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Deterministic DeepWalk-style walk corpus over a directed graph
    (the graph-structured analogue of a training-data export: walk
    sequences feed skip-gram / node-embedding training exactly like
    token streams feed LMs).

    Semantics (exactly replayable in SQL, see the `random_walks`
    oracle): adjacency is the DISTINCT self-loop-free edge set with
    each source's outlinks ranked ascending by dst; every node with
    outdeg >= 1 starts ``walks_per_node`` walks; at step t (1-based)
    a walk at node v moves to the outlink with rank
    ``H(v, t, w) % outdeg(v)`` where H = the first 8 md5 hex digits
    of "v:t:w" — the repo's standard SQL-replayable hash (cf.
    hash_sample) — and a walk ENDS when it reaches a node with no
    outlinks. Output: one row per visited position
    (start, walk, step, node), step 0 included.

    Index shape: the edge set is exchanged once into shard actors;
    each of the walk_len-1 rounds moves only the live walk-state
    triples (start, walk, cur) actor-to-actor — O(n_live) per round,
    zero edge movement, integers only to the driver. The md5 loop is
    the per-state cost; it is the price of SQL replayability (a
    vectorized hash here would need a matching SQL builtin).
    """
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    S = n_shards
    shards = [_WalkShard.remote(i, S) for i in range(S)]

    def make_xy(batch: pa.Table):
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        sd = np.unique(np.stack([s, d], axis=1), axis=0)
        return sd[:, 0], sd[:, 1]

    n_pushed = _direct_push(edges, make_xy, shards, "add_edges")
    if n_pushed and walk_len > 1:
        ray.get([s.finalize_walks.remote() for s in shards])
        slots = [
            s.start.options(num_returns=S).remote(walks_per_node, 1)
            for s in shards
        ]
        for t in range(2, walk_len):
            if sum(ray.get([s.n_live.remote() for s in shards])) == 0:
                break
            slots = [
                shards[u]
                .step.options(num_returns=S)
                .remote(t, *[slots[s][u] for s in range(S)])
                for u in range(S)
            ]
        ray.get([s.n_live.remote() for s in shards])  # step barrier
    elif n_pushed:
        ray.get([s.finalize_walks.remote() for s in shards])
    out = ray.data.from_arrow_refs(
        [s.drain.remote(walks_per_node) for s in shards]
    )
    out = out.materialize()
    for s in shards:
        ray.kill(s)
    return out


@ray.remote
class _LPAShard:
    """Owns the symmetrized CSR adjacency and current community label
    of its nodes during synchronous label propagation. Each round
    ships per-(dst, label) COUNT partials (pre-aggregated before they
    travel); the owner folds counts and takes the majority label with
    the deterministic (count DESC, label ASC) tie-break."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self.sid = shard_id
        self.n = n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self._keys: np.ndarray | None = None
        self._off: np.ndarray | None = None
        self._nbr: np.ndarray | None = None
        self._labels: np.ndarray | None = None

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def finalize_lpa(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts
            else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts
            else np.empty(0, np.int64)
        )
        self._src_parts, self._dst_parts = [], []
        if len(src):
            sd = np.unique(np.stack([src, dst], axis=1), axis=0)
            src, dst = sd[:, 0], sd[:, 1]
        self._keys, counts = np.unique(src, return_counts=True)
        self._off = np.zeros(len(self._keys) + 1, dtype=np.int64)
        np.cumsum(counts, out=self._off[1:])
        self._nbr = dst
        self._labels = self._keys.copy()  # label_0(v) = v
        return len(src)

    def round_one_local(self) -> int:
        """Round 1 needs no exchange: label_0(u) = u and neighbors
        are distinct, so every count is 1 and the majority rule's
        (count DESC, label ASC) tie-break degenerates to the MIN
        neighbor id — which is local to the (symmetrized) CSR."""
        if self._keys is not None and len(self._keys):
            self._labels = np.minimum.reduceat(self._nbr, self._off[:-1])
        return 0

    def contribs(self) -> list:
        """(neighbor, my_label, count) partials for every owned edge
        u -> v: v hears label(u). Pre-aggregated per (v, label) and
        partitioned by owner(v) into S slots, each a (3, K) int64."""
        if self._keys is None or not len(self._keys):
            e = np.empty((3, 0), np.int64)
            return [e for _ in range(self.n)]
        sizes = np.diff(self._off)
        lab_per_edge = np.repeat(self._labels, sizes)
        vl = np.stack([self._nbr, lab_per_edge], axis=1)
        uniq, cnt = np.unique(vl, axis=0, return_counts=True)
        v, lab = uniq[:, 0], uniq[:, 1]
        own = np.abs(v) % self.n
        return [
            np.stack([v[own == t], lab[own == t], cnt[own == t]])
            for t in range(self.n)
        ]

    def apply(self, *blocks: np.ndarray) -> int:
        """Fold incoming (v, label, count) partials for owned nodes:
        new label(v) = majority label, ties to the smaller label."""
        blocks = [np.asarray(b, np.int64) for b in blocks]
        if self._keys is None or not len(self._keys):
            return 0
        vs = np.concatenate([b[0] for b in blocks])
        ls = np.concatenate([b[1] for b in blocks])
        cs = np.concatenate([b[2] for b in blocks])
        if not len(vs):
            return 0
        # sum partial counts per (v, label)
        vl = np.stack([vs, ls], axis=1)
        uniq, inv = np.unique(vl, axis=0, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, cs)
        v, lab = uniq[:, 0], uniq[:, 1]
        # first row per v under (v ASC, count DESC, label ASC) is the
        # winner (uniq is already (v, label)-sorted; a stable sort by
        # -count keeps label ASC within equal counts)
        order = np.argsort(-tot, kind="stable")
        v, lab = v[order], lab[order]
        order2 = np.argsort(v, kind="stable")
        v, lab = v[order2], lab[order2]
        first = np.concatenate(([True], v[1:] != v[:-1]))
        v, lab = v[first], lab[first]
        pos = np.searchsorted(self._keys, v)
        self._labels[pos] = lab
        return int(len(v))

    def labels_table(self) -> pa.Table:
        if self._keys is None:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "community": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "node": pa.array(self._keys, pa.int64()),
                "community": pa.array(self._labels, pa.int64()),
            }
        )


def lpa_communities_indexed(
    edges: ray.data.Dataset,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Synchronous label-propagation community detection (Raghavan et
    al.) with fully deterministic semantics: the graph is symmetrized
    and self-loop-free, label_0(v) = v, and each round every node
    simultaneously adopts the MAJORITY label among its neighbors with
    ties broken by the smaller label — replayed exactly by the SQL
    oracle's chained per-round CTEs (count DESC, label ASC
    row_number). Unlike connected components (min-label fixpoint =
    membership), LPA finds dense sub-communities WITHIN components;
    a fixed ``n_iters`` keeps it exactly replayable.

    Index shape: one direct-push edge exchange into shard actors;
    each round ships per-(dst, label) count partials (pre-aggregated
    at the sender — volume <= the edge count, usually far less) and
    the driver sees one int per shard per round.
    """
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    S = n_shards
    shards = [_LPAShard.remote(i, S) for i in range(S)]

    def make_xy(batch: pa.Table):
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return (
            np.concatenate([uv[:, 0], uv[:, 1]]),
            np.concatenate([uv[:, 1], uv[:, 0]]),
        )

    n_pushed = _direct_push(edges, make_xy, shards, "add_edges")
    if n_pushed:
        ray.get([s.finalize_lpa.remote() for s in shards])
        if n_iters >= 1:
            # round 1 degenerates to local min-neighbor (see
            # round_one_local) — skips the largest exchange of the
            # whole run (round-1 labels are all distinct, so its
            # partial stream is edge-sized)
            ray.get([s.round_one_local.remote() for s in shards])
        for _ in range(1, n_iters):
            slots = [
                s.contribs.options(num_returns=S).remote() for s in shards
            ]
            ray.get(
                [
                    shards[t].apply.remote(*[slots[s][t] for s in range(S)])
                    for t in range(S)
                ]
            )
    out = ray.data.from_arrow_refs([s.labels_table.remote() for s in shards])
    out = out.materialize()
    for s in shards:
        ray.kill(s)
    return out


@ray.remote
class _MISShard:
    """Owns adjacency + alive state of its nodes during deterministic
    Luby maximal-independent-set rounds. Priorities are a pure
    function of (node, round) — first 8 md5 hex digits of "node:r" —
    so neighbor priorities are computed locally; only DEATHS travel
    (broadcast to all shards; each keeps the dead set it needs to
    veto neighbors)."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self.sid = shard_id
        self.n = n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self._keys: np.ndarray | None = None
        self._off: np.ndarray | None = None
        self._nbr: np.ndarray | None = None
        self._alive: np.ndarray | None = None
        self._dead: np.ndarray = np.empty(0, np.int64)  # sorted, global
        self._mis: list[tuple[int, np.ndarray]] = []

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def finalize_mis(self) -> int:
        src = (
            np.concatenate(self._src_parts)
            if self._src_parts
            else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts)
            if self._dst_parts
            else np.empty(0, np.int64)
        )
        self._src_parts, self._dst_parts = [], []
        if len(src):
            sd = np.unique(np.stack([src, dst], axis=1), axis=0)
            src, dst = sd[:, 0], sd[:, 1]
        self._keys, counts = np.unique(src, return_counts=True)
        self._off = np.zeros(len(self._keys) + 1, dtype=np.int64)
        np.cumsum(counts, out=self._off[1:])
        self._nbr = dst
        self._alive = np.ones(len(self._keys), dtype=bool)
        return len(src)

    @staticmethod
    def _prio(nodes: np.ndarray, r: int) -> np.ndarray:
        import hashlib

        return np.fromiter(
            (
                int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:8], 16)
                for v in nodes.tolist()
            ),
            dtype=np.int64,
            count=len(nodes),
        )

    def decide(self, r: int) -> np.ndarray:
        """Pick owned MIS winners for round r: alive v wins iff NO
        alive neighbor u has (prio(u), u) < (prio(v), v). Returns the
        death set this shard generates — its winners plus ALL their
        neighbors (owners dedupe on apply)."""
        if self._keys is None or not len(self._keys):
            return np.empty(0, np.int64)
        idx = np.flatnonzero(self._alive)
        if not len(idx):
            return np.empty(0, np.int64)
        v = self._keys[idx]
        pv = self._prio(v, r)
        # neighbor spans; veto if any alive neighbor precedes
        nbr_alive_mask = ~np.isin(self._nbr, self._dead)
        # vectorized per-span check via repeat/compare
        spans = self._off
        sizes = (spans[idx + 1] - spans[idx]).astype(np.int64)
        flat = np.concatenate(
            [self._nbr[spans[i] : spans[i + 1]] for i in idx]
        ) if len(idx) else np.empty(0, np.int64)
        alive_flat = np.concatenate(
            [nbr_alive_mask[spans[i] : spans[i + 1]] for i in idx]
        ) if len(idx) else np.empty(0, bool)
        pu = self._prio(flat, r)
        pv_rep = np.repeat(pv, sizes)
        v_rep = np.repeat(v, sizes)
        beats = alive_flat & (
            (pu < pv_rep) | ((pu == pv_rep) & (flat < v_rep))
        )
        # reduce per span: any beating neighbor -> veto
        veto = np.zeros(len(idx), dtype=bool)
        pos = np.repeat(np.arange(len(idx)), sizes)
        np.logical_or.at(veto, pos, beats)
        win = v[~veto]
        if not len(win):
            return np.empty(0, np.int64)
        self._mis.append((r, win))
        wpos = np.searchsorted(self._keys, win)
        wnbrs = np.concatenate(
            [self._nbr[spans[p] : spans[p + 1]] for p in wpos]
        )
        return np.unique(np.concatenate([win, wnbrs]))

    def apply_deaths(self, *death_blocks: np.ndarray) -> int:
        """Fold the round's global death set: update the shared dead
        filter and kill owned nodes."""
        blocks = [np.asarray(b, np.int64) for b in death_blocks]
        dead_new = (
            np.unique(np.concatenate(blocks))
            if blocks
            else np.empty(0, np.int64)
        )
        if not len(dead_new):
            return int(self._alive.sum()) if self._alive is not None else 0
        self._dead = np.union1d(self._dead, dead_new)
        if self._keys is not None and len(self._keys):
            pos = np.searchsorted(self._keys, dead_new)
            pos_c = np.minimum(pos, len(self._keys) - 1)
            ok = self._keys[pos_c] == dead_new
            self._alive[pos_c[ok]] = False
        return int(self._alive.sum()) if self._alive is not None else 0

    def mis_table(self) -> pa.Table:
        if not self._mis:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "round": pa.array([], pa.int64()),
                }
            )
        nodes = np.concatenate([n for _, n in self._mis])
        rounds = np.concatenate(
            [np.full(len(n), r, np.int64) for r, n in self._mis]
        )
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "round": pa.array(rounds, pa.int64()),
            }
        )


def mis_indexed(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Deterministic Luby maximal independent set over the symmetrized
    self-loop-free graph — the classic parallel symmetry-breaking
    primitive (e.g. picking a maximal batch of mutually-conflicting
    fetch/compaction tasks to run together). Round r gives every
    alive node the priority (first-8-md5-hex("node:r"), node); a node
    joins the MIS iff it precedes ALL alive neighbors, then winners
    and their neighbors leave the graph. Fully deterministic, so the
    SQL oracle replays every round with generated chained CTEs
    (`_mis_sql`). Returns Dataset[node, round] of MIS members.

    Index shape: one direct-push edge exchange; priorities are pure
    (node, round) functions computed shard-local, so each round moves
    ONLY the death set (winners + their neighborhoods — every node
    dies exactly once across all rounds, so total exchange volume is
    one node set plus the S-fold broadcast of it). Raises
    RuntimeError if max_rounds is hit with nodes still alive — a
    truncated MIS is not maximal. The per-shard dead filter is the
    documented O(n) memory trade; the refinement (neighbor-filtered
    retention per shard) is a slicing change, not a redesign.
    """
    if n_shards is None:
        try:
            n_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            n_shards = 8
    S = n_shards
    shards = [_MISShard.remote(i, S) for i in range(S)]

    def make_xy(batch: pa.Table):
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return (
            np.concatenate([uv[:, 0], uv[:, 1]]),
            np.concatenate([uv[:, 1], uv[:, 0]]),
        )

    n_pushed = _direct_push(edges, make_xy, shards, "add_edges")
    if n_pushed:
        ray.get([s.finalize_mis.remote() for s in shards])
        done = False
        for r in range(1, max_rounds + 1):
            deaths = [s.decide.remote(r) for s in shards]
            n_alive = sum(
                ray.get(
                    [s.apply_deaths.remote(*deaths) for s in shards]
                )
            )
            if n_alive == 0:
                done = True
                break
        if not done:
            for s in shards:
                ray.kill(s)
            raise RuntimeError(
                f"mis_indexed did not finish within max_rounds={max_rounds}"
            )
    out = ray.data.from_arrow_refs([s.mis_table.remote() for s in shards])
    out = out.materialize()
    for s in shards:
        ray.kill(s)
    return out
