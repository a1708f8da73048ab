"""Distributed connected components over a near-duplicate pair stream.

The last stage of corpus-scale fuzzy dedup: verified near-dup PAIRS
(MinHash / SimHash output) must become transitive CLUSTERS so exactly
one canonical document per cluster survives — A~B and B~C put A and C
in the same cluster even when A!~C. The reference deduplicates only
within single documents (tables per page), so this operator is part of
the corpus-scale extension surface (SURVEY.md §8.4), not a port.

Algorithm: hash-min label propagation. Every node starts labeled with
``min(self, neighbors)``; each round every node takes the min label
over itself and its neighbors; fixpoint in O(graph diameter) rounds
(near-dup graphs are clique-ish — diameter 1-3 in practice). Each
round is TWO coarse-bucket exchanges (the repo-wide pattern — see
functions/common.py):

  1. edges x labels cogroup on src-bucket  -> messages (dst, label)
  2. (messages ∪ labels) groupby node-bucket -> min label per node

Nothing is ever collected on the driver: per round the driver sees one
scalar (the label-sum convergence signal — labels are non-increasing,
so an unchanged sum IS the fixpoint). The edge set is materialized
once into the object store: it is candidate-pair-sized (dup-fraction x
corpus, two int64s per row), not corpus-sized, and re-deriving it from
the lazy LSH pipeline every round would re-run MinHash per round.

Only nodes that appear in >=1 pair are emitted; every other doc is a
singleton cluster by definition (callers treat absence as
``cluster_id == doc_id``), keeping the cluster state O(duplicates)
instead of O(corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .common import coalesce_for_exchange

__all__ = ["connected_components", "canonical_doc_ids", "pagerank", "hits", "triangle_count", "k_core", "cocitation_topk", "bfs_hops", "scc_members", "skipgram_pairs"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic coarse bucket for int64 node ids."""
    return (
        (ids.astype(np.uint64) * _MIX) % np.uint64(n_buckets)
    ).astype(np.int64)


# one aligned narrow schema for every exchange in this module:
# label rows are (key=node, payload=label, side=0);
# edge rows are  (key=src,  payload=dst,   side=1)
_STEP_SCHEMA = pa.schema(
    [
        pa.field("key", pa.int64()),
        pa.field("payload", pa.int64()),
        pa.field("side", pa.int8()),
        pa.field("bucket", pa.int64()),
    ]
)

CLUSTER_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("cluster_id", pa.int64())]
)


def _tag(ds: ray.data.Dataset, key: str, payload: str, side: int,
         n_buckets: int) -> ray.data.Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch[payload].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": k,
                "payload": p,
                "side": np.full(len(k), side, dtype=np.int8),
                "bucket": _bucket(k, n_buckets),
            },
            schema=_STEP_SCHEMA,
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def _min_payload_per_key(tagged: ray.data.Dataset) -> ray.data.Dataset:
    """(key=node, payload=label) rows -> Dataset[node, label] with the
    min label per node. Coarse-bucket exchange + in-bucket pandas."""

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("key", as_index=False)["payload"].min()
        return out.rename(columns={"key": "node", "payload": "label"})

    return (
        coalesce_for_exchange(tagged)
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def _label_sum(labels: ray.data.Dataset) -> int:
    """Scalar convergence signal; the driver sees one int per round
    (per-block partials, Python-int exact sum)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch["label"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(vals.sum())], pa.int64())})

    parts = labels.map_batches(partial, batch_format="pyarrow").take_all()
    return sum(int(r["s"]) for r in parts)


def connected_components(
    pairs: ray.data.Dataset,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 30,
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Cluster an undirected edge list; ``cluster_id`` is the min node
    id in each component. Returns Dataset[doc_id, cluster_id] covering
    every node that appears in an edge."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    # candidate-pair-sized, reused every round -> materialize once
    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(CLUSTER_SCHEMA.empty_table())

    # round 0 fused into initialization: label(v) = min(v, neighbors)
    init = _tag(edges, "src", "dst", side=0, n_buckets=n_buckets)
    self_rows = _tag(edges, "src", "src", side=0, n_buckets=n_buckets)
    labels = _min_payload_per_key(init.union(self_rows)).materialize()
    prev_sum = _label_sum(labels)

    def join_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        labs = group[group["side"] == 0][["key", "payload"]].rename(
            columns={"payload": "label"}
        )
        es = group[group["side"] == 1][["key", "payload"]]
        m = es.merge(labs, on="key", how="inner")
        # message: neighbor dst hears src's current label
        return pd.DataFrame(
            {
                "key": m["payload"].astype(np.int64),
                "payload": m["label"].astype(np.int64),
            }
        )

    def rebucket(batch: pa.Table) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": batch["key"].cast(pa.int64()),
                "payload": batch["payload"].cast(pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int8)),
                "bucket": pa.array(_bucket(k, n_buckets)),
            },
            schema=_STEP_SCHEMA,
        )

    for _ in range(max_iters):
        # exchange 1: edges x labels cogroup on src -> (dst, src_label)
        lab_t = _tag(labels, "node", "label", side=0, n_buckets=n_buckets)
        edge_t = _tag(edges, "src", "dst", side=1, n_buckets=n_buckets)
        messages = (
            coalesce_for_exchange(lab_t.union(edge_t))
            .groupby("bucket")
            .map_groups(join_in_bucket, batch_format="pandas")
        )

        # exchange 2: fold messages into labels, min per node
        msg_t = messages.map_batches(rebucket, batch_format="pyarrow")
        lab_self = _tag(labels, "node", "label", side=0, n_buckets=n_buckets)
        new_labels = _min_payload_per_key(msg_t.union(lab_self)).materialize()

        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:  # labels only decrease: fixpoint
            break
        prev_sum = new_sum

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["node"].cast(pa.int64()),
                "cluster_id": batch["label"].cast(pa.int64()),
            },
            schema=CLUSTER_SCHEMA,
        )

    return labels.map_batches(finalize, batch_format="pyarrow")


def canonical_doc_ids(
    doc_ids: ray.data.Dataset,
    clusters: ray.data.Dataset,
    id_col: str = "doc_id",
    n_buckets: int = 512,
) -> ray.data.Dataset:
    """Fuzzy-dedup survivor set: every id in ``doc_ids`` except
    non-canonical cluster members (``doc_id != cluster_id``).

    Bucketed cogroup ANTI-join on the id, mirroring
    ``dedup.incremental_dedup``: both sides shuffle narrow (id, side)
    rows keyed on a coarse id bucket — the drop side is O(duplicates)
    but is still joined distributed rather than broadcast, so a
    30%-dup crawl cannot blow a single node. Output: Dataset[doc_id].
    """

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": ids,
                "payload": ids,
                "side": np.zeros(len(ids), np.int8),
                "bucket": _bucket(ids, n_buckets),
            },
            schema=_STEP_SCHEMA,
        )

    def tag_drops(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pa.compute.not_equal(batch["doc_id"], batch["cluster_id"])
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": ids,
                "payload": ids,
                "side": np.ones(len(ids), np.int8),
                "bucket": _bucket(ids, n_buckets),
            },
            schema=_STEP_SCHEMA,
        )

    def anti(group: pd.DataFrame) -> pd.DataFrame:
        drop = set(group.loc[group["side"] == 1, "key"].tolist())
        keep = group[(group["side"] == 0) & (~group["key"].isin(drop))]
        return pd.DataFrame({"doc_id": keep["key"].astype(np.int64)})

    tagged = doc_ids.map_batches(tag_docs, batch_format="pyarrow").union(
        clusters.map_batches(tag_drops, batch_format="pyarrow")
    )
    return (
        coalesce_for_exchange(tagged)
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
    )


# ------------------------------------------------------------- pagerank

PAGERANK_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("rank_u", pa.int64())]
)


def pagerank(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    n_iters: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Link-graph PageRank in exact integer micro-units — the crawl
    curation signal (prioritize/weight pages by link authority).

    Semantics (all int64 floor arithmetic, so a SQL oracle replays
    every iteration bit for bit):

        r0(v)  = 1_000_000                       (1.0 in micro-units)
        r_k(v) = (100 - d) * 10_000
                 + (d * sum_{u->v} (r_{k-1}(u) // outdeg(u))) // 100

    with ``d = damping_pct``. Non-normalized form (base 0.15 per node);
    dangling-node mass leaks — the standard simplification, documented
    rather than silently wrong. Self-loops and duplicate edges are the
    caller's contract to remove.

    Distributed shape per iteration (the module's two-exchange label
    pattern, SUM instead of MIN): edges and current ranks cogroup on a
    coarse src bucket (every edge of a src lands with its rank row, so
    outdeg and contributions compute in-bucket, vectorized), then
    contributions and node markers cogroup on a dst bucket where the
    damped update applies. Ranks materialize per iteration (node-sized,
    object store — keeps the lineage chain flat); the driver holds
    nothing. Output: (doc_id, rank_u) for every node.
    """
    base = (100 - damping_pct) * 10_000

    # pagerank's exchange-1 rows carry a 5th column: the STATIC
    # out-degree, baked into the edge rows ONCE at setup (one extra
    # src-bucket exchange) instead of a groupby-transform recomputed
    # inside every iteration's contribs pass (VERDICT r03 #3)
    pr_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("payload", pa.int64()),
            ("deg", pa.int64()),
            ("side", pa.int8()),
            ("bucket", pa.int64()),
        ]
    )

    def tag_nodes_rank(ranks: ray.data.Dataset) -> ray.data.Dataset:
        def tag(batch: pa.Table) -> pa.Table:
            k = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "key": k,
                    "payload": p,
                    "deg": np.zeros(len(k), dtype=np.int64),
                    "side": np.full(len(k), 0, dtype=np.int8),
                    "bucket": _bucket(k, n_buckets),
                },
                schema=pr_schema,
            )

        return ranks.map_batches(tag, batch_format="pyarrow")

    def bake_deg(group: pd.DataFrame) -> pa.Table:
        deg = (
            group.groupby("key")["payload"].transform("size")
            .to_numpy(dtype=np.int64)
        )
        return pa.table(
            {
                "key": group["key"].to_numpy(dtype=np.int64),
                "payload": group["payload"].to_numpy(dtype=np.int64),
                "deg": deg,
                "side": np.ones(len(group), dtype=np.int8),
                "bucket": group["bucket"].to_numpy(dtype=np.int64),
            },
            schema=pr_schema,
        )

    edges_tagged = (
        coalesce_for_exchange(_tag(edges, src_col, dst_col, 1, n_buckets))
        .groupby("bucket")
        .map_groups(bake_deg, batch_format="pandas")
        .materialize()
    )

    def init_rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": ids,
                "label": np.full(len(ids), 1_000_000, dtype=np.int64),
            }
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()
    node_markers = _tag(
        ranks.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "zero": pa.array(
                        np.zeros(b.num_rows, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        "node", "zero", 0, n_buckets,
    ).materialize()

    def contribs(group: pd.DataFrame) -> pd.DataFrame:
        """src-bucket cogroup: rank // outdeg per src (outdeg baked in
        at setup), then an in-bucket SUM per dst so exchange 2 ships
        one row per (bucket, dst) instead of one per edge — the same
        total reaches apply_update (integer sum is associative), the
        volume drops by the in-bucket dst multiplicity, which is
        largest exactly where it matters (hot dsts)."""
        rk = group[group["side"] == 0]
        eg = group[group["side"] == 1]
        if eg.empty:
            return pd.DataFrame({"dst": [], "contrib": []}).astype(
                {"dst": "int64", "contrib": "int64"}
            )
        rmap = pd.Series(rk["payload"].to_numpy(), index=rk["key"].to_numpy())
        r = rmap.reindex(eg["key"].to_numpy()).fillna(0).to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {
                "dst": eg["payload"].to_numpy(dtype=np.int64),
                "contrib": r // eg["deg"].to_numpy(dtype=np.int64),
            }
        )
        return out.groupby("dst", as_index=False)["contrib"].sum()

    def apply_update(group: pd.DataFrame) -> pd.DataFrame:
        """dst-bucket cogroup: damped update over summed contributions;
        only rows with a node marker are emitted (edges into unknown
        ids drop, matching the oracle's join-from-nodes)."""
        marks = group[group["side"] == 0]
        msgs = group[group["side"] == 1]
        s = (
            msgs.groupby("key")["payload"].sum()
            if not msgs.empty
            else pd.Series(dtype="int64")
        )
        nodes_in = marks["key"].drop_duplicates().to_numpy(dtype=np.int64)
        c = s.reindex(nodes_in).fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "node": nodes_in,
                "label": base + (damping_pct * c) // 100,
            }
        )

    for _ in range(n_iters):
        msgs = (
            coalesce_for_exchange(
                tag_nodes_rank(ranks).union(edges_tagged)
            )
            .groupby("bucket")
            .map_groups(contribs, batch_format="pandas")
        )
        msgs_tagged = _tag(msgs, "dst", "contrib", 1, n_buckets)
        ranks = (
            coalesce_for_exchange(msgs_tagged.union(node_markers))
            .groupby("bucket")
            .map_groups(apply_update, batch_format="pandas")
        ).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["node"], "rank_u": batch["label"]},
            schema=PAGERANK_SCHEMA,
        )

    return ranks.map_batches(finish, batch_format="pyarrow")


def _label_max(labels: ray.data.Dataset) -> int:
    """Scalar max over (node, label) rows; the driver sees one int
    per round (per-block partials — same pattern as _label_sum)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch["label"].to_numpy(zero_copy_only=False)
        m = int(vals.max()) if len(vals) else 0
        return pa.table({"m": pa.array([m], pa.int64())})

    parts = labels.map_batches(partial, batch_format="pyarrow").take_all()
    return max((int(r["m"]) for r in parts), default=0)


HITS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("auth_u", pa.int64()),
        pa.field("hub_u", pa.int64()),
    ]
)


def hits(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    n_iters: int = 3,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Kleinberg HITS hubs & authorities in exact integer units — the
    companion signal to :func:`pagerank` (a page can be a poor
    authority but a good hub, and crawl curation wants both).

    Semantics (max-normalized variant, all-integer so a SQL oracle
    replays every iteration bit for bit; max-normalization preserves
    the ranking of any scalar normalization):

        hub_0(v)   = scale
        araw_k(v)  = sum_{u->v} hub_{k-1}(u)
        auth_k(v)  = araw_k(v) * scale // max_w araw_k(w)
        hraw_k(u)  = sum_{u->v} auth_k(v)
        hub_k(u)   = hraw_k(u) * scale // max_w hraw_k(w)

    Values stay in [0, scale] after each half-step. The in-bucket
    edge sums are vectorized int64 (safe while max in-degree *
    scale < 2^63); the node-sized normalize multiply runs in Python
    ints, so ``raw * scale`` never wraps regardless of graph size.
    Self-loops / duplicate edges are the caller's contract to remove.

    Distributed shape per iteration: FOUR coarse-bucket cogroup
    exchanges (value->edge gather + marker-sum, once per half-step)
    over the module's narrow (key, payload, side, bucket) schema, with
    the two edge orientations tagged and materialized ONCE at setup.
    The driver holds two ints per iteration (the maxima). Output:
    ``(doc_id, auth_u, hub_u)`` for every node after ``n_iters``.
    """
    edges_by_src = (
        coalesce_for_exchange(_tag(edges, src_col, dst_col, 1, n_buckets))
        .materialize()
    )
    edges_by_dst = (
        coalesce_for_exchange(_tag(edges, dst_col, src_col, 1, n_buckets))
        .materialize()
    )

    def init_vals(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": ids, "label": np.full(len(ids), scale, dtype=np.int64)}
        )

    hub = nodes.map_batches(init_vals, batch_format="pyarrow").materialize()
    node_markers = _tag(
        hub.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "zero": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "node", "zero", 0, n_buckets,
    ).materialize()

    def gather(group: pd.DataFrame) -> pd.DataFrame:
        """Endpoint-bucket cogroup: map each edge's tagged-key value
        onto the edge, pre-sum per target node in-bucket (one row per
        (bucket, target) crosses exchange 2, not one per edge)."""
        vals = group[group["side"] == 0]
        eg = group[group["side"] == 1]
        if eg.empty:
            return pd.DataFrame({"dst": [], "contrib": []}).astype(
                {"dst": "int64", "contrib": "int64"}
            )
        vmap = pd.Series(
            vals["payload"].to_numpy(), index=vals["key"].to_numpy()
        )
        v = vmap.reindex(eg["key"].to_numpy()).fillna(0).to_numpy(
            dtype=np.int64
        )
        out = pd.DataFrame(
            {"dst": eg["payload"].to_numpy(dtype=np.int64), "contrib": v}
        )
        return out.groupby("dst", as_index=False)["contrib"].sum()

    def apply_sum(group: pd.DataFrame) -> pd.DataFrame:
        """Node-bucket cogroup: summed contributions land on marker
        rows; nodes with no in-edges (this orientation) get 0."""
        marks = group[group["side"] == 0]
        msgs = group[group["side"] == 1]
        s = (
            msgs.groupby("key")["payload"].sum()
            if not msgs.empty
            else pd.Series(dtype="int64")
        )
        nodes_in = marks["key"].drop_duplicates().to_numpy(dtype=np.int64)
        raw = s.reindex(nodes_in).fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": nodes_in, "label": raw})

    def half_step(values: ray.data.Dataset,
                  tagged_edges: ray.data.Dataset) -> ray.data.Dataset:
        """values (node,label) -> raw sums over one edge orientation,
        normalized to [0, scale] by the global max."""
        msgs = (
            coalesce_for_exchange(
                _tag(values, "node", "label", 0, n_buckets).union(
                    tagged_edges
                )
            )
            .groupby("bucket")
            .map_groups(gather, batch_format="pandas")
        )
        raw = (
            coalesce_for_exchange(
                _tag(msgs, "dst", "contrib", 1, n_buckets).union(
                    node_markers
                )
            )
            .groupby("bucket")
            .map_groups(apply_sum, batch_format="pandas")
        ).materialize()
        mx = _label_max(raw)

        # raw <= mx globally, so when mx * scale fits in int64 the
        # whole batch normalizes as one numpy expression; the
        # Python-int path is the exact fallback for extreme in-degrees
        vec_safe = mx <= (2**63 - 1) // scale

        def normalize(batch: pa.Table) -> pa.Table:
            if not mx:
                lab = pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64), pa.int64()
                )
            elif vec_safe:
                v = batch["label"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                lab = pa.array(v * scale // mx, pa.int64())
            else:
                lab = pa.array(
                    [
                        int(v) * scale // mx
                        for v in batch["label"].to_pylist()
                    ],
                    pa.int64(),
                )
            return pa.table({"node": batch["node"], "label": lab})

        return raw.map_batches(
            normalize, batch_format="pyarrow"
        ).materialize()

    auth = hub  # placeholder for the zero-iteration degenerate call
    for _ in range(n_iters):
        auth = half_step(hub, edges_by_src)
        hub = half_step(auth, edges_by_dst)

    def tag_auth(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["node"],
                "payload": batch["label"],
                "side": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int8), pa.int8()
                ),
                "bucket": pa.array(
                    _bucket(
                        batch["node"].to_numpy(zero_copy_only=False).astype(
                            np.int64
                        ),
                        n_buckets,
                    )
                ),
            },
            schema=_STEP_SCHEMA,
        )

    def zip_scores(group: pd.DataFrame) -> pd.DataFrame:
        a = group[group["side"] == 0]
        h = group[group["side"] == 1]
        hmap = pd.Series(h["payload"].to_numpy(), index=h["key"].to_numpy())
        return pd.DataFrame(
            {
                "doc_id": a["key"].to_numpy(dtype=np.int64),
                "auth_u": a["payload"].to_numpy(dtype=np.int64),
                "hub_u": hmap.reindex(a["key"].to_numpy())
                .fillna(0)
                .to_numpy(dtype=np.int64),
            }
        )

    joined = (
        coalesce_for_exchange(
            auth.map_batches(tag_auth, batch_format="pyarrow").union(
                _tag(hub, "node", "label", 1, n_buckets)
            )
        )
        .groupby("bucket")
        .map_groups(zip_scores, batch_format="pandas")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "auth_u": batch["auth_u"],
                "hub_u": batch["hub_u"],
            },
            schema=HITS_SCHEMA,
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def triangle_count(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 128,
) -> ray.data.Dataset:
    """Exact global triangle count via the degree-oriented
    wedge-check algorithm (the MapReduce-era standard; e.g. Suri &
    Vassilvitskii 2011, public). One summary row:
    (n_edges, n_wedges, n_triangles).

    Plan (all exchanges are coarse-bucket cogroups; the driver never
    sees per-edge data):
      1. canonicalize to undirected (u < v), per-batch distinct, then
         one pair-bucket exchange for the global distinct edge set E;
      2. degree table from E (node-bucket sum), joined back onto E by
         u then by v (two cogroups) — degrees are corpus-sized, so
         they are NEVER broadcast;
      3. orient each edge from the (degree, id)-smaller endpoint to
         the larger: the orientation is acyclic, every triangle has
         exactly one apex with two out-edges, and max out-degree is
         O(sqrt(m)) — the wedge stream is O(m^1.5) worst case instead
         of sum(deg^2), which is what makes hub skew survivable;
      4. wedges: per apex, all (deg,id)-ordered out-neighbor pairs,
         keyed by the pair; matched against oriented edges in one
         final pair-bucket cogroup; per-bucket match counts sum to the
         triangle count.

    Every step is integer arithmetic on the edge set, so the SQL
    oracle replays it with the same orientation rule.
    """
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table(
            {
                "bucket": _bucket(uv[:, 0] * np.int64(1_000_003) + uv[:, 1],
                                  n_buckets),
                "u": uv[:, 0],
                "v": uv[:, 1],
            }
        )

    def distinct_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group[["u", "v"]].drop_duplicates()

    e = (
        coalesce_for_exchange(edges.map_batches(canon, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pandas")
        .materialize()  # E is reused by degrees + orientation + probe
    )

    # degree table: node-bucket sum over both endpoints
    def endpoints(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([u, v])
        return pa.table(
            {"bucket": _bucket(nodes, n_buckets), "node": nodes}
        )

    def degree_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby("node", as_index=False).size()
        return out.rename(columns={"size": "deg"})

    deg = (
        coalesce_for_exchange(e.map_batches(endpoints, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(degree_in_bucket, batch_format="pandas")
        .materialize()  # joined twice below
    )

    # one aligned narrow schema for the two degree-attach cogroups:
    # edge rows carry (key=endpoint, u, v, carry=previously attached
    # degree); deg rows carry (key=node, deg); sides never mix columns
    _ATTACH_SCHEMA = pa.schema(
        [
            pa.field("bucket", pa.int64()),
            pa.field("side", pa.int8()),
            pa.field("key", pa.int64()),
            pa.field("u", pa.int64()),
            pa.field("v", pa.int64()),
            pa.field("carry", pa.int64()),
            pa.field("deg", pa.int64()),
        ]
    )

    def _attach(es: ray.data.Dataset, key_col: str,
                carry_col: str | None) -> ray.data.Dataset:
        """Cogroup-join deg onto the edge stream by one endpoint;
        output (u, v, carry, deg) with deg = degree of key_col's
        endpoint and carry = the previous pass's degree (0 first)."""

        def tag_edge(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            zero = np.zeros(len(k), dtype=np.int64)
            carry = (
                batch[carry_col].to_numpy(zero_copy_only=False).astype(np.int64)
                if carry_col
                else zero
            )
            return pa.table(
                {
                    "bucket": _bucket(k, n_buckets),
                    "side": np.ones(len(k), dtype=np.int8),
                    "key": k,
                    "u": batch["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "v": batch["v"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "carry": carry,
                    "deg": zero,
                },
                schema=_ATTACH_SCHEMA,
            )

        def tag_deg(batch: pa.Table) -> pa.Table:
            k = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            zero = np.zeros(len(k), dtype=np.int64)
            return pa.table(
                {
                    "bucket": _bucket(k, n_buckets),
                    "side": np.zeros(len(k), dtype=np.int8),
                    "key": k,
                    "u": zero,
                    "v": zero,
                    "carry": zero,
                    "deg": batch["deg"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    ),
                },
                schema=_ATTACH_SCHEMA,
            )

        def join_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
            d = group.loc[group["side"] == 0, ["key", "deg"]]
            es_ = group.loc[group["side"] == 1, ["key", "u", "v", "carry"]]
            m = es_.merge(d, on="key", how="inner")
            return m[["u", "v", "carry", "deg"]]

        return (
            coalesce_for_exchange(
                es.map_batches(tag_edge, batch_format="pyarrow").union(
                    deg.map_batches(tag_deg, batch_format="pyarrow")
                )
            )
            .groupby("bucket")
            .map_groups(join_in_bucket, batch_format="pandas")
        )

    # pass 1 attaches deg(u) into `deg`; pass 2 moves it to `carry`
    # and attaches deg(v) into `deg`
    e2 = _attach(_attach(e, "u", None), "v", "deg")

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        du = batch["carry"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        u_first = (du < dv) | ((du == dv) & (u < v))
        tail = np.where(u_first, u, v)
        head = np.where(u_first, v, u)
        dhead = np.where(u_first, dv, du)
        return pa.table(
            {
                "bucket": _bucket(tail, n_buckets),
                "tail": tail,
                "head": head,
                "deg_head": dhead,
            }
        )

    oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, adj in group.groupby("tail", sort=False):
            if len(adj) < 2:
                continue
            # (deg, id)-sorted out-neighbors; wedge pair (b, c) keeps
            # the orientation order so the closing edge is b -> c
            adj = adj.sort_values(["deg_head", "head"])
            h = adj["head"].to_numpy(dtype=np.int64)
            i, j = np.triu_indices(len(h), k=1)
            outs.append(pd.DataFrame({"b": h[i], "c": h[j]}))
        if not outs:
            return pd.DataFrame({"b": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    wedges = (
        oriented.groupby("bucket")
        .map_groups(wedges_in_bucket, batch_format="pandas")
    )

    def tag_wedge(batch: pa.Table) -> pa.Table:
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": _bucket(b * np.int64(1_000_003) + c, n_buckets),
                "b": b,
                "c": c,
                "side": np.zeros(len(b), dtype=np.int8),
            }
        )

    def tag_closing(batch: pa.Table) -> pa.Table:
        t = batch["tail"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["head"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": _bucket(t * np.int64(1_000_003) + h, n_buckets),
                "b": t,
                "c": h,
                "side": np.ones(len(t), dtype=np.int8),
            }
        )

    def match_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        es_ = group.loc[group["side"] == 1, ["b", "c"]]
        ws = group.loc[group["side"] == 0, ["b", "c"]]
        n_tri = len(ws.merge(es_, on=["b", "c"], how="inner"))
        return pd.DataFrame(
            {
                "n_wedges": pd.Series([len(ws)], dtype=np.int64),
                "n_triangles": pd.Series([n_tri], dtype=np.int64),
            }
        )

    counts = (
        coalesce_for_exchange(
            wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
                oriented.map_batches(tag_closing, batch_format="pyarrow")
            )
        )
        .groupby("bucket")
        .map_groups(match_in_bucket, batch_format="pandas")
    )

    def edge_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    n_edges = sum(
        int(r["n"])
        for r in e.map_batches(edge_partial, batch_format="pyarrow").take_all()
    )
    agg = counts.groupby(None).aggregate(
        Sum("n_wedges", alias_name="n_wedges"),
        Sum("n_triangles", alias_name="n_triangles"),
    ).take_all()[0]
    return ray.data.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_wedges": pa.array([int(agg["n_wedges"])], pa.int64()),
                "n_triangles": pa.array([int(agg["n_triangles"])], pa.int64()),
            }
        )
    )


def k_core(
    edges: ray.data.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    n_buckets: int = 128,
) -> ray.data.Dataset:
    """Nodes of the k-core (the maximal subgraph where every node
    keeps degree >= k after iteratively peeling lower-degree nodes) —
    the classic web-graph density/spam-farm detector. Returns
    Dataset[doc_id, deg] with each survivor's final in-core degree.

    Peel loop: each round (a) keeps only edges whose BOTH endpoints
    survived the previous round — two aligned-schema bucket cogroups
    against the survivor set, which is corpus-sized and therefore
    never broadcast — then (b) recomputes degrees from the surviving
    edges and drops nodes under k. The edge set shrinks monotonically
    (it is carried forward, not recomputed from the original graph),
    so late rounds touch only the contested fringe. The driver sees
    one scalar per round (survivor count); convergence = a round that
    removes nobody. Raises RuntimeError if max_rounds is hit first —
    a truncated peel is NOT the k-core, so silence is not an option.

    SQL oracle: chained CTE replay of >= the same number of rounds
    (extra rounds past the fixpoint are no-ops, so any round count
    >= the operator's converged round count replays exactly).
    """

    def canon(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table(
            {
                "bucket": _bucket(uv[:, 0] * np.int64(1_000_003) + uv[:, 1],
                                  n_buckets),
                "u": uv[:, 0],
                "v": uv[:, 1],
            }
        )

    def distinct_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group[["u", "v"]].drop_duplicates()

    e = (
        coalesce_for_exchange(edges.map_batches(canon, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pandas")
        .materialize()
    )

    _FILT_SCHEMA = pa.schema(
        [
            pa.field("bucket", pa.int64()),
            pa.field("side", pa.int8()),
            pa.field("key", pa.int64()),
            pa.field("u", pa.int64()),
            pa.field("v", pa.int64()),
        ]
    )

    def _filter_by_alive(es: ray.data.Dataset, alive: ray.data.Dataset,
                         key_col: str) -> ray.data.Dataset:
        """Keep edges whose key_col endpoint is in the alive set
        (cogroup semi-join, aligned schema)."""

        def tag_edge(batch: pa.Table) -> pa.Table:
            kk = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "bucket": _bucket(kk, n_buckets),
                    "side": np.ones(len(kk), dtype=np.int8),
                    "key": kk,
                    "u": batch["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "v": batch["v"].to_numpy(zero_copy_only=False).astype(np.int64),
                },
                schema=_FILT_SCHEMA,
            )

        def tag_alive(batch: pa.Table) -> pa.Table:
            kk = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            z = np.zeros(len(kk), dtype=np.int64)
            return pa.table(
                {
                    "bucket": _bucket(kk, n_buckets),
                    "side": np.zeros(len(kk), dtype=np.int8),
                    "key": kk,
                    "u": z,
                    "v": z,
                },
                schema=_FILT_SCHEMA,
            )

        def semi_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
            ok = set(group.loc[group["side"] == 0, "key"])
            es_ = group.loc[group["side"] == 1]
            return es_.loc[es_["key"].isin(ok), ["u", "v"]]

        return (
            coalesce_for_exchange(
                es.map_batches(tag_edge, batch_format="pyarrow").union(
                    alive.map_batches(tag_alive, batch_format="pyarrow")
                )
            )
            .groupby("bucket")
            .map_groups(semi_in_bucket, batch_format="pandas")
        )

    def _degrees(es: ray.data.Dataset) -> ray.data.Dataset:
        def endpoints(batch: pa.Table) -> pa.Table:
            nodes = np.concatenate(
                [
                    batch["u"].to_numpy(zero_copy_only=False),
                    batch["v"].to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
            return pa.table(
                {"bucket": _bucket(nodes, n_buckets), "node": nodes}
            )

        def deg_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
            out = group.groupby("node", as_index=False).size()
            return out.rename(columns={"size": "deg"}).astype(np.int64)

        return (
            coalesce_for_exchange(
                es.map_batches(endpoints, batch_format="pyarrow")
            )
            .groupby("bucket")
            .map_groups(deg_in_bucket, batch_format="pandas")
        )

    def _count(ds_: ray.data.Dataset) -> int:
        def partial(batch: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        return sum(
            int(r["n"])
            for r in ds_.map_batches(partial, batch_format="pyarrow").take_all()
        )

    import pyarrow.compute as _pc

    deg = _degrees(e).materialize()
    alive = deg.map_batches(
        lambda b: b.filter(_pc.greater_equal(b["deg"], k)).select(["node"]),
        batch_format="pyarrow",
    ).materialize()
    n_alive = _count(alive)

    for _ in range(max_rounds):
        e = _filter_by_alive(
            _filter_by_alive(e, alive, "u"), alive, "v"
        ).materialize()
        deg = _degrees(e).materialize()
        alive = deg.map_batches(
            lambda b: b.filter(_pc.greater_equal(b["deg"], k)).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        n_now = _count(alive)
        if n_now == n_alive:
            out = deg.map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": b["node"].cast(pa.int64()),
                        "deg": b["deg"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            return out.map_batches(
                lambda b: b.filter(_pc.greater_equal(b["deg"], k)),
                batch_format="pyarrow",
            )
        n_alive = n_now

    raise RuntimeError(
        f"k_core did not converge within max_rounds={max_rounds}"
    )


def cocitation_topk(
    edges: ray.data.Dataset,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
    max_out: int = 4096,
    n_buckets: int = 128,
) -> ray.data.Dataset:
    """Top-k co-cited page pairs: (x, y, n_common) where n_common =
    number of distinct sources linking to BOTH x and y — the classic
    "related pages" / co-citation similarity over a web graph.
    Ordered by (n_common DESC, x ASC, y ASC), a total order.

    Shape: one src-bucket exchange groups each source's distinct
    out-links; the bucket task expands per-source neighbor pairs
    (C(outdeg, 2) — `max_out` drops hub sources whole, the documented
    skew cap, same contract as editdist.max_block) and pre-aggregates
    pair counts inside the bucket; one pair-bucket exchange sums the
    partials. The final top-k sorts the aggregated pair table (the
    operator's output domain, already far smaller than the wedge
    stream), not the corpus.
    """
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        sd = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        return pa.table(
            {
                "bucket": _bucket(sd[:, 0], n_buckets),
                "src": sd[:, 0],
                "dst": sd[:, 1],
            }
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """Per-source pair expansion WITHOUT a per-source Python loop:
        sorted-boundary span detection + size-class triu expansion
        (the allpairs._pair_indices pattern — the per-source
        DataFrame-per-group loop was the measured wall of the first
        cut, same lesson as cosine_pairs). Sorting by (src, dst)
        makes each span's dsts ascending, so (dsts[ia], dsts[ib])
        reproduces the original sorted-h orientation exactly."""
        from .allpairs import _pair_indices

        # distinct again: per-batch unique above doesn't dedup ACROSS
        # batches of the same source
        g = group[["src", "dst"]].drop_duplicates()
        g = g.sort_values(["src", "dst"], kind="mergesort")
        srcs = g["src"].to_numpy(np.int64)
        dsts = g["dst"].to_numpy(np.int64)
        empty = pd.DataFrame(
            {
                "x": pd.Series(dtype=np.int64),
                "y": pd.Series(dtype=np.int64),
                "n_common": pd.Series(dtype=np.int64),
            }
        )
        if not len(srcs):
            return empty
        bnd = np.flatnonzero(np.diff(srcs)) + 1
        starts = np.concatenate(([0], bnd))
        sizes = np.diff(np.concatenate((starts, [len(srcs)])))
        keep = (sizes >= 2) & (sizes <= max_out)
        starts, sizes = starts[keep], sizes[keep]
        if not len(starts):
            return empty
        ia, ib = _pair_indices(starts, sizes)
        out = (
            pd.DataFrame({"x": dsts[ia], "y": dsts[ib]})
            .groupby(["x", "y"], as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n_common"}).astype(np.int64)

    per_bucket = (
        coalesce_for_exchange(edges.map_batches(tag, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    def tag_pair(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pbucket": _bucket(x * np.int64(1_000_003) + y, n_buckets),
                "x": x,
                "y": y,
                "n_common": batch["n_common"].cast(pa.int64()),
            }
        )

    def sum_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(["x", "y"], as_index=False)["n_common"].sum()
        return out.astype(np.int64)

    pair_counts = (
        coalesce_for_exchange(
            per_bucket.map_batches(tag_pair, batch_format="pyarrow")
        )
        .groupby("pbucket")
        .map_groups(sum_in_bucket, batch_format="pandas")
    )
    return pair_counts.sort(
        ["n_common", "x", "y"], descending=[True, False, False]
    ).limit(k)


def bfs_hops(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    max_depth: int = 4,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Multi-source BFS hop distance: for every node reachable from the
    seed set within ``max_depth`` hops, its minimum hop count. The
    crawl-depth / seed-proximity signal of a frontier scheduler (how far
    a page sits from the trusted seed list).

    Level-synchronous frontier expansion, two coarse-bucket exchanges
    per level (the module-wide pattern):

      1. frontier x edges cogroup on src-bucket -> candidate dst set
         (deduped inside each bucket before it travels)
      2. candidates x visited cogroup on node-bucket -> anti-join: a
         candidate never seen before is a first visit, i.e. its minimum
         hop distance is exactly this level

    The visited set is re-exchanged once per level; with bounded depth
    (crawl frontiers use 3-6) that is ``max_depth`` narrow-row shuffles
    of O(reachable) rows, and the loop exits early when a level yields
    no new nodes (the driver sees one scalar per level). Nothing is
    collected on the driver.

    ``edges``: Dataset[src, dst] (int64); ``seeds``: Dataset[node].
    Returns Dataset[node, hops] with hops in [0, max_depth].
    """
    edges = edges.materialize()

    def seed_rows(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": n, "hops": np.zeros(len(n), np.int64)}
        )

    visited = seeds.map_batches(
        seed_rows, batch_format="pyarrow"
    ).materialize()
    frontier = visited

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        fr = group[group["side"] == 0][["key"]].drop_duplicates()
        es = group[group["side"] == 1][["key", "payload"]]
        dst = es.merge(fr, on="key")["payload"].unique()
        return pd.DataFrame({"node": dst.astype(np.int64)})

    for depth in range(1, max_depth + 1):
        f_t = _tag(frontier, "node", "node", side=0, n_buckets=n_buckets)
        e_t = _tag(edges, "src", "dst", side=1, n_buckets=n_buckets)
        candidates = (
            coalesce_for_exchange(f_t.union(e_t))
            .groupby("bucket")
            .map_groups(expand, batch_format="pandas")
        )

        def first_visits(group: pd.DataFrame, d: int = depth) -> pd.DataFrame:
            seen = group[group["side"] == 0]["key"].to_numpy(np.int64)
            cand = group[group["side"] == 1]["key"].to_numpy(np.int64)
            new = np.setdiff1d(np.unique(cand), seen)
            return pd.DataFrame(
                {"node": new, "hops": np.full(len(new), d, np.int64)}
            )

        v_t = _tag(visited, "node", "hops", side=0, n_buckets=n_buckets)
        c_t = _tag(candidates, "node", "node", side=1, n_buckets=n_buckets)
        new_nodes = (
            coalesce_for_exchange(v_t.union(c_t))
            .groupby("bucket")
            .map_groups(first_visits, batch_format="pandas")
        ).materialize()

        if new_nodes.count() == 0:
            break
        visited = visited.union(new_nodes).materialize()
        frontier = new_nodes

    return visited


def scc_members(
    edges: ray.data.Dataset,
    seed: int,
    max_depth: int = 256,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Strongly connected component containing ``seed`` — the
    forward-backward (FW-BW) reachability method, the standard
    distributed SCC primitive (Tarjan's stack does not distribute):
    SCC(seed) = reach(seed, E) INTERSECT reach(seed, E-reversed).

    Both closures run level-synchronous BFS with early exit (cost =
    component diameter, not ``max_depth``); the intersection is one
    coarse-bucket cogroup over the two O(reachable) node sets —
    nothing meets the driver. Returns Dataset[node].

    ``max_depth`` is a safety bound; BFS stops as soon as a level adds
    no nodes, so the bound only matters for pathological path-graph
    diameters.
    """
    fwd = bfs_hops(
        edges, ray.data.from_items([{"node": int(seed)}]),
        max_depth=max_depth, n_buckets=n_buckets,
    )

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"]})

    bwd = bfs_hops(
        edges.map_batches(swap, batch_format="pyarrow"),
        ray.data.from_items([{"node": int(seed)}]),
        max_depth=max_depth, n_buckets=n_buckets,
    )

    f_t = _tag(fwd, "node", "node", side=0, n_buckets=n_buckets)
    b_t = _tag(bwd, "node", "node", side=1, n_buckets=n_buckets)

    def intersect(group: pd.DataFrame) -> pd.DataFrame:
        f = group[group["side"] == 0]["key"].to_numpy(np.int64)
        b = group[group["side"] == 1]["key"].to_numpy(np.int64)
        both = np.intersect1d(np.unique(f), np.unique(b))
        return pd.DataFrame({"node": both})

    return (
        coalesce_for_exchange(f_t.union(b_t))
        .groupby("bucket")
        .map_groups(intersect, batch_format="pandas")
    )


def skipgram_pairs(
    walks: ray.data.Dataset,
    window: int = 2,
    n_buckets: int = 128,
) -> ray.data.Dataset:
    """Skip-gram (center, context, n_pairs) counts over a walk corpus
    — the DeepWalk/word2vec training-pair extraction step, applied to
    ``random_walks_indexed`` output (start, walk, step, node). A
    center at step s pairs with every position at step s±d for
    1 <= d <= window within the SAME walk.

    Shape: one (start, walk)-bucket exchange groups each walk's
    positions (a walk is at most walk_len rows, so buckets stay
    balanced); the bucket task sorts by step and emits pairs with an
    offset-d sweep (both directions) pre-aggregated per bucket, then
    one pair-bucket exchange sums the partials — the module-standard
    two-exchange aggregate, never materializing the raw pair stream
    driver-side.
    """

    def tag(batch: pa.Table) -> pa.Table:
        s = batch["start"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["walk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": _bucket(s * np.int64(1_000_003) + w, n_buckets),
                "start": s,
                "walk": w,
                "step": batch["step"].cast(pa.int64()),
                "node": batch["node"].cast(pa.int64()),
            }
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["start", "walk", "step"], kind="mergesort")
        sw = (
            g["start"].to_numpy(np.int64) * np.int64(1_000_003)
            + g["walk"].to_numpy(np.int64)
        )
        st = g["step"].to_numpy(np.int64)
        nd = g["node"].to_numpy(np.int64)
        cs, xs = [], []
        for d in range(1, window + 1):
            if d >= len(nd):
                break
            same = (sw[:-d] == sw[d:]) & (st[:-d] + d == st[d:])
            p = np.flatnonzero(same)
            if not len(p):
                continue
            # both directions: (center, later context) and the mirror
            cs.append(nd[p])
            xs.append(nd[p + d])
            cs.append(nd[p + d])
            xs.append(nd[p])
        if not cs:
            return pd.DataFrame(
                {
                    "center": pd.Series(dtype=np.int64),
                    "context": pd.Series(dtype=np.int64),
                    "n_pairs": pd.Series(dtype=np.int64),
                }
            )
        out = (
            pd.DataFrame(
                {"center": np.concatenate(cs), "context": np.concatenate(xs)}
            )
            .groupby(["center", "context"], as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n_pairs"}).astype(np.int64)

    per_bucket = (
        coalesce_for_exchange(walks.map_batches(tag, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    def tag_pair(batch: pa.Table) -> pa.Table:
        c = batch["center"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch["context"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pbucket": _bucket(c * np.int64(1_000_003) + x, n_buckets),
                "center": c,
                "context": x,
                "n_pairs": batch["n_pairs"].cast(pa.int64()),
            }
        )

    def sum_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(["center", "context"], as_index=False)[
            "n_pairs"
        ].sum()
        return out.astype(np.int64)

    return (
        coalesce_for_exchange(
            per_bucket.map_batches(tag_pair, batch_format="pyarrow")
        )
        .groupby("pbucket")
        .map_groups(sum_in_bucket, batch_format="pandas")
    )
