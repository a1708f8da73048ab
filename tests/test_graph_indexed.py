"""Actor-sharded BFS/SCC vs the Dataset-cogroup implementations: the
two engines must agree exactly (same min-hop fold, same membership) on
random graphs, and the shard index must handle empty shards, self
loops, and unreachable seeds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from pdf_extractor_ray.functions.graph import bfs_hops, scc_members
from pdf_extractor_ray.functions.graph_indexed import (
    bfs_hops_indexed,
    scc_members_indexed,
)


def _canon(df):
    return (
        df.astype({"node": "int64"})
        .sort_values(df.columns.tolist())
        .reset_index(drop=True)
    )


def test_bfs_engines_agree_random(ray_session):
    rng = np.random.RandomState(11)
    edges = pd.DataFrame(
        {"src": rng.randint(0, 300, 1500), "dst": rng.randint(0, 300, 1500)}
    )
    seeds = ray.data.from_items([{"node": 3}, {"node": 250}])
    a = bfs_hops(
        ray.data.from_pandas(edges), seeds, max_depth=5
    ).to_pandas()
    b = bfs_hops_indexed(
        ray.data.from_pandas(edges), seeds, max_depth=5
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(a), _canon(b), check_dtype=False
    )


def test_scc_engines_agree_random(ray_session):
    rng = np.random.RandomState(5)
    edges = pd.DataFrame(
        {"src": rng.randint(0, 200, 900), "dst": rng.randint(0, 200, 900)}
    )
    a = scc_members(ray.data.from_pandas(edges), seed=0).to_pandas()
    b = scc_members_indexed(ray.data.from_pandas(edges), seed=0).to_pandas()
    assert sorted(a["node"]) == sorted(b["node"])


def test_indexed_unreachable_seed_and_self_loop(ray_session):
    # 9 has only a self loop; 0->1 one-way: SCC(0) == {0}
    edges = pd.DataFrame({"src": [0, 9], "dst": [1, 9]})
    scc0 = scc_members_indexed(
        ray.data.from_pandas(edges), seed=0, n_shards=4
    ).to_pandas()
    assert sorted(scc0["node"]) == [0]
    scc9 = scc_members_indexed(
        ray.data.from_pandas(edges), seed=9, n_shards=4
    ).to_pandas()
    assert sorted(scc9["node"]) == [9]


def test_indexed_hop_minimality(ray_session):
    # diamond: 0->1->3, 0->2->3, and a long way 0->4->5->3;
    # hops(3) must be 2, not 3
    edges = pd.DataFrame(
        {"src": [0, 1, 0, 2, 0, 4, 5], "dst": [1, 3, 2, 3, 4, 5, 3]}
    )
    out = bfs_hops_indexed(
        ray.data.from_pandas(edges),
        ray.data.from_items([{"node": 0}]),
        n_shards=4,
    ).to_pandas()
    hops = dict(zip(out["node"], out["hops"]))
    assert hops == {0: 0, 1: 1, 2: 1, 4: 1, 3: 2, 5: 2}


def test_pagerank_engines_bit_exact(ray_session):
    from pdf_extractor_ray.functions.graph import pagerank
    from pdf_extractor_ray.functions.graph_indexed import pagerank_indexed

    rng = np.random.RandomState(2)
    edges = pd.DataFrame(
        {"src": rng.randint(0, 150, 800), "dst": rng.randint(0, 150, 800)}
    )
    edges = edges[edges.src != edges.dst].drop_duplicates()
    nodes = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64)})
    a = (
        pagerank(ray.data.from_pandas(edges), ray.data.from_pandas(nodes),
                 n_iters=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pagerank_indexed(ray.data.from_pandas(edges),
                         ray.data.from_pandas(nodes), n_iters=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes))


def test_pagerank_indexed_unknown_src_dst(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import pagerank_indexed

    # src 99 not in universe -> contributes rank 0; dst 98 not in
    # universe -> dropped. Node 2 has no in-edges -> pure base.
    edges = pd.DataFrame({"src": [0, 99, 1], "dst": [1, 1, 98]})
    nodes = pd.DataFrame({"doc_id": np.array([0, 1, 2], np.int64)})
    out = (
        pagerank_indexed(ray.data.from_pandas(edges),
                         ray.data.from_pandas(nodes),
                         n_iters=1, n_shards=4)
        .to_pandas().set_index("doc_id")["rank_u"]
    )
    base = 150_000
    assert out[0] == base and out[2] == base
    # node 1 receives rank(0)//1 = 1_000_000 (99 contributes 0)
    assert out[1] == base + (85 * 1_000_000) // 100
    assert 98 not in out.index and 99 not in out.index


def test_cc_engines_agree_random(ray_session):
    from pdf_extractor_ray.functions.graph import connected_components
    from pdf_extractor_ray.functions.graph_indexed import (
        connected_components_indexed,
    )

    rng = np.random.RandomState(4)
    pairs = pd.DataFrame(
        {"doc_a": rng.randint(0, 400, 300), "doc_b": rng.randint(0, 400, 300)}
    )
    a = (
        connected_components(ray.data.from_pandas(pairs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        connected_components_indexed(ray.data.from_pandas(pairs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes))


def test_cc_indexed_chain_and_empty(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import (
        connected_components_indexed,
    )

    # long path 0-1-2-...-9 needs hash-min to propagate across rounds
    pairs = pd.DataFrame({"doc_a": range(9), "doc_b": range(1, 10)})
    out = (
        connected_components_indexed(
            ray.data.from_pandas(pairs), n_shards=4
        ).to_pandas()
    )
    assert sorted(out["doc_id"]) == list(range(10))
    assert set(out["cluster_id"]) == {0}
    empty = connected_components_indexed(
        ray.data.from_pandas(pd.DataFrame({"doc_a": [], "doc_b": []}))
    ).to_pandas()
    # ray's to_pandas drops column names on a fully-empty dataset;
    # the row-count contract is what both engines guarantee
    assert len(empty) == 0


def test_hits_engines_bit_exact(ray_session):
    from pdf_extractor_ray.functions.graph import hits
    from pdf_extractor_ray.functions.graph_indexed import hits_indexed

    rng = np.random.RandomState(9)
    edges = pd.DataFrame(
        {"src": rng.randint(0, 120, 700), "dst": rng.randint(0, 120, 700)}
    )
    edges = edges[edges.src != edges.dst].drop_duplicates()
    nodes = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64)})
    a = (
        hits(ray.data.from_pandas(edges), ray.data.from_pandas(nodes),
             n_iters=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        hits_indexed(ray.data.from_pandas(edges),
                     ray.data.from_pandas(nodes), n_iters=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a, b[a.columns.tolist()].astype({c: a[c].dtype for c in a.columns})
    )


def test_personalized_pagerank_teleports_only_to_seeds(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import pagerank_indexed

    # star: seeds {0}; node 2 unreachable from 0 -> rank exactly 0
    edges = pd.DataFrame({"src": [0, 1], "dst": [1, 0]})
    nodes = pd.DataFrame({"doc_id": np.array([0, 1, 2], np.int64)})
    seeds = ray.data.from_items([{"node": 0}])
    out = (
        pagerank_indexed(ray.data.from_pandas(edges),
                         ray.data.from_pandas(nodes),
                         n_iters=2, n_shards=4, seeds=seeds)
        .to_pandas().set_index("doc_id")["rank_u"]
    )
    assert out[2] == 0                      # no teleport, no paths
    assert out[0] > out[1] > 0              # seed holds the base mass
    # iteration replay: r1(1) = 0 + 85*(1_000_000//1)//100
    # r1(0) = 150_000 + 0 (node 1 starts at rank 0)
    # r2(0) = 150_000 + 85*(850_000//1)//100 = 872_500
    assert out[0] == 872_500


def test_sssp_hand_graph(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import sssp_indexed

    # 0 -5-> 1 -1-> 2 ; 0 -3-> 2 direct: dist(2) = 3 (not 6)
    # 3 is dst-only, owned by a shard that holds no edges for it
    edges = pd.DataFrame(
        {"src": [0, 1, 0, 2], "dst": [1, 2, 2, 3], "w": [5, 1, 3, 10]}
    )
    out = (
        sssp_indexed(ray.data.from_pandas(edges), seed=0, n_shards=4)
        .to_pandas().set_index("node")["dist"]
    )
    assert dict(out) == {0: 0, 1: 5, 2: 3, 3: 13}


def test_sssp_round_budget_truncates(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import sssp_indexed

    # path 0->1->2->3, one round only reaches node 1
    edges = pd.DataFrame(
        {"src": [0, 1, 2], "dst": [1, 2, 3], "w": [1, 1, 1]}
    )
    out = (
        sssp_indexed(ray.data.from_pandas(edges), seed=0,
                     max_rounds=1, n_shards=4)
        .to_pandas().set_index("node")["dist"]
    )
    assert dict(out) == {0: 0, 1: 1}


def test_triangles_indexed_matches_cogroup_engine(ray_session):
    from pdf_extractor_ray.functions.graph import triangle_count
    from pdf_extractor_ray.functions.graph_indexed import (
        triangle_count_indexed,
    )

    rng = np.random.default_rng(7)
    for n, m in [(40, 250), (300, 1500)]:
        edges = pd.DataFrame(
            {"src": rng.integers(0, n, m), "dst": rng.integers(0, n, m)}
        )
        a = triangle_count(ray.data.from_pandas(edges)).to_pandas()
        b = triangle_count_indexed(
            ray.data.from_pandas(edges), n_shards=4
        ).to_pandas()
        assert a.equals(b)


def test_triangles_indexed_known_graph(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import (
        triangle_count_indexed,
    )

    # K4 has 4 triangles, 6 edges; wedge stream under the (deg, id)
    # orientation: every node has deg 3, out-degrees are 3/2/1/0 ->
    # wedges C(3,2)+C(2,2) = 4, all of which close
    edges = pd.DataFrame(
        {"src": [0, 0, 0, 1, 1, 2], "dst": [1, 2, 3, 2, 3, 3]}
    )
    out = triangle_count_indexed(
        ray.data.from_pandas(edges), n_shards=4
    ).to_pandas()
    assert out.iloc[0].tolist() == [6, 4, 4]


def test_triangles_indexed_dup_and_selfloop_input(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import (
        triangle_count_indexed,
    )

    # duplicated directed edges + self-loops collapse to one triangle
    edges = pd.DataFrame(
        {
            "src": [0, 1, 0, 1, 2, 2, 5],
            "dst": [1, 0, 2, 2, 0, 2, 5],
        }
    )
    out = triangle_count_indexed(
        ray.data.from_pandas(edges), n_shards=4
    ).to_pandas()
    assert out.iloc[0].tolist() == [3, 1, 1]


def test_kcore_indexed_matches_cogroup_engine(ray_session):
    from pdf_extractor_ray.functions.graph import k_core
    from pdf_extractor_ray.functions.graph_indexed import k_core_indexed

    rng = np.random.default_rng(13)
    for n, m, k in [(60, 400, 3), (300, 2500, 4)]:
        edges = pd.DataFrame(
            {"src": rng.integers(0, n, m), "dst": rng.integers(0, n, m)}
        )
        a = (
            k_core(ray.data.from_pandas(edges), k=k)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            k_core_indexed(ray.data.from_pandas(edges), k=k, n_shards=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))


def test_kcore_indexed_known_graph(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import k_core_indexed

    # K5 (all deg 4) + a pendant chain off node 0: 2-core = the K5,
    # chain peels over multiple cascade rounds
    k5s, k5d = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            k5s.append(i)
            k5d.append(j)
    edges = pd.DataFrame(
        {"src": k5s + [0, 10, 11], "dst": k5d + [10, 11, 12]}
    )
    out = (
        k_core_indexed(ray.data.from_pandas(edges), k=2, n_shards=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert out["deg"].tolist() == [4, 4, 4, 4, 4]


def test_kcore_indexed_empty_core(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import k_core_indexed

    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})  # path
    out = k_core_indexed(
        ray.data.from_pandas(edges), k=3, n_shards=4
    ).to_pandas()
    assert len(out) == 0


def test_random_walks_known_graph_and_sinks(ray_session):
    import hashlib
    from pdf_extractor_ray.functions.graph_indexed import (
        random_walks_indexed,
    )

    # 0 -> {1, 2}, 1 -> {2}; 2 is a sink: walks end there
    edges = pd.DataFrame({"src": [0, 0, 1, 0], "dst": [1, 2, 2, 1]})
    out = (
        random_walks_indexed(
            ray.data.from_pandas(edges),
            walk_len=4,
            walks_per_node=1,
            n_shards=4,
        )
        .to_pandas()
        .sort_values(["start", "walk", "step"])
        .reset_index(drop=True)
    )

    def h(v, t, w):
        return int(hashlib.md5(f"{v}:{t}:{w}".encode()).hexdigest()[:8], 16)

    # replay by hand: start 0 at step1 picks rank h(0,1,0)%2 of [1,2]
    adj = {0: [1, 2], 1: [2]}
    want = []
    for s in (0, 1):
        v = s
        want.append((s, 0, 0, v))
        for t in range(1, 4):
            if v not in adj:
                break
            v = adj[v][h(v, t, 0) % len(adj[v])]
            want.append((s, 0, t, v))
    want_df = (
        pd.DataFrame(want, columns=["start", "walk", "step", "node"])
        .sort_values(["start", "walk", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["start", "walk", "step", "node"]].astype("int64"),
        want_df.astype("int64"),
    )
    # every walk that reached the sink stopped there
    assert (out.groupby(["start", "walk"])["step"].max() <= 3).all()


def test_random_walks_multi_walk_and_dup_edges(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import (
        random_walks_indexed,
    )

    # duplicate directed edges + self-loops collapse before ranking
    edges = pd.DataFrame(
        {"src": [0, 0, 0, 0, 1, 2], "dst": [1, 1, 2, 0, 0, 0]}
    )
    out = random_walks_indexed(
        ray.data.from_pandas(edges),
        walk_len=5,
        walks_per_node=3,
        n_shards=4,
    ).to_pandas()
    # 3 sources x 3 walks x step0 rows present
    z = out[out["step"] == 0]
    assert len(z) == 9
    # strongly connected: every walk runs the full length
    assert len(out) == 9 * 5
    # walks are deterministic: rerun is identical
    out2 = random_walks_indexed(
        ray.data.from_pandas(edges),
        walk_len=5,
        walks_per_node=3,
        n_shards=4,
    ).to_pandas()
    key = ["start", "walk", "step", "node"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True)[key],
        out2.sort_values(key).reset_index(drop=True)[key],
    )


def test_skipgram_pairs_hand_window(ray_session):
    from pdf_extractor_ray.functions.graph import skipgram_pairs

    # one walk 10->11->12->13, one walk 20->21 (different start)
    rows = [
        {"start": 10, "walk": 0, "step": 0, "node": 10},
        {"start": 10, "walk": 0, "step": 1, "node": 11},
        {"start": 10, "walk": 0, "step": 2, "node": 12},
        {"start": 10, "walk": 0, "step": 3, "node": 13},
        {"start": 20, "walk": 0, "step": 0, "node": 20},
        {"start": 20, "walk": 0, "step": 1, "node": 21},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = skipgram_pairs(ds, window=2).to_pandas()
    got = {
        (r.center, r.context): r.n_pairs for r in out.itertuples()
    }
    # walk 1: d=1 pairs (10,11),(11,12),(12,13) + mirrors;
    # d=2 pairs (10,12),(11,13) + mirrors; walk 2: (20,21)+(21,20);
    # no cross-walk pairs
    assert got[(10, 11)] == 1 and got[(11, 10)] == 1
    assert got[(10, 12)] == 1 and got[(12, 10)] == 1
    assert got[(20, 21)] == 1 and got[(21, 20)] == 1
    assert (10, 13) not in got and (10, 20) not in got
    # 3 d=1 pairs + 2 d=2 pairs in walk 1, 1 d=1 pair in walk 2,
    # each in both directions
    assert len(got) == 12
    assert all(v == 1 for v in got.values())


def test_lpa_communities_barbell(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import (
        lpa_communities_indexed,
    )

    # two triangles bridged at 2-10: LPA separates them; hand-replay
    # of the 3 synchronous rounds (ties -> smaller label) gives
    # {0,1,2} -> 0 and {10,11,12} -> 2
    edges = pd.DataFrame(
        {
            "src": [0, 1, 2, 10, 11, 12, 2],
            "dst": [1, 2, 0, 11, 12, 10, 10],
        }
    )
    out = lpa_communities_indexed(
        ray.data.from_pandas(edges), n_iters=3, n_shards=4
    ).to_pandas()
    got = dict(zip(out["node"], out["community"]))
    assert got == {0: 0, 1: 0, 2: 0, 10: 2, 11: 2, 12: 2}


def test_lpa_communities_deterministic(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import (
        lpa_communities_indexed,
    )

    rng = np.random.default_rng(23)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 200, 1200), "dst": rng.integers(0, 200, 1200)}
    )
    a = (
        lpa_communities_indexed(ray.data.from_pandas(edges), n_shards=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        lpa_communities_indexed(ray.data.from_pandas(edges), n_shards=7)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    # shard count must not change the result
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))


def test_mis_independence_and_maximality(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import mis_indexed

    rng = np.random.default_rng(31)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 300, 1800), "dst": rng.integers(0, 300, 1800)}
    )
    out = mis_indexed(
        ray.data.from_pandas(edges), max_rounds=20, n_shards=4
    ).to_pandas()
    mis = set(out["node"])
    # undirected distinct adjacency
    e = edges[edges.src != edges.dst]
    adj: dict[int, set] = {}
    for s, d in zip(e["src"], e["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    # independence: no two MIS members adjacent
    for v in mis:
        assert not (adj.get(v, set()) & mis), v
    # maximality: every non-member has a MIS neighbor
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, v


def test_mis_shard_invariance(ray_session):
    from pdf_extractor_ray.functions.graph_indexed import mis_indexed

    rng = np.random.default_rng(37)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 150, 700), "dst": rng.integers(0, 150, 700)}
    )
    key = ["node", "round"]
    a = (
        mis_indexed(ray.data.from_pandas(edges), max_rounds=20, n_shards=3)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        mis_indexed(ray.data.from_pandas(edges), max_rounds=20, n_shards=8)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))
