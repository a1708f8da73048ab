"""connected_components / canonical_doc_ids (functions/graph.py)."""

import random

import pandas as pd
import pytest


def _cc(ray, edges, **kw):
    import pyarrow as pa

    from pdf_extractor_ray.functions.graph import connected_components

    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    out = connected_components(ray.data.from_arrow(tbl), **kw).to_pandas()
    return dict(zip(out["doc_id"], out["cluster_id"]))


def _brute(edges):
    """Union-find ground truth (min-id representative)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


class TestConnectedComponents:
    def test_chain_is_transitive(self, ray_session):
        got = _cc(ray_session, [(1, 2), (2, 3), (5, 6)])
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    def test_long_path_worst_case_diameter(self, ray_session):
        # a 12-node path with the min id at the FAR end exercises the
        # propagation loop (needs ~diameter rounds, not 1)
        ids = list(range(11, -1, -1))
        edges = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
        got = _cc(ray_session, edges)
        assert got == {i: 0 for i in range(12)}

    def test_matches_union_find_on_random_graph(self, ray_session):
        rng = random.Random(42)
        nodes = rng.sample(range(10_000), 120)
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(ray_session, edges) == _brute(edges)

    def test_empty_pairs(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.graph import connected_components

        empty = ray_session.data.from_arrow(
            pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        )
        out = connected_components(empty)
        assert out.count() == 0
        # pandas conversion of a 0-row dataset drops columns; the
        # Dataset schema is the contract
        assert out.schema().names == ["doc_id", "cluster_id"]

    def test_deterministic(self, ray_session):
        edges = [(1, 5), (5, 9), (2, 4), (9, 13), (20, 21)]
        assert _cc(ray_session, edges) == _cc(ray_session, edges)

    def test_duplicate_and_reversed_edges_are_harmless(self, ray_session):
        got = _cc(ray_session, [(2, 1), (1, 2), (2, 1), (3, 2)])
        assert got == {1: 1, 2: 1, 3: 1}


class TestCanonicalDocIds:
    def test_survivors_are_all_minus_noncanonical(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.graph import (
            canonical_doc_ids,
            connected_components,
        )

        ray = ray_session
        edges = pa.table(
            {"doc_a": pa.array([1, 2, 7], pa.int64()),
             "doc_b": pa.array([2, 3, 8], pa.int64())}
        )
        clusters = connected_components(ray.data.from_arrow(edges))
        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(list(range(10)), pa.int64())})
        )
        out = canonical_doc_ids(docs, clusters).to_pandas()
        # {1,2,3} keeps 1; {7,8} keeps 7; everything else survives
        assert sorted(out["doc_id"]) == [0, 1, 4, 5, 6, 7, 9]

    def test_no_clusters_keeps_everything(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.graph import (
            CLUSTER_SCHEMA,
            canonical_doc_ids,
        )

        ray = ray_session
        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([3, 1, 2], pa.int64())})
        )
        clusters = ray.data.from_arrow(CLUSTER_SCHEMA.empty_table())
        out = canonical_doc_ids(docs, clusters).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2, 3]


class TestPageRank:
    def _numpy_reference(self, edges, n, iters=5):
        import numpy as np

        deg = np.zeros(n, dtype=np.int64)
        for s, _ in edges:
            deg[s] += 1
        r = np.full(n, 1_000_000, dtype=np.int64)
        for _ in range(iters):
            c = np.zeros(n, dtype=np.int64)
            for s, d in edges:
                c[d] += r[s] // deg[s]
            r = 150_000 + (85 * c) // 100
        return r

    def test_matches_integer_reference_on_random_graph(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from pdf_extractor_ray.functions.graph import pagerank

        rng = np.random.RandomState(11)
        n = 120
        edges = sorted(
            {
                (int(s), int(d))
                for s, d in rng.randint(0, n, size=(400, 2))
                if s != d
            }
        )
        e_ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        ).repartition(6)
        n_ds = ray_session.data.from_arrow(
            pa.table({"doc_id": pa.array(list(range(n)), pa.int64())})
        ).repartition(4)
        out = (
            pagerank(e_ds, n_ds, n_iters=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._numpy_reference(edges, n)
        assert out["doc_id"].tolist() == list(range(n))
        assert out["rank_u"].tolist() == want.tolist()

    def test_sink_node_gets_base_only(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.graph import pagerank

        # 0 -> 1, 2 isolated: node 2 ends at the damped fixpoint of the
        # base term; node 0 receives nothing
        e_ds = ray_session.data.from_arrow(
            pa.table({"src": pa.array([0], pa.int64()),
                      "dst": pa.array([1], pa.int64())})
        )
        n_ds = ray_session.data.from_arrow(
            pa.table({"doc_id": pa.array([0, 1, 2], pa.int64())})
        )
        out = (
            pagerank(e_ds, n_ds, n_iters=3)
            .to_pandas()
            .set_index("doc_id")["rank_u"]
        )
        # r(0): no in-links -> base after iter 1 and stays
        assert out[0] == 150_000
        assert out[2] == 150_000
        # r(1): base + 85% of r(0) each round
        r0_hist = [1_000_000, 150_000, 150_000]
        want = 1_000_000
        for k in range(3):
            want = 150_000 + (85 * (r0_hist[k] // 1)) // 100
        assert out[1] == want


class TestHits:
    def _serial(self, edges, n, n_iters=3, scale=1_000_000):
        hub = {v: scale for v in range(n)}
        auth = dict(hub)
        for _ in range(n_iters):
            araw = {v: 0 for v in range(n)}
            for s, d in edges:
                araw[d] += hub[s]
            mx = max(araw.values())
            auth = {v: (araw[v] * scale // mx if mx else 0) for v in range(n)}
            hraw = {v: 0 for v in range(n)}
            for s, d in edges:
                hraw[s] += auth[d]
            mx = max(hraw.values())
            hub = {v: (hraw[v] * scale // mx if mx else 0) for v in range(n)}
        return auth, hub

    def test_matches_serial_on_random_graph(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.graph import hits

        rng = np.random.default_rng(7)
        n = 60
        edges = sorted(
            {
                (int(s), int(d))
                for s, d in rng.integers(0, n, (250, 2))
                if s != d
            }
        )
        auth, hub = self._serial(edges, n)
        out = (
            hits(
                _ray.data.from_pandas(
                    pd.DataFrame(edges, columns=["src", "dst"])
                ),
                _ray.data.from_pandas(
                    pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
                ),
                n_iters=3,
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert len(out) == n
        for v in range(n):
            assert int(out.loc[v, "auth_u"]) == auth[v]
            assert int(out.loc[v, "hub_u"]) == hub[v]

    def test_star_hub_and_authority(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.graph import hits

        # 0 -> 1..4 (0 is the hub), 1..4 -> 5 (5 is the authority)
        edges = [(0, d) for d in range(1, 5)] + [(s, 5) for s in range(1, 5)]
        out = (
            hits(
                _ray.data.from_pandas(
                    pd.DataFrame(edges, columns=["src", "dst"])
                ),
                _ray.data.from_pandas(
                    pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64)})
                ),
                n_iters=2,
            )
            .to_pandas()
            .set_index("doc_id")
        )
        # node 5 is the top authority; node 0 has zero authority (no
        # in-links); the pure-sink 5 has zero hub score
        assert out["auth_u"].idxmax() == 5
        assert int(out.loc[0, "auth_u"]) == 0
        assert int(out.loc[5, "hub_u"]) == 0
        ser_auth, ser_hub = self._serial(edges, 6, n_iters=2)
        for v in range(6):
            assert int(out.loc[v, "auth_u"]) == ser_auth[v]
            assert int(out.loc[v, "hub_u"]) == ser_hub[v]
