"""Link-graph harvesting: kernel extract_anchors + the distributed
extract_links / anchor_stats operators."""

import pyarrow as pa


class TestExtractAnchors:
    def test_basic_and_markup_stripped(self):
        from pdf_extractor_ray.kernel.html_to_md import extract_anchors

        html = (
            '<p>x <a href="https://a/1">see <b>doc 1</b></a> y '
            '<a href="https://a/2">two</a></p>'
        )
        assert extract_anchors(html) == [
            ("https://a/1", "see doc 1"),
            ("https://a/2", "two"),
        ]

    def test_script_decoy_invisible(self):
        from pdf_extractor_ray.kernel.html_to_md import extract_anchors

        html = (
            '<a href="https://ok/">real</a>'
            "<script>var s='<a href=\"https://evil/\">decoy</a>';</script>"
            "<style>.a { content: '<a href=\"https://evil2/\">x</a>' }</style>"
        )
        assert extract_anchors(html) == [("https://ok/", "real")]

    def test_href_quoting_variants_and_missing(self):
        from pdf_extractor_ray.kernel.html_to_md import extract_anchors

        html = (
            "<a href='https://sq/'>sq</a>"
            "<a href=https://uq/>uq</a>"
            "<a name=anchor-only>no href</a>"
        )
        assert extract_anchors(html) == [
            ("https://sq/", "sq"),
            ("https://uq/", "uq"),
        ]

    def test_whitespace_collapsed_and_unclosed(self):
        from pdf_extractor_ray.kernel.html_to_md import extract_anchors

        assert extract_anchors('<a href="u">  a\n\t b  </a>') == [("u", "a b")]
        # unclosed anchor at EOF is dropped (never terminated)
        assert extract_anchors('<a href="u">dangling') == []


class TestLinkOperators:
    def test_extract_and_stats(self, ray_session):
        from pdf_extractor_ray.functions.webgraph import (
            anchor_stats,
            extract_links,
        )

        pages = [
            ("u1", b'<a href="t/1">one</a><a href="t/2">two</a>'),
            ("u2", b'<a href="t/1">uno</a>'),
            ("u3", None),
            # same target twice from one page: 2 inlinks, 1 distinct src
            ("u4", b'<a href="t/3">x</a><a href="t/3">y</a>'),
        ]
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([p[0] for p in pages], pa.string()),
                    "html": pa.array([p[1] for p in pages], pa.binary()),
                }
            )
        ).repartition(2)
        links = extract_links(ds).to_pandas()
        assert len(links) == 5
        assert links[links.src_url == "u1"]["pos"].tolist() == [0, 1]

        stats = (
            anchor_stats(extract_links(ds))
            .to_pandas()
            .set_index("href")
            .sort_index()
        )
        assert stats.loc["t/1", "n_inlinks"] == 2
        assert stats.loc["t/1", "n_src"] == 2
        assert stats.loc["t/3", "n_inlinks"] == 2
        assert stats.loc["t/3", "n_src"] == 1


class TestResolveRedirects:
    """Pointer-doubling redirect resolution (webgraph.resolve_redirects)."""

    def _run(self, pairs, max_rounds=6):
        import pyarrow as pa
        import ray.data

        from pdf_extractor_ray.functions.webgraph import resolve_redirects

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src_url": [p[0] for p in pairs],
                    "dst_url": [p[1] for p in pairs],
                }
            )
        )
        df = resolve_redirects(edges, max_rounds=max_rounds).to_pandas()
        return {
            r.src_url: (r.final_url, r.n_hops, r.is_cycle)
            for r in df.itertuples()
        }

    def test_chain_of_six_resolves_in_three_rounds(self, ray_session):
        pairs = [(f"u{i}", f"u{i-1}") for i in range(6, 0, -1)]
        got = self._run(pairs, max_rounds=3)  # 2^3 = 8 >= 6
        assert got["u6"] == ("u0", 6, 0)
        assert got["u1"] == ("u0", 1, 0)

    def test_cycle_and_self_loop_flagged(self, ray_session):
        got = self._run([("a", "b"), ("b", "a"), ("s", "s"), ("c", "t")])
        assert got["a"] == ("", 0, 1)
        assert got["b"] == ("", 0, 1)
        assert got["s"] == ("", 0, 1)
        assert got["c"] == ("t", 1, 0)

    def test_round_cap_flags_overlong_chain(self, ray_session):
        pairs = [(f"u{i}", f"u{i-1}") for i in range(5, 0, -1)]
        got = self._run(pairs, max_rounds=2)  # 2^2 = 4 < 5
        assert got["u5"] == ("", 0, 1)  # beyond the cap: unresolved
        assert got["u1"] == ("u0", 1, 0)  # short chains still resolve


class TestOutlinkFeatures:
    def test_internal_external_split(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pdf_extractor_ray.functions.webgraph import outlink_features

        html = (
            '<a href="/rel">r</a>'
            '<a href="https://own.example.org/abs">a</a>'
            '<a href="https://ext1.example.net/x">e1</a>'
            '<a href="https://ext1.example.net/y">e1b</a>'
            '<a href="https://ext2.example.net/z">e2</a>'
            "<script>var a='<a href=\"https://decoy/d\">d</a>';</script>"
        ).encode()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": ["https://own.example.org/p"],
                    "html": pa.array([html], pa.binary()),
                }
            )
        )
        r = outlink_features(ds).to_pandas().iloc[0]
        assert (r.n_links, r.n_external, r.n_ext_hosts) == (5, 3, 2)
        assert r.external_permille == 1000 * 3 // 5

    def test_no_links_page(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pdf_extractor_ray.functions.webgraph import outlink_features

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": ["https://o.example/p"],
                    "html": pa.array([b"<html><p>x</p></html>"], pa.binary()),
                }
            )
        )
        r = outlink_features(ds).to_pandas().iloc[0]
        assert (r.n_links, r.n_external, r.external_permille) == (0, 0, 0)


class TestCanonicalClusters:
    def test_resolution_selfclusters_and_cycle(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.webgraph import canonical_clusters

        pages = pd.DataFrame(
            {
                "url": [f"https://s/p{i}" for i in range(6)],
                "canonical": [
                    "https://c/a",   # p0: canonical redirects a->b->final
                    "https://c/a",   # p1: same cluster as p0
                    "https://c/final",  # p2: canonical is already final
                    "",              # p3: no canonical -> self-cluster
                    "https://c/loop1",  # p4: canonical in a 2-cycle
                    None,            # p5: null canonical -> self-cluster
                ],
            }
        )
        redirects = pd.DataFrame(
            {
                "src_url": [
                    "https://c/a", "https://c/b",
                    "https://c/loop1", "https://c/loop2",
                ],
                "dst_url": [
                    "https://c/b", "https://c/final",
                    "https://c/loop2", "https://c/loop1",
                ],
            }
        )
        out = (
            canonical_clusters(
                _ray.data.from_pandas(pages),
                _ray.data.from_pandas(redirects),
            )
            .to_pandas()
            .set_index("cluster_url")
        )
        # p0, p1 (via a->b->final, 2 hops) and p2 (declared final,
        # 0 hops) share one cluster; only p0/p1 count as redirected
        assert int(out.loc["https://c/final", "n_pages"]) == 3
        assert int(out.loc["https://c/final", "n_redirected"]) == 2
        # self-clusters for missing canonicals
        assert int(out.loc["https://s/p3", "n_pages"]) == 1
        assert int(out.loc["https://s/p5", "n_pages"]) == 1
        # cycle: declared target stays the cluster key, not a final
        assert int(out.loc["https://c/loop1", "n_pages"]) == 1
        assert int(out.loc["https://c/loop1", "n_redirected"]) == 0


class TestBucketIdsRegression:
    def test_nul_strings_hash_by_value_not_prefix(self):
        """pd.util.hash_array(categorize=True) factorizes with
        C-string semantics: keys containing '\\x00' collapsed to the
        first-seen representative, so the SAME key bucketed
        differently in different tasks (found by the host_mirrors
        gate: one pair's counts split 1+5 across two rollup groups).
        bucket_ids must hash by full value."""
        from pdf_extractor_ray.functions.common import bucket_ids

        a = bucket_ids(["h10\x00h9", "h10\x00h11"], 256)
        # order flipped: same values must get the same buckets
        b = bucket_ids(["h10\x00h11", "h10\x00h9"], 256)
        assert a[0] == b[1] and a[1] == b[0]
        # and singletons agree with batch positions
        assert bucket_ids(["h10\x00h9"], 256)[0] == a[0]
        assert bucket_ids(["h10\x00h11"], 256)[0] == a[1]


class TestHostMirrorPairs:
    def test_planted_mirror_cap_and_containment(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.webgraph import host_mirror_pairs

        rows = []
        # mirror pair: m1/m2 share c0..c9 (m1 also has 10 unique docs)
        for i in range(10):
            rows += [("m1", f"c{i}"), ("m2", f"c{i}"), ("m1", f"u{i}")]
        # boilerplate page shared by 6 hosts -> capped out (max 4)
        for h in range(6):
            rows.append((f"b{h}", "boiler"))
        # a pair sharing exactly one page
        rows += [("x1", "shared1"), ("x2", "shared1")]
        # duplicate input rows must not double-count
        rows += [("m1", "c0"), ("m2", "c0")]
        df = pd.DataFrame(rows, columns=["host", "content_hash"])
        out = (
            host_mirror_pairs(
                _ray.data.from_pandas(df),
                max_hosts_per_content=4, min_shared=1,
            )
            .to_pandas()
            .set_index(["host_a", "host_b"])
        )
        m = out.loc[("m1", "m2")]
        assert int(m.n_shared) == 10
        assert int(m.n_a) == 20 and int(m.n_b) == 10
        assert int(m.containment_pm) == 1000  # m2 fully contained
        assert int(out.loc[("x1", "x2")].n_shared) == 1
        # the 6-host boilerplate page creates NO pairs
        assert not any(i[0].startswith("b") for i in out.index)

    def test_min_shared_threshold(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.webgraph import host_mirror_pairs

        rows = [("a", "c1"), ("b", "c1"), ("a", "c2"), ("b", "c2"),
                ("p", "c3"), ("q", "c3")]
        df = pd.DataFrame(rows, columns=["host", "content_hash"])
        out = host_mirror_pairs(
            _ray.data.from_pandas(df), min_shared=2
        ).to_pandas()
        assert len(out) == 1
        assert out.iloc[0].host_a == "a" and int(out.iloc[0].n_shared) == 2


class TestReciprocalLinkStats:
    def test_reciprocity_selfloops_and_dups(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.webgraph import (
            reciprocal_link_stats,
        )

        edges = pd.DataFrame(
            {
                "src_host": ["a", "b", "a", "c", "a", "a", "d"],
                "dst_host": ["b", "a", "c", "a", "b", "a", "e"],
                #             recip pair  one-way recip  dup self  one-way
            }
        )
        out = (
            reciprocal_link_stats(_ray.data.from_pandas(edges))
            .to_pandas()
            .set_index("host")
        )
        # a: out = {b, c}; b reciprocates, c->a exists so a->c too
        assert int(out.loc["a", "n_out"]) == 2
        assert int(out.loc["a", "n_recip"]) == 2
        assert int(out.loc["a", "recip_pm"]) == 1000
        # d -> e unreciprocated
        assert int(out.loc["d", "n_recip"]) == 0
        # self-loop a->a ignored entirely; e has no out-edges -> no row
        assert "e" not in out.index
