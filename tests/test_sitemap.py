"""Sitemap XML parser (kernel/sitemap.py) + the discovery operator's
kernel-level contract."""

from pdf_extractor_ray.kernel.sitemap import parse_sitemap


class TestParseSitemap:
    def test_urlset_with_noise(self):
        x = (
            "<?xml version='1.0' encoding='UTF-8'?>"
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<!-- <loc>https://decoy.example/x</loc> -->"
            "<url><loc>\n  https://a.example/1 \n</loc>"
            "<lastmod>2020-01-01</lastmod></url>"
            "<url><loc><![CDATA[https://a.example/2]]></loc></url>"
            "</urlset>"
        )
        assert parse_sitemap(x) == [
            ("url", "https://a.example/1"),
            ("url", "https://a.example/2"),
        ]

    def test_sitemapindex(self):
        x = (
            "<sitemapindex><sitemap>"
            "<loc>https://a.example/sitemap-2.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        assert parse_sitemap(x) == [
            ("sitemap", "https://a.example/sitemap-2.xml")
        ]

    def test_namespace_prefix(self):
        x = (
            '<sm:urlset xmlns:sm="x"><sm:url>'
            "<sm:loc>https://b.example/9</sm:loc></sm:url></sm:urlset>"
        )
        assert parse_sitemap(x) == [("url", "https://b.example/9")]

    def test_orphan_and_empty_locs_ignored(self):
        assert parse_sitemap("<loc>https://orphan.example/</loc>") == []
        assert parse_sitemap("<urlset><url><loc>  </loc></url></urlset>") == []
        assert parse_sitemap("") == []

    def test_unterminated_comment_swallows(self):
        x = "<urlset><!-- <url><loc>https://a.example/1</loc></url>"
        assert parse_sitemap(x) == []

    def test_mixed_kinds_in_document_order(self):
        x = (
            "<urlset><url><loc>https://a/1</loc></url></urlset>"
            "<sitemapindex><sitemap><loc>https://a/s.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        assert parse_sitemap(x) == [
            ("url", "https://a/1"),
            ("sitemap", "https://a/s.xml"),
        ]
