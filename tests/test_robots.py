"""RFC 9309 robots.txt parsing and longest-match URL gating."""

from pdf_extractor_ray.kernel.robots import (
    compile_rules,
    is_allowed,
    parse_robots,
    rule_regex,
    select_group,
)

ROBOTS = """\
# comment line
User-agent: graftbot
Disallow: /private/*
Allow: /private/ok$
Disallow: /tmp/*.html$
Disallow: /a/*/end
Crawl-delay: 10

User-agent: alpha
User-agent: beta
Disallow: /shared

User-agent: *
Disallow: /
"""


def _rules(agent):
    return compile_rules(select_group(parse_robots(ROBOTS), agent))


def test_longest_match_allow_overrides_disallow():
    r = _rules("graftbot")
    assert not is_allowed(r, "/private/x")
    assert is_allowed(r, "/private/ok")  # longer Allow wins
    assert not is_allowed(r, "/private/okay")  # $ anchor: not a prefix win


def test_wildcard_and_end_anchor():
    r = _rules("graftbot")
    assert not is_allowed(r, "/tmp/3.html")
    assert is_allowed(r, "/tmp/3.htmlx")  # $ anchored -> no match
    assert not is_allowed(r, "/a/deep/path/end")
    # mid-pattern * has no end anchor: the rule matches as a prefix,
    # so any extension of a matching path is still disallowed
    assert not is_allowed(r, "/a/x/endmore")
    assert is_allowed(r, "/a/x/nope")


def test_no_matching_rule_is_allowed():
    r = _rules("graftbot")
    assert is_allowed(r, "/public/1")
    assert is_allowed(r, "/cgi-bin/q?x=1")


def test_multi_agent_group_and_star_fallback():
    assert not is_allowed(_rules("alpha"), "/shared/x")
    assert not is_allowed(_rules("beta"), "/shared/x")
    assert is_allowed(_rules("beta"), "/other")
    # unknown agent falls to the * group: deny-all
    assert not is_allowed(_rules("zetabot"), "/anything")


def test_exact_match_beats_prefix_and_star():
    txt = (
        "User-agent: graft\nDisallow: /p\n\n"
        "User-agent: graftbot\nAllow: /p\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    g = parse_robots(txt)
    assert is_allowed(compile_rules(select_group(g, "graftbot")), "/p/x")
    # 'graftbotx' has no exact group; longest prefix 'graftbot' wins
    assert is_allowed(compile_rules(select_group(g, "graftbotx")), "/p/x")
    # 'gra' matches neither -> star
    assert not is_allowed(compile_rules(select_group(g, "gra")), "/p/x")


def test_empty_disallow_is_noop_and_no_groups_allows():
    g = parse_robots("User-agent: *\nDisallow:\n")
    assert is_allowed(compile_rules(select_group(g, "any")), "/x")
    assert is_allowed(compile_rules(select_group([], "any")), "/x")


def test_rule_regex_escapes_literals():
    assert rule_regex("/a.b").match("/a.b")
    assert not rule_regex("/a.b").match("/aXb")
    assert rule_regex("/q?x=*").match("/q?x=3")


def test_tie_allow_wins():
    g = parse_robots("User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert is_allowed(compile_rules(select_group(g, "any")), "/dir/x")


class TestExtractSitemaps:
    def test_global_lines_case_and_comments(self):
        from pdf_extractor_ray.kernel.robots import extract_sitemaps

        t = (
            "User-agent: *\n"
            "Disallow: /private\n"
            "SITEMAP: https://a.example/sitemap.xml\n"
            "# Sitemap: https://decoy.example/s.xml\n"
            "sitemap:   https://a.example/sitemap-news.xml\n"
            "Sitemap:\n"
        )
        assert extract_sitemaps(t) == [
            "https://a.example/sitemap.xml",
            "https://a.example/sitemap-news.xml",
        ]

    def test_inside_group_still_global(self):
        from pdf_extractor_ray.kernel.robots import extract_sitemaps

        t = (
            "User-agent: botA\n"
            "Disallow: /a\n"
            "Sitemap: https://x.example/s.xml\n"
            "User-agent: botB\n"
            "Allow: /\n"
        )
        assert extract_sitemaps(t) == ["https://x.example/s.xml"]

    def test_empty_and_no_sitemaps(self):
        from pdf_extractor_ray.kernel.robots import extract_sitemaps

        assert extract_sitemaps("") == []
        assert extract_sitemaps("User-agent: *\nAllow: /\n") == []


class TestCrawlDelay:
    def test_group_precedence_first_wins_and_decoys(self):
        from pdf_extractor_ray.kernel.robots import crawl_delay_for

        r = (
            "# decoy: Crawl-delay: 99\n"
            "User-agent: otherbot\nCrawl-delay: 50\n"
            "User-agent: *\nDisallow: /x\n"
            "Crawl-delay: 7\nCrawl-delay: 9\n"  # first wins
            "User-agent: graftbot\nCrawl-delay: 3\n"
        )
        assert crawl_delay_for(r, "graftbot") == 3  # exact beats *
        assert crawl_delay_for(r, "anybot") == 7
        assert crawl_delay_for(r, "otherbot") == 50

    def test_defaults_floors_and_malformed(self):
        from pdf_extractor_ray.kernel.robots import crawl_delay_for

        assert crawl_delay_for("User-agent: *\nDisallow:", "b") == 1
        assert crawl_delay_for("", "b", default=5) == 5
        # malformed value ignored -> default; zero floors to 1
        assert crawl_delay_for(
            "User-agent: *\nCrawl-delay: fast\n", "b", default=4
        ) == 4
        assert crawl_delay_for("User-agent: *\nCrawl-delay: 0\n", "b") == 1
        # prefix match beats *
        r = "User-agent: graft\nCrawl-delay: 8\nUser-agent: *\nCrawl-delay: 2\n"
        assert crawl_delay_for(r, "graftbot") == 8
