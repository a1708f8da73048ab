"""robots.txt parsing and URL matching (RFC 9309 subset).

The crawl-lifecycle gate the reference's fetch side assumes and a 100-TB
crawl pipeline must apply before anything else touches a URL. Public
spec, pure functions:

  - groups: consecutive ``User-agent:`` lines share the rule block that
    follows; field names are case-insensitive; ``#`` starts a comment;
    an empty ``Disallow:`` value is a no-op (allow-all), per the RFC.
  - group selection: exact case-insensitive product-token match wins;
    otherwise the longest agent token that is a prefix of the caller's
    agent; otherwise the ``*`` group; otherwise no rules (allow-all).
  - matching: rules match from the start of ``path+query``; ``*`` is a
    wildcard, a TRAILING ``$`` anchors the end (a ``$`` elsewhere is a
    literal, Google-style). The most specific rule wins = longest
    pattern in octets; on a tie ``Allow`` beats ``Disallow``
    (RFC 9309 §2.2.2). No matching rule -> allowed.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_robots",
    "select_group",
    "compile_rules",
    "is_allowed",
    "rule_regex",
    "extract_sitemaps",
]


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[str, str]]]]:
    """-> list of groups ``([agents...], [(rule_type, pattern), ...])``
    in file order, rule_type in {"allow", "disallow"}."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    in_agents = False  # consecutive user-agent lines accumulate
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                in_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agents = False
            if agents and value:
                rules.append((field, value))
        else:
            in_agents = False  # sitemap/crawl-delay etc.: ignored
    if agents:
        groups.append((agents, rules))
    return groups


def rule_regex(pattern: str) -> re.Pattern:
    """Compile a robots path pattern: ``*`` -> ``.*``, one trailing
    ``$`` -> end anchor, everything else literal; anchored at start."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile(body + (r"\Z" if anchored else ""))


def select_group(
    groups: list[tuple[list[str], list[tuple[str, str]]]], agent: str
) -> list[tuple[str, str]]:
    """Rules for ``agent`` under the precedence documented above."""
    agent = agent.lower()
    exact: list[tuple[str, str]] | None = None
    best_prefix: tuple[int, list[tuple[str, str]]] | None = None
    star: list[tuple[str, str]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == agent and exact is None:
                exact = rules
            elif a == "*" and star is None:
                star = rules
            elif a != "*" and agent.startswith(a):
                if best_prefix is None or len(a) > best_prefix[0]:
                    best_prefix = (len(a), rules)
    if exact is not None:
        return exact
    if best_prefix is not None:
        return best_prefix[1]
    return star if star is not None else []


def compile_rules(
    rules: list[tuple[str, str]],
) -> list[tuple[re.Pattern, int, bool]]:
    """Pre-compile a group's rules once (the per-host setup an actor or
    per-group task does before matching that host's URL batch):
    ``[(regex, pattern_octets, is_allow), ...]``."""
    return [
        (rule_regex(p), len(p), t == "allow") for t, p in rules
    ]


def is_allowed(
    compiled: list[tuple[re.Pattern, int, bool]], path: str
) -> bool:
    """Longest-match decision over :func:`compile_rules` output for one
    path (``path`` = URL path + optional ``?query``)."""
    best_len = -1
    best_allow = True
    for regex, plen, allow in compiled:
        if regex.match(path):
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow if best_len >= 0 else True


def extract_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` declarations in file order. Per sitemaps.org and
    RFC 9309 §2.2.4 these are GLOBAL — not scoped to any user-agent
    group — so they are collected wherever they appear; field name is
    case-insensitive, ``#`` comments are stripped, empty values are
    skipped. Feeds :func:`functions.weburl.sitemap_discover`: robots
    fetch -> sitemap URLs -> urlset parse -> frontier anti-join is the
    crawl's full discovery chain."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


def extract_crawl_delays(text: str) -> list[tuple[list[str], int | None]]:
    """Group-scoped ``Crawl-delay`` directives (the de-facto extension
    RFC 9309 leaves undefined but every major crawler honors): one
    ``([agents...], delay_seconds | None)`` per user-agent group, in
    file order. Same group-accumulation semantics as
    :func:`parse_robots`; the FIRST valid non-negative integer delay
    in a group wins; malformed values are ignored (group keeps None).
    """
    groups: list[tuple[list[str], int | None]] = []
    agents: list[str] = []
    delay: int | None = None
    in_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                if agents:
                    groups.append((agents, delay))
                agents, delay = [], None
                in_agents = True
            agents.append(value.lower())
        else:
            in_agents = False
            if (
                field == "crawl-delay"
                and agents
                and delay is None
                and value.isdigit()
            ):
                delay = int(value)
    if agents:
        groups.append((agents, delay))
    return groups


def crawl_delay_for(text: str, agent: str, default: int = 1) -> int:
    """Effective crawl delay for ``agent``: same precedence as rule
    selection (exact agent > longest prefix > ``*``); a selected group
    without a delay, or no matching group, yields ``default``. The
    returned value is floored at 1 (a zero delay would make the
    fetch budget unbounded)."""
    agent = agent.lower()
    exact: int | None = None
    star: int | None = None
    best_prefix: tuple[int, int | None] | None = None
    exact_seen = star_seen = False
    for agents, delay in extract_crawl_delays(text):
        for a in agents:
            if a == agent and not exact_seen:
                exact, exact_seen = delay, True
            elif a == "*" and not star_seen:
                star, star_seen = delay, True
            elif a != "*" and agent.startswith(a):
                if best_prefix is None or len(a) > best_prefix[0]:
                    best_prefix = (len(a), delay)
    if exact_seen:
        chosen = exact
    elif best_prefix is not None:
        chosen = best_prefix[1]
    elif star_seen:
        chosen = star
    else:
        chosen = None
    return max(chosen if chosen is not None else default, 1)
