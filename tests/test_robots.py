"""robots.txt contract tests: parser + longest-match semantics +
corpus robots roundtrip (reference behavior: robots-denied URLs are
excluded and logged, never fetched — test_scraper.py:82-94)."""

from __future__ import annotations

from newscrawler_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    rules_to_json,
)
from newscrawler_spark.sources.corpus import generate_corpus, robots_body_of


def test_parse_basic():
    body = "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 2\n"
    parsed = parse_robots(body)
    assert parsed["rules"] == [("/blocked/", False)]
    assert parsed["delay"] == 2.0


def test_parse_other_agent_ignored():
    body = "User-agent: evilbot\nDisallow: /\nUser-agent: *\nDisallow: /private/\n"
    parsed = parse_robots(body)
    assert parsed["rules"] == [("/private/", False)]


def test_longest_match_semantics():
    rules = [("/a/", False), ("/a/b/", True), ("/c", False)]
    assert robots_allowed(rules, "/a/x") is False
    assert robots_allowed(rules, "/a/b/x") is True  # longer Allow wins
    assert robots_allowed(rules, "/c/d") is False
    assert robots_allowed(rules, "/open") is True
    assert robots_allowed(None, "/anything") is True
    assert robots_allowed([], "/anything") is True


def test_tie_allow_wins():
    rules = [("/ab", False), ("/ab", True)]
    assert robots_allowed(rules, "/abc") is True
    rules = [("/ab", True), ("/ab", False)]
    assert robots_allowed(rules, "/abc") is True


def test_comments_and_blank_lines():
    body = "# hi\nUser-agent: *  \n\nDisallow: /x # inline\nAllow: /x/y\n"
    parsed = parse_robots(body)
    assert parsed["rules"] == [("/x", False), ("/x/y", True)]
    assert robots_allowed(parsed["rules"], "/x/y/z") is True
    assert robots_allowed(parsed["rules"], "/x/q") is False


def test_corpus_robots_roundtrip(tmp_path):
    paths = generate_corpus(str(tmp_path), n_pages=100, n_hosts=4, seed=42)
    import pyarrow.parquet as pq

    t = pq.read_table(paths["pages"]).to_pylist()
    robots = [r for r in t if r["url"].endswith("/robots.txt")]
    assert len(robots) == 4
    for r in robots:
        body = robots_body_of(r["html"])
        parsed = parse_robots(body)
        assert parsed["rules"] == [("/blocked/", False)]
        assert robots_allowed(parsed["rules"], "/blocked/art-000009.html") is False
        assert robots_allowed(parsed["rules"], "/world/art-000001.html") is True
        rules_to_json(parsed)  # serializable
