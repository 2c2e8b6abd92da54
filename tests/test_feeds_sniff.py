"""S4 feed-entry source + F12 script/SPA sniff: the Spark codegen
implementations (sources/feeds.py) must equal the frozen Python spec
(functions/extract.parse_feed / script_count / is_spa) over the whole
synthetic corpus, plus unit goldens for the spec itself."""

from __future__ import annotations

import pytest

from newscrawler_spark.functions.extract import (
    MAX_FEED_ENTRIES,
    is_spa,
    parse_feed,
    script_count,
)

FEED_HTML = (
    '<rss version="2.0"><channel><title>h feed</title>\n'
    + "".join(
        f"<item><title>Story {k} on h</title><link>https://h/a-{k}.html</link>"
        f"<pubDate>Wed, 01 Jan 2025 0{k % 10}:00:00 +0000</pubDate></item>\n"
        for k in range(25)
    )
    + "<item><link>relative/no-scheme</link></item>"
    + "<item><title>no link at all</title></item>"
    + "</channel></rss>"
)


def test_parse_feed_golden():
    entries = parse_feed(FEED_HTML)
    assert len(entries) == MAX_FEED_ENTRIES  # capped before validation
    assert entries[0] == {
        "title": "Story 0 on h",
        "link": "https://h/a-0.html",
        "published": "Wed, 01 Jan 2025 00:00:00 +0000",
    }
    assert entries[-1]["link"] == f"https://h/a-{MAX_FEED_ENTRIES - 1}.html"


def test_parse_feed_drops_invalid_after_cap():
    # 2 valid + 1 schemeless + 1 linkless, all within the cap: the
    # invalid ones are dropped, survivors keep their order
    html = (
        "<item><link>https://h/a</link></item>"
        "<item><link>nope</link></item>"
        "<item><title>t</title></item>"
        "<item><title>x</title><link>https://h/b</link></item>"
    )
    entries = parse_feed(html)
    assert [e["link"] for e in entries] == ["https://h/a", "https://h/b"]
    assert entries[0]["title"] == "" and entries[0]["published"] is None


def test_script_count_and_spa_golden():
    spa = (
        "<html><head>"
        + "".join(f'<script src="/c{k}.js"></script>' for k in range(4))
        + '</head><body><div id="root"></div><script>boot()</script></body></html>'
    )
    assert script_count(spa) == 5
    assert is_spa(spa, "")
    article = "<html><body><p>" + "words " * 200 + "</p><script>t()</script></body></html>"
    assert script_count(article) == 1
    assert not is_spa(article, "words " * 200)


@pytest.fixture(scope="module")
def corpus_pages(spark, tmp_path_factory):
    from newscrawler_spark.sources.corpus import generate_corpus

    out = str(tmp_path_factory.mktemp("feeds_corpus"))
    paths = generate_corpus(out, n_pages=300, n_hosts=6, seed=42)
    return spark.read.parquet(paths["pages"])


def test_feed_entries_spark_equals_python(corpus_pages):
    from newscrawler_spark.sources.feeds import feed_entries

    feeds = corpus_pages.filter(corpus_pages.url.endswith("/feed.xml"))
    got = {
        (r.feed_url, r.entry_no): (r.title, r.link, r.published)
        for r in feed_entries(feeds).collect()
    }
    expected = {}
    for r in feeds.select("url", "html").collect():
        for i, e in enumerate(parse_feed(bytes(r.html).decode("utf-8", errors="replace"))):
            expected[(r.url, i)] = (e["title"], e["link"], e["published"])
    assert got == expected
    assert len(expected) > 0
    # corpus feeds carry real titles and pubDates now
    assert all(t.startswith("Story ") for (t, _, _) in expected.values())
    assert all(p is not None for (_, _, p) in expected.values())


def test_script_sniff_spark_equals_python(corpus_pages):
    from newscrawler_spark.sources.feeds import script_sniff

    got = {
        r.url: (r.n_scripts, r.is_spa)
        for r in script_sniff(corpus_pages).collect()
    }
    spa_urls = set()
    for r in corpus_pages.select("url", "html", "text").collect():
        h = bytes(r.html).decode("utf-8", errors="replace")
        assert got[r.url][0] == script_count(h), r.url
        assert got[r.url][1] == is_spa(h, r.text), r.url
        if is_spa(h, r.text):
            spa_urls.add(r.url)
    # exactly the synthetic /app shells classify as SPA
    assert spa_urls == {u for u in got if u.endswith("/app")}
    assert len(spa_urls) == 6
