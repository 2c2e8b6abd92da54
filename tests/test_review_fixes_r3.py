"""Regression tests for the round-3 review findings: cross-scheme robots
duplicates, duplicate-seed priority resolution, non-resume restart purge,
corpus idempotency-marker staleness, and zipf-count clamping.

Every crawl-semantics fix is asserted three ways where it applies:
engine == pure-Python oracle == unrolled-SQL oracle (the driver gate's
comparison), per the frozen-contract rule in CLAUDE.md.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from newscrawler_spark.crawler import CrawlConfig, FrontierCrawler, read_crawl_order
from newscrawler_spark.oracle import crawl_oracle
from newscrawler_spark.oracle_sql import crawl_sql
from newscrawler_spark.plans.storage import RoundStore
from newscrawler_spark.sources.corpus import generate_corpus

_TS = pa.scalar(1735689600000000, pa.timestamp("us", tz="UTC"))

_PARA = (
    "<p>The committee released its long awaited findings on Tuesday after "
    "months of deliberation and review by independent experts.</p>"
    "<p>Observers said the report would shape policy debates for years and "
    "called the evidence base unusually thorough and well documented.</p>"
)


def _page(title: str, body: str) -> bytes:
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()


def _write_pages(path: str, rows: list[tuple[str, bytes]]) -> None:
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "warc_ts": pa.array([1735689600000000] * len(rows), pa.timestamp("us", tz="UTC")),
                "html": pa.array([h for _, h in rows], pa.binary()),
                "text": pa.array([""] * len(rows), pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            }
        ),
        path,
    )


def _write_seeds(path: str, rows: list[tuple[str, int, bool]]) -> None:
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "source_id": [f"s{i}" for i in range(n)],
                "domain": [u.split("/")[2] for u, _, _ in rows],
                "base_url": [u for u, _, _ in rows],
                "scraper_type": ["newspaper"] * n,
                "active": [a for _, _, a in rows],
                "crawl_frequency": [24] * n,
                "priority": [p for _, p, _ in rows],
                "max_urls": [100] * n,
                "crawl_delay": [1] * n,
            }
        ),
        path,
    )


# ---------------------------------------------------------------------------
# Cross-scheme robots: http:// and https:// robots.txt for the same host
# must resolve to ONE dim row governed by the MIN canonical URL, in the
# engine, the Python oracle, and the SQL oracle alike.
# ---------------------------------------------------------------------------

CROSS_CFG = CrawlConfig(max_rounds=2, round_budget=8, n_salts=2, min_content_len=40)


@pytest.fixture(scope="module")
def cross_scheme_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("xscheme")
    host = "h0.test"
    # http robots (lexicographic MIN canonical url) denies /world/;
    # https robots denies an unrelated path — if either duplicate-row
    # fanout or a wrong pick happens, /world/ admission flips
    http_robots = "<html><body><pre>User-agent: *\nDisallow: /world/\n</pre></body></html>"
    https_robots = "<html><body><pre>User-agent: *\nDisallow: /nowhere/\n</pre></body></html>"
    home = _page(
        "home",
        _PARA
        + f'<a href="https://{host}/world/a.html">a</a>'
        + f'<a href="https://{host}/tech/b.html">b</a>',
    )
    pages = [
        (f"http://{host}/robots.txt", http_robots.encode()),
        (f"https://{host}/robots.txt", https_robots.encode()),
        (f"https://{host}/", home),
        (f"https://{host}/world/a.html", _page("world a", _PARA)),
        (f"https://{host}/tech/b.html", _page("tech b", _PARA)),
    ]
    paths = {
        "pages": str(d / "pages.parquet"),
        "seeds": str(d / "seeds.parquet"),
    }
    _write_pages(paths["pages"], pages)
    _write_seeds(paths["seeds"], [(f"https://{host}/", 1, True)])
    return paths


def test_cross_scheme_robots_one_dim_row(spark, cross_scheme_corpus, tmp_path):
    store = RoundStore(str(tmp_path / "store"))
    crawler = FrontierCrawler(
        spark, cross_scheme_corpus["pages"], cross_scheme_corpus["seeds"], store, CROSS_CFG
    )
    dim = crawler._robots_dim_plan().collect()
    assert len(dim) == 1, f"expected one dim row per host, got {dim}"
    assert dim[0]["host"] == "h0.test"
    assert "/world/" in dim[0]["robots_rules"]  # the http (min-url) body won


def test_cross_scheme_robots_engine_matches_python_oracle(
    spark, cross_scheme_corpus, tmp_path
):
    want = crawl_oracle(
        cross_scheme_corpus["pages"], cross_scheme_corpus["seeds"], CROSS_CFG
    )
    # the min-url robots body must actually deny the /world/ page
    assert want["seen"]["https://h0.test/world/a.html"] == "robots_denied"
    store = RoundStore(str(tmp_path / "store2"))
    FrontierCrawler(
        spark, cross_scheme_corpus["pages"], cross_scheme_corpus["seeds"], store, CROSS_CFG
    ).run(resume=False)
    got_order = {
        r["url"]: r["fetch_seq"] for r in read_crawl_order(spark, store).collect()
    }
    assert got_order == dict(want["order"])
    got_seen = {
        r["canon_url"]: r["status"] for r in store.read_rounds(spark, "seen").collect()
    }
    assert got_seen == want["seen"]


def test_cross_scheme_robots_sql_oracle_matches_python(cross_scheme_corpus):
    want = crawl_oracle(
        cross_scheme_corpus["pages"], cross_scheme_corpus["seeds"], CROSS_CFG
    )
    con = duckdb.connect()
    try:
        sql = crawl_sql(
            cross_scheme_corpus["pages"], cross_scheme_corpus["seeds"], CROSS_CFG
        )
        rows = con.sql(f"SELECT url, fetch_seq, status FROM ({sql}) q ORDER BY fetch_seq").fetchall()
    finally:
        con.close()
    assert [(u, int(s)) for u, s, _ in rows] == want["order"]
    for u, _, status in rows:
        assert want["seen"][u] == status, u


# ---------------------------------------------------------------------------
# Duplicate seed base_urls: min(priority) must win deterministically
# (the oracle's pending[cu] = min key rule), not an arbitrary
# dropDuplicates pick.
# ---------------------------------------------------------------------------


def test_duplicate_seed_priority_min_wins(spark, tmp_path):
    host = "dup.test"
    pages = [
        (
            f"https://{host}/robots.txt",
            b"<html><body><pre>User-agent: *\nDisallow: /blocked/\n</pre></body></html>",
        ),
        (f"https://{host}/", _page("home", _PARA)),
    ]
    pages_p = str(tmp_path / "pages.parquet")
    seeds_p = str(tmp_path / "seeds.parquet")
    _write_pages(pages_p, pages)
    # same base_url at priorities 3 and 1 — the engine must resolve to 1
    _write_seeds(seeds_p, [(f"https://{host}/", 3, True), (f"https://{host}/", 1, True)])

    store = RoundStore(str(tmp_path / "store"))
    cfg = CrawlConfig(max_rounds=1, round_budget=4, n_salts=2)
    crawler = FrontierCrawler(spark, pages_p, seeds_p, store, cfg)
    crawler.initialize()
    f0 = store.read_round(spark, "frontier", -1).collect()
    assert len(f0) == 1
    assert f0[0]["priority"] == 1

    crawler.run(resume=True)
    want = crawl_oracle(pages_p, seeds_p, cfg)
    got_order = {
        r["url"]: r["fetch_seq"] for r in read_crawl_order(spark, store).collect()
    }
    assert got_order == dict(want["order"])


# ---------------------------------------------------------------------------
# Non-resume restart: a store holding MORE committed rounds from an
# earlier crawl must be purged, or post-crawl readers union stale rounds.
# ---------------------------------------------------------------------------


def test_non_resume_restart_purges_prior_rounds(spark, tmp_path):
    corpus = generate_corpus(str(tmp_path / "corpus"), n_pages=120, n_hosts=4, seed=11)
    store = RoundStore(str(tmp_path / "store"))
    cfg4 = CrawlConfig(max_rounds=4, round_budget=5, n_salts=2)
    FrontierCrawler(spark, corpus["pages"], corpus["seeds"], store, cfg4).run(resume=False)
    assert store.last_committed_round() >= 2

    cfg2 = CrawlConfig(max_rounds=2, round_budget=5, n_salts=2)
    FrontierCrawler(spark, corpus["pages"], corpus["seeds"], store, cfg2).run(resume=False)
    # stale rounds (and their manifests) from the 4-round crawl are gone
    assert store.last_committed_round() == 1
    for table in RoundStore.TABLES:
        tdir = os.path.join(store.root, table)
        if os.path.isdir(tdir):
            stale = [e for e in os.listdir(tdir) if e.startswith("round=") and int(e.split("=")[1]) > 1]
            assert stale == [], f"{table}: {stale}"

    want = crawl_oracle(corpus["pages"], corpus["seeds"], cfg2)
    got_order = {
        r["url"]: r["fetch_seq"] for r in read_crawl_order(spark, store).collect()
    }
    assert got_order == dict(want["order"])
    got_seen = {
        r["canon_url"]: r["status"] for r in store.read_rounds(spark, "seen").collect()
    }
    assert got_seen == want["seen"]


# ---------------------------------------------------------------------------
# Corpus generation: marker staleness + zipf clamp
# ---------------------------------------------------------------------------


def _distinct_hosts(pages_path: str) -> int:
    urls = pq.read_table(pages_path, columns=["url"]).column("url").to_pylist()
    return len({u.split("/")[2] for u in urls})


def test_corpus_marker_invalidated_on_param_change(tmp_path):
    d = str(tmp_path / "c")
    generate_corpus(d, n_pages=60, n_hosts=3, seed=5)
    assert _distinct_hosts(os.path.join(d, "pages.parquet")) == 3
    # regenerate with different params into the SAME dir
    generate_corpus(d, n_pages=60, n_hosts=6, seed=5)
    assert _distinct_hosts(os.path.join(d, "pages.parquet")) == 6
    # the original params must NOT be satisfied by the old (removed)
    # marker — the corpus must be regenerated back to 3 hosts
    generate_corpus(d, n_pages=60, n_hosts=3, seed=5)
    assert _distinct_hosts(os.path.join(d, "pages.parquet")) == 3


def test_zipf_counts_clamped_when_hosts_exceed_pages(tmp_path):
    from newscrawler_spark.sources.corpus import _zipf_counts

    counts = _zipf_counts(10, 20)
    assert all(c >= 1 for c in counts)
    # the pathological shape must also generate end-to-end
    paths = generate_corpus(str(tmp_path / "tiny"), n_pages=10, n_hosts=20, seed=3)
    assert os.path.exists(paths["pages"])


# ---------------------------------------------------------------------------
# Search fixes: non-word-edged terms, concat-seam false positives,
# zero-norm guards
# ---------------------------------------------------------------------------


def test_keyword_hits_non_word_edge_terms(spark):
    from pyspark.sql import functions as F

    from newscrawler_spark.operators.search import keyword_hits, term_pattern

    df = spark.createDataFrame(
        [(1, "we use c++ here and c++ there"), (2, "the chair is plain"), (3, "ai wins")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", keyword_hits(["c++"], "text").alias("n")).collect()}
    assert rows == {1: 2, 2: 0, 3: 0}
    rows = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", keyword_hits(["ai"], "text").alias("n")).collect()}
    assert rows == {1: 0, 2: 0, 3: 1}  # no hit inside "chair"
    # the pattern is the shared engine/oracle contract — DuckDB agrees
    import duckdb

    for term, hay, want in [("c++", "we use c++ here and c++ there", 2), ("ai", "the chair", 0)]:
        got = duckdb.execute(
            "SELECT len(regexp_extract_all(?, ?))", [hay, term_pattern(term)]
        ).fetchone()[0]
        assert got == want, (term, hay)


def test_text_search_no_concat_seam_false_positive(spark):
    from newscrawler_spark.operators.search import text_search

    # doc text crafted so title-tail + ' ' + text-head would contain the
    # term if the haystack were the old concatenation
    text = "x" * 55 + "engin" + " more words follow here"
    docs = spark.createDataFrame(
        [(1, text, "s", "en")], "doc_id long, text string, source string, lang string"
    )
    # title = text[:60] ends with 'engin'; text starts 'xxxx...' — the
    # term 'engin x' spans the seam of title||' '||text ONLY
    out = text_search(docs, term="engin x", page=1, size=10)
    assert out.count() == 0


def test_hybrid_search_zero_query_vec_raises(spark):
    import pytest as _pytest

    from newscrawler_spark.operators.search import hybrid_search

    docs = spark.createDataFrame([(1, "stream data")], "doc_id long, text string")
    embs = spark.createDataFrame(
        [(1, [0.1] * 4)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError):
        hybrid_search(docs, embs, [0.0] * 4, terms=["stream"])


def test_hybrid_search_zero_norm_embedding_scores_keyword_only(spark):
    from newscrawler_spark.operators.search import hybrid_search

    docs = spark.createDataFrame(
        [(1, "stream data"), (2, "stream flow")], "doc_id long, text string"
    )
    embs = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.5] * 4)], "vec_id long, embedding array<float>"
    )
    rows = {r["doc_id"]: r["score"] for r in hybrid_search(
        docs, embs, [0.5] * 4, terms=["stream"], semantic_weight=0.6, k=10
    ).collect()}
    assert rows[1] is not None and abs(rows[1] - 0.04) < 1e-9  # 0.4·(1/10)
    assert rows[2] is not None and rows[2] > rows[1]  # cosine 1 + kw


# ---------------------------------------------------------------------------
# Whitespace-class pins: collapse_ws / canonical / embed tokenization
# treat ONLY [ \t\n\r\f\x0b] as whitespace, identically in all engines
# ---------------------------------------------------------------------------


def test_collapse_ws_ascii_class_only():
    from newscrawler_spark.functions.extract import collapse_ws

    assert collapse_ws("a \t\n b") == "a b"
    assert collapse_ws("\x0b a \f ") == "a"
    # NBSP is NOT whitespace under the pinned class (Java/RE2 agree)
    assert collapse_ws("a\xa0b") == "a\xa0b"


def test_embed_text_null_and_nbsp_tokens(spark):
    from newscrawler_spark.functions.embed import embed_text

    assert embed_text(None) == embed_text("")
    # NBSP does not split tokens (matches the kernel/oracle class)
    assert embed_text("a\xa0b") != embed_text("a b")


def test_feeds_nbsp_title_engine_matches_python(spark):
    """A feed title with an NBSP must come out identically from the
    Spark expression path and the frozen Python parse_feed twin."""
    from newscrawler_spark.functions.extract import parse_feed
    from newscrawler_spark.sources.feeds import feed_entries

    xml = (
        '<rss version="2.0"><channel><title>t</title>\n'
        "<item><title>Breaking\xa0News  now</title><link>https://h.test/a</link>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate></item>\n"
        "</channel></rss>"
    )
    want = parse_feed(xml)
    df = spark.createDataFrame(
        [("https://h.test/feed.xml", xml.encode())], "page_url string, html binary"
    )
    got = feed_entries(df, url_col="page_url", html_col="html").collect()
    assert len(got) == len(want) == 1
    assert got[0]["title"] == want[0]["title"]
    assert got[0]["link"] == want[0]["link"]
    assert got[0]["published"] == want[0]["published"]
