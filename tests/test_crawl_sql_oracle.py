"""The unrolled-SQL crawl oracle (newscrawler_spark/oracle_sql.py) must
reproduce the pure-Python crawl oracle exactly — global fetch order,
terminal statuses, and byte-identical article text — making it a valid
third implementation for the driver's DuckDB gate (where it is compared
against the Spark engine's output).

No Spark here: this is DuckDB vs pure Python over the synthetic corpus.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newscrawler_spark.crawler import CrawlConfig
from newscrawler_spark.oracle import crawl_oracle
from newscrawler_spark.oracle_sql import crawl_articles_sql, crawl_order_sql, crawl_sql
from newscrawler_spark.sources.corpus import generate_corpus

CFG = CrawlConfig(max_rounds=3, round_budget=8, n_salts=4)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("sqloracle_corpus")
    return generate_corpus(str(out), n_pages=900, n_hosts=9, seed=7)


@pytest.fixture(scope="module")
def py_oracle(corpus):
    return crawl_oracle(corpus["pages"], corpus["seeds"], CFG)


@pytest.fixture(scope="module")
def sql_rows(corpus):
    sql = crawl_sql(corpus["pages"], corpus["seeds"], CFG)
    con = duckdb.connect()
    try:
        return con.sql(f"SELECT * FROM ({sql}) q ORDER BY fetch_seq").df()
    finally:
        con.close()


def test_fetch_order_exact(py_oracle, sql_rows):
    got = list(zip(sql_rows["url"], (int(s) for s in sql_rows["fetch_seq"])))
    assert got == py_oracle["order"]


def test_statuses_exact(py_oracle, sql_rows):
    for url, status in zip(sql_rows["url"], sql_rows["status"]):
        assert py_oracle["seen"][url] == status, url


def test_article_text_byte_identical(py_oracle, sql_rows):
    fetched = sql_rows[sql_rows["status"] == "fetched"]
    assert len(fetched) == sum(1 for v in py_oracle["seen"].values() if v == "fetched")
    for url, title, text, rid in zip(
        fetched["url"], fetched["title"], fetched["text"], fetched["round_id"]
    ):
        a = py_oracle["articles"][url]
        assert a["text"] == text, url
        assert a["title"] == title, url
        assert a["round_id"] == rid, url


def test_robots_sql_matches_python_on_random_bodies(tmp_path):
    """The SQL robots parser + longest-match decision must equal the
    frozen Python spec on randomized robots.txt bodies (multiple
    user-agent groups, comments, junk lines, allow/disallow mixes,
    crawl-delays) — not just the uniform corpus bodies."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from newscrawler_spark.functions.robots import parse_robots, robots_allowed
    from newscrawler_spark.oracle_sql import ALLOWED_SQL, robots_dim_sql

    rng = random.Random(99)
    prefixes = ["/a/", "/a/b/", "/blocked/", "/x", "/x/y/z/", "/", "/long/prefix/path/"]
    agents = ["*", "googlebot", "badbot", "*"]
    hosts, urls, htmls = [], [], []
    bodies = {}
    for i in range(40):
        host = f"h{i}.test"
        lines = []
        for _ in range(rng.randint(1, 4)):
            lines.append(f"User-agent: {rng.choice(agents)}")
            for _ in range(rng.randint(0, 4)):
                kind = rng.choice(["Disallow", "Allow", "Crawl-delay", "junk"])
                if kind == "junk":
                    lines.append(rng.choice(["", "# a comment", "no colon here", ":", "weird: value"]))
                elif kind == "Crawl-delay":
                    lines.append(f"Crawl-delay: {rng.choice(['2', '0.5', 'abc', '10'])}")
                else:
                    lines.append(f"{kind}: {rng.choice(prefixes + [''])} # trail")
        body = "\n".join(lines)
        bodies[host] = body
        hosts.append(host)
        urls.append(f"https://{host}/robots.txt")
        htmls.append(f"<html><body><pre>{body}</pre></body></html>".encode())
    path = str(tmp_path / "robots_pages.parquet")
    pq.write_table(pa.table({"url": urls, "html": [pa.scalar(h, pa.binary()) for h in htmls]}), path)

    con = duckdb.connect()
    dim = {r[0]: (r[1], r[2]) for r in con.sql(robots_dim_sql(path)).fetchall()}
    test_paths = ["/", "/a/", "/a/b/c", "/blocked/page", "/x/y/z/w", "/other", "/long/prefix/path/q"]
    checked = 0
    for host in hosts:
        want = parse_robots(bodies[host])
        got_rules = [(d["prefix"], d["allow"]) for d in dim[host][0]]
        assert got_rules == want["rules"], host
        assert dim[host][1] == want["delay"], host
        for p in test_paths:
            expr = ALLOWED_SQL.format(rules="rules", path="path")
            got = con.sql(
                f"SELECT {expr} FROM (SELECT ? AS path, "
                f"(SELECT rules FROM ({robots_dim_sql(path)}) d WHERE host = ?) AS rules)",
                params=[p, host],
            ).fetchone()[0]
            assert got == robots_allowed(want["rules"], p), (host, p)
            checked += 1
    assert checked == len(hosts) * len(test_paths)


def test_wrapper_sql_shapes(corpus):
    con = duckdb.connect()
    order = con.sql(crawl_order_sql(corpus["pages"], corpus["seeds"], CFG)).df()
    assert list(order.columns) == ["url", "fetch_seq"]
    arts = con.sql(crawl_articles_sql(corpus["pages"], corpus["seeds"], CFG)).df()
    assert list(arts.columns) == [
        "url", "url_hash", "source_domain", "title", "quality_score", "round_id", "fetch_seq",
    ]
    assert (arts["quality_score"] > 0).all() and (arts["quality_score"] <= 1).all()
