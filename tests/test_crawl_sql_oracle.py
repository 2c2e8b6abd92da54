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


def test_wrapper_sql_shapes(corpus):
    con = duckdb.connect()
    order = con.sql(crawl_order_sql(corpus["pages"], corpus["seeds"], CFG)).df()
    assert list(order.columns) == ["url", "fetch_seq"]
    arts = con.sql(crawl_articles_sql(corpus["pages"], corpus["seeds"], CFG)).df()
    assert list(arts.columns) == [
        "url", "url_hash", "source_domain", "title", "quality_score", "round_id", "fetch_seq",
    ]
    assert (arts["quality_score"] > 0).all() and (arts["quality_score"] <= 1).all()
