"""Duplicate-domain seeds: the strategy-dim tie-break is the explicit
tri-engine rule min(scraper_type) — engine (groupBy-min), pure-Python
oracle (sorted-min dict build), and SQL replay (min() aggregate) must
route extraction identically when a seeds source carries duplicate
domains (the reference's Source table has no unique constraint on
domain, src/database/models.py:38-58).

The crafted duplicate makes the rules genuinely disagree: a
'puppeteer' host gains a later 'zz_custom' row, so last-wins would
turn the JS-render extraction OFF while min keeps it ON — any engine
regressing to last-row/arbitrary picks produces different article
bytes and fails."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from newscrawler_spark.crawler import CrawlConfig, FrontierCrawler, read_crawl_order
from newscrawler_spark.oracle import crawl_oracle
from newscrawler_spark.oracle_sql import crawl_sql
from newscrawler_spark.plans.storage import RoundStore
from newscrawler_spark.sources.corpus import generate_corpus

CFG = CrawlConfig(max_rounds=3, round_budget=6, n_salts=2)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dupdom_corpus"))
    paths = generate_corpus(out, n_pages=300, n_hosts=6, seed=11)
    # append duplicate-domain rows for every puppeteer host: same seed
    # row but scraper_type='zz_custom', active=False (the inactive row
    # must not perturb the frontier — only the strategy dim sees it)
    tbl = pq.read_table(paths["seeds"])
    rows = tbl.to_pylist()
    dups = []
    for r in rows:
        if r["scraper_type"] == "puppeteer":
            dup = dict(r)
            dup["scraper_type"] = "zz_custom"
            dup["active"] = False
            dups.append(dup)
    assert dups, "corpus must contain at least one puppeteer host"
    pq.write_table(pa.Table.from_pylist(rows + dups, schema=tbl.schema), paths["seeds"])
    return paths


@pytest.fixture(scope="module")
def py_oracle(corpus):
    return crawl_oracle(corpus["pages"], corpus["seeds"], CFG)


def test_python_oracle_keeps_min_strategy(py_oracle):
    # the puppeteer hosts must still extract with the JS variant: their
    # JSON-LD articleBody text appears only under the puppeteer branch
    assert any(v == "fetched" for v in py_oracle["seen"].values())


def test_sql_replay_matches_python(corpus, py_oracle):
    con = duckdb.connect()
    try:
        sql = crawl_sql(corpus["pages"], corpus["seeds"], CFG)
        rows = con.sql(f"SELECT * FROM ({sql}) q ORDER BY fetch_seq").df()
    finally:
        con.close()
    got = list(zip(rows["url"], (int(s) for s in rows["fetch_seq"])))
    assert got == py_oracle["order"]
    fetched = rows[rows["status"] == "fetched"]
    for url, text in zip(fetched["url"], fetched["text"]):
        assert py_oracle["articles"][url]["text"] == text, url


def test_engine_matches_python(spark, corpus, py_oracle, tmp_path_factory):
    store = RoundStore(str(tmp_path_factory.mktemp("dupdom_store")))
    crawler = FrontierCrawler(spark, corpus["pages"], corpus["seeds"], store, CFG)
    # the dim must hold exactly one row per host, min scraper_type
    dim = {r["host"]: r["scrape_strategy"] for r in crawler.strategy_dim.collect()}
    seeds = pq.read_table(corpus["seeds"]).to_pylist()
    hosts = {s["domain"] for s in seeds}
    assert set(dim) == hosts
    for s in seeds:
        assert dim[s["domain"]] <= s["scraper_type"]
    crawler.run(resume=False)
    got_order = {r["url"]: r["fetch_seq"] for r in read_crawl_order(spark, store).collect()}
    assert got_order == dict(py_oracle["order"])
    got_text = {
        r["url"]: r["text"] for r in store.read_rounds(spark, "articles").collect()
    }
    want_text = {u: a["text"] for u, a in py_oracle["articles"].items()}
    assert got_text == want_text
