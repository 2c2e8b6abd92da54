"""Politeness window: two-phase salted admission must equal the naive
single-window admission (salting is a pure parallelism optimization)
and respect budgets under extreme skew."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from newscrawler_spark.operators.politeness import admit_per_host, global_fetch_order


@pytest.fixture(scope="module")
def skewed_frontier(spark):
    # hot host owns 80% of rows; url_hash is a permuted id (deterministic)
    rows = spark.range(0, 3000).select(
        F.when(F.col("id") % 5 < 4, "hot.example.com")
        .otherwise(F.concat(F.lit("cold"), F.col("id") % 17, F.lit(".example.com")))
        .alias("host"),
        F.concat(F.lit("https://x/"), F.col("id")).alias("canon_url"),
        ((F.col("id") * 2654435761) % 999983).alias("url_hash"),
        (F.col("id") % 3 + 1).cast("int").alias("priority"),
        (F.col("id") % 4).cast("int").alias("discovered_round"),
        F.lit(5).alias("host_budget"),
    )
    return rows.persist()


def _naive_admit(frontier):
    w = Window.partitionBy("host").orderBy("priority", "discovered_round", "url_hash")
    return (
        frontier.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= F.col("host_budget"))
    )


@pytest.mark.parametrize("n_salts", [1, 4, 16])
def test_salted_equals_naive(spark, skewed_frontier, n_salts):
    admitted, deferred = admit_per_host(skewed_frontier, n_salts=n_salts)
    naive = _naive_admit(skewed_frontier)
    got = {(r["canon_url"], r["host_rank"]) for r in admitted.collect()}
    want = {(r["canon_url"], r["host_rank"]) for r in naive.collect()}
    assert got == want
    # admitted + deferred partition the frontier
    assert admitted.count() + deferred.count() == skewed_frontier.count()
    overlap = admitted.select("canon_url").intersect(deferred.select("canon_url"))
    assert overlap.count() == 0


def test_budget_never_exceeded(spark, skewed_frontier):
    admitted, _ = admit_per_host(skewed_frontier, n_salts=8)
    per_host = admitted.groupBy("host").count().collect()
    for r in per_host:
        assert r["count"] <= 5


def test_scalable_order_equals_window_order(spark, skewed_frontier):
    """The two-pass range-partitioned sequence assignment must produce
    EXACTLY the single-window order (the crawl-order contract)."""
    from newscrawler_spark.operators.politeness import global_fetch_order_scalable

    admitted, _ = admit_per_host(skewed_frontier, n_salts=4)
    a = {
        r["canon_url"]: r["fetch_seq"]
        for r in global_fetch_order(admitted, seq_offset=5).collect()
    }
    b = {
        r["canon_url"]: r["fetch_seq"]
        for r in global_fetch_order_scalable(admitted, seq_offset=5, partitions=7).collect()
    }
    assert a == b


def test_global_order_is_total_and_deterministic(spark, skewed_frontier):
    admitted, _ = admit_per_host(skewed_frontier, n_salts=8)
    out1 = global_fetch_order(admitted, seq_offset=10).orderBy("fetch_seq").collect()
    out2 = global_fetch_order(admitted, seq_offset=10).orderBy("fetch_seq").collect()
    assert [r["canon_url"] for r in out1] == [r["canon_url"] for r in out2]
    assert out1[0]["fetch_seq"] == 11
    keys = [(r["priority"], r["discovered_round"], r["url_hash"]) for r in out1]
    assert keys == sorted(keys)


def test_budget_report_respects_host_budget(spark, sf_dir):
    """Every (round, host) admitted count in the gate's crawl store is
    within the config's per-host budget (round_budget=8, no robots
    delay above 1 in the gate corpus ⇒ budget 8)."""
    import __spark_entry__ as m

    rows = m.q_crawl_budget_report(spark, sf_dir).collect()
    assert rows
    budget = m._GATE_CRAWL_ARGS["round_budget"]
    for r in rows:
        assert 0 < r["n_admitted"] <= budget, (r, budget)
