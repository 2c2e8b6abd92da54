"""Round-4 operators: lexicon sentiment + cache TTL/eviction.

Reference behavior modeled: analyze-sentiment endpoint
(`src/api/routers/llm.py:245-256`, LLM-backed → deterministic lexicon
stand-in) and the cache policies (`src/utils/cache.py:70-118`: TTL
expiry at created_at + expiration_seconds; at capacity evict the oldest
max(1, int(n*0.1)) entries by last access).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newscrawler_spark.functions.text import sentiment_cols
from newscrawler_spark.operators.rag import cache_ttl_evict


def _sentiment_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cols = sentiment_cols(F.col("text"))
    return {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()]
        ).collect()
    }


class TestSentiment:
    def test_polarity_labels(self, spark):
        rows = _sentiment_rows(
            spark,
            [
                "fast fast small join",     # 3 pos, 0 neg → positive
                "slow big dup",             # 0 pos, 3 neg → negative
                "join hash row",            # nothing → neutral
                "fast slow",                # tie → neutral
                "",                         # empty → neutral, 0 tokens
                None,                       # null-safe
            ],
        )
        assert rows[0]["sentiment"] == "positive" and rows[0]["pos_hits"] == 3
        assert rows[1]["sentiment"] == "negative" and rows[1]["neg_hits"] == 3
        assert rows[2]["sentiment"] == "neutral"
        assert rows[3]["sentiment"] == "neutral"
        assert rows[4]["n_tokens"] == 0 and rows[4]["polarity_bp"] == 0
        assert rows[5]["sentiment"] == "neutral"

    def test_polarity_bp_value(self, spark):
        # (pos-neg)/(pos+neg+1): (3-0)/4 = 0.75 → 7500 bp; (0-3)/4 → -7500
        rows = _sentiment_rows(spark, ["fast fast small", "slow big dup"])
        assert rows[0]["polarity_bp"] == 7500
        assert rows[1]["polarity_bp"] == -7500

    def test_ascii_case_folding(self, spark):
        # translate() folds ASCII case: "FAST" hits the lexicon
        rows = _sentiment_rows(spark, ["FAST Fast fAsT"])
        assert rows[0]["pos_hits"] == 3

    def test_frozen_whitespace_class(self, spark):
        # \x0b is IN the frozen class (tab/vt-separated tokens split);
        # NBSP is NOT (stays glued, no lexicon hit)
        rows = _sentiment_rows(spark, ["fast\x0bslow\tfast", "fast slow"])
        assert rows[0]["pos_hits"] == 2 and rows[0]["neg_hits"] == 1
        assert rows[1]["pos_hits"] == 0 and rows[1]["n_tokens"] == 1


def _cache_df(spark, entries):
    return spark.createDataFrame(
        entries, "cache_id long, created_us long, last_accessed_us long"
    )


US = 1_000_000


class TestCacheTtlEvict:
    def test_ttl_expiry(self, spark):
        # now = 5000s; ttl 3600s → entries created before 1400s expire
        df = _cache_df(
            spark,
            [(1, 0, 5000 * US), (2, 2000 * US, 4000 * US), (3, 100 * US, 200 * US)],
        )
        out = {
            r["cache_id"]: r
            for r in cache_ttl_evict(df, ttl_s=3600, max_size=100).collect()
        }
        assert out[1]["status"] == "expired" and out[1]["age_s"] == 5000
        assert out[2]["status"] == "live"
        assert out[3]["status"] == "expired"

    def test_capacity_evicts_oldest_tenth_by_last_access(self, spark):
        # 20 live entries, max_size 20 → evict max(1, int(2.0)) = 2
        # oldest-by-last-access (ids 0 and 1)
        entries = [(i, 0, (1000 + i) * US) for i in range(20)]
        out = cache_ttl_evict(
            _cache_df(spark, entries), ttl_s=10**9, max_size=20
        ).collect()
        evicted = sorted(r["cache_id"] for r in out if r["status"] == "evicted")
        assert evicted == [0, 1]
        assert sum(r["status"] == "live" for r in out) == 18

    def test_under_capacity_no_eviction(self, spark):
        entries = [(i, 0, (1000 + i) * US) for i in range(5)]
        out = cache_ttl_evict(
            _cache_df(spark, entries), ttl_s=10**9, max_size=100
        ).collect()
        assert all(r["status"] == "live" for r in out)

    def test_min_one_eviction_at_capacity(self, spark):
        # n_live = 5 ≥ max_size 5 → int(0.5) = 0 but the reference
        # floors at 1 eviction (max(1, ...))
        entries = [(i, 0, (1000 + i) * US) for i in range(5)]
        out = cache_ttl_evict(
            _cache_df(spark, entries), ttl_s=10**9, max_size=5
        ).collect()
        assert sum(r["status"] == "evicted" for r in out) == 1

    def test_eviction_tie_breaks_by_cache_id(self, spark):
        # equal last-access → lowest cache_id goes first
        entries = [(i, 0, 1000 * US) for i in range(10)]
        out = cache_ttl_evict(
            _cache_df(spark, entries), ttl_s=10**9, max_size=10
        ).collect()
        evicted = [r["cache_id"] for r in out if r["status"] == "evicted"]
        assert evicted == [0]

    def test_every_entry_disposed_exactly_once(self, spark):
        entries = [(i, (i % 3) * 1000 * US, (2000 + i) * US) for i in range(30)]
        out = cache_ttl_evict(
            _cache_df(spark, entries), ttl_s=3600, max_size=10
        ).collect()
        assert sorted(r["cache_id"] for r in out) == list(range(30))


@pytest.mark.parametrize("query", ["text_sentiment", "response_cache_evict"])
def test_gate_queries_run(spark, sf_dir, query):
    import __spark_entry__ as m

    df = m.queries()[query](spark, sf_dir)
    assert df.count() > 0
    assert query in m.oracle_sql()


def test_prometheus_export_format(spark, sf_dir):
    """The exposition text must follow the reference's format: HELP,
    TYPE, _sum, _count, 19 finite cumulative buckets, +Inf == count."""
    import __spark_entry__ as m

    rows = m.queries()["a4_prometheus_export"](spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["line"])
    assert by_type
    for et, lines in by_type.items():
        name = f"newscrawler_value_{et}"
        assert lines[0].startswith(f"# HELP {name} ")
        assert lines[1] == f"# TYPE {name} histogram"
        assert lines[2].startswith(f"{name}_sum ")
        assert lines[3].startswith(f"{name}_count ")
        count = int(lines[3].rsplit(" ", 1)[1])
        buckets = [ln for ln in lines if "_bucket{" in ln]
        assert len(buckets) == 20
        cums = [int(b.rsplit(" ", 1)[1]) for b in buckets]
        assert cums == sorted(cums), "bucket counts must be cumulative"
        assert buckets[-1].startswith(f'{name}_bucket{{le="+Inf"}} ')
        assert cums[-1] == count


def test_prometheus_inclusive_le_boundary():
    """Faithful Prometheus cumulative semantics: an observation exactly
    on a boundary counts in that le line (le is ≤), negatives land in
    the first bucket (cumulative buckets span -Inf..le), and values
    beyond the last finite boundary appear only in +Inf.  Asserted on
    the DuckDB twin (the driver gate proves the Spark side hash-equal)."""
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE TABLE events AS SELECT * FROM (VALUES "
            "('a', 25.0), ('a', -3.0), ('a', 500.0), ('a', 25.01)) "
            "t(event_type, value)"
        )
        lines = {
            r["line"].rsplit(" ", 1)[0]: int(r["line"].rsplit(" ", 1)[1])
            for _, r in con.sql(m.SQL_A4_PROMETHEUS).df().iterrows()
            if "_bucket{" in r["line"]
        }
    finally:
        con.close()
    assert lines['newscrawler_value_a_bucket{le="25"}'] == 2  # 25.0 + (-3.0)
    assert lines['newscrawler_value_a_bucket{le="50"}'] == 3  # + 25.01
    assert lines['newscrawler_value_a_bucket{le="475"}'] == 3  # 500 excluded
    assert lines['newscrawler_value_a_bucket{le="+Inf"}'] == 4


def test_media_features_local_relation_parallelism(spark):
    """A createDataFrame input (inputFiles()==[], LocalTableScan, 1
    partition) must still repartition up to cluster parallelism before
    the python feature stage (the n_files==0 fallback)."""
    from newscrawler_spark.operators.multimodal import media_features

    media = spark.createDataFrame(
        [(i, bytes([i % 251] * 40)) for i in range(64)], "media_id long, payload binary"
    )
    feats = media_features(media)
    assert "Exchange" in feats._jdf.queryExecution().executedPlan().toString() or (
        feats.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    )
    assert feats.count() == 64


def test_ann_recall_report(spark, sf_dir):
    """The IVF index must achieve high-but-imperfect recall vs brute
    force (1.0 would mean the probe covers everything — vacuous as an
    ANN evaluation; very low would mean a broken index)."""
    import __spark_entry__ as m

    r = m.queries()["sim_recall_report"](spark, sf_dir).collect()[0]
    assert r["n_truth"] == 20 and r["k"] == 20
    assert r["recall_bp"] == r["n_overlap"] * 500
    assert 5000 <= r["recall_bp"] <= 10000
