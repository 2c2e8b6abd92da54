"""Plan-shape assertions — the claims the 100 TB story rests on.

The fetch join must be a BroadcastHashJoin with the ADMITTED side as
the build side (BuildRight) and the pages table streamed, even when the
auto-broadcast threshold is disabled: the hint, not the size estimate,
must drive the strategy, because at 100 TB the optimizer sees two
"large" inputs and would otherwise sort-merge-shuffle the pages table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(qe, mode)


def _pages_and_adm(spark):
    pages = spark.createDataFrame(
        [(f"https://h{i % 7}.com/p/{i}", i, "2024-01-01", bytearray(b"<p>x</p>"), "en") for i in range(200)],
        "page_url string, page_hash long, warc_ts string, html binary, lang string",
    )
    adm = spark.createDataFrame(
        [(f"https://h{i % 7}.com/p/{i}", i, f"h{i % 7}.com", 2, 0, i + 1) for i in range(0, 200, 5)],
        "canon_url string, url_hash long, host string, priority int, discovered_round int, fetch_seq long",
    )
    return pages, adm


@pytest.fixture()
def no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_fetch_join_broadcasts_admitted_build_right(spark, no_auto_broadcast):
    from newscrawler_spark.crawler import fetch_join

    pages, adm = _pages_and_adm(spark)
    plan = _plan(fetch_join(pages, adm, broadcast=True))
    assert "BroadcastHashJoin" in plan, plan
    assert "BuildRight" in plan, plan
    # the hint must not degrade to a shuffle of the pages side
    assert "SortMergeJoin" not in plan, plan
    # and it must be the hint doing the work, not the size estimate:
    unhinted = _plan(fetch_join(pages, adm, broadcast=False))
    assert "SortMergeJoin" in unhinted or "ShuffledHashJoin" in unhinted, unhinted


def test_bucketed_fetch_join_no_pages_exchange(spark, tmp_path, no_auto_broadcast):
    """The bucket co-partitioned fetch join (admitted sets past
    driver-broadcast size) must read the pages table straight out of its
    buckets: NO Exchange above the pages scan — the only shuffle in the
    whole plan is the skinny admitted side moving into the bucket
    layout.  At 100 TB an Exchange on the pages side is the job."""
    from newscrawler_spark.crawler import fetch_join_bucketed, prepare_bucketed_pages
    from newscrawler_spark.sources.corpus import generate_corpus

    paths = generate_corpus(str(tmp_path / "c"), n_pages=200, n_hosts=4, seed=7)
    pages = prepare_bucketed_pages(
        spark, paths["pages"], "pages_bkt_plan_test", 8, str(tmp_path / "tbl")
    )
    try:
        _, adm = _pages_and_adm(spark)
        df = fetch_join_bucketed(pages, adm)
        plan = _plan(df, "simple")
        assert "ShuffledHashJoin" in plan, plan
        assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan, plan
        # exactly ONE Exchange — the admitted side; none over the scan
        assert plan.count("Exchange") == 1, plan
        formatted = _plan(df)
        assert "Bucketed: true" in formatted, formatted
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bkt_plan_test")


def test_bucketed_fetch_join_rows_match(spark, tmp_path, no_auto_broadcast):
    """Single-key join + URL post-filter == the two-key broadcast join
    (the collision guard moved, not weakened)."""
    from newscrawler_spark.crawler import (
        fetch_join,
        fetch_join_bucketed,
        prepare_bucketed_pages,
        with_canonical,
    )
    from newscrawler_spark.sources.corpus import generate_corpus

    paths = generate_corpus(str(tmp_path / "c"), n_pages=200, n_hosts=4, seed=7)
    bkt = prepare_bucketed_pages(
        spark, paths["pages"], "pages_bkt_rows_test", 4, str(tmp_path / "tbl")
    )
    try:
        plain = with_canonical(spark.read.parquet(paths["pages"]), "url").select(
            F.col("canon_url").alias("page_url"),
            F.col("url_hash").alias("page_hash"),
            "warc_ts",
            "html",
            "lang",
        )
        # admitted = every other real page (so hits are non-trivial)
        adm = (
            plain.select(
                F.col("page_url").alias("canon_url"),
                F.col("page_hash").alias("url_hash"),
            )
            .withColumn("host", F.lit("h"))
            .withColumn("priority", F.lit(2))
            .withColumn("discovered_round", F.lit(0))
            .withColumn("fetch_seq", F.monotonically_increasing_id())
            .filter(F.col("url_hash") % 2 == 0)
        )
        a = {r["url_hash"] for r in fetch_join_bucketed(bkt, adm).collect()}
        b = {r["url_hash"] for r in fetch_join(plain, adm, broadcast=True).collect()}
        assert a == b and len(a) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bkt_rows_test")


def test_crawler_bucketed_pages_identical_crawl(spark, tmp_path):
    """A full crawl over the bucketed pages layout produces the
    identical seen set and fetch order as the broadcast-join crawl (the
    layout is a pure physical-plan choice)."""
    from newscrawler_spark.crawler import CrawlConfig, FrontierCrawler, prepare_bucketed_pages
    from newscrawler_spark.plans.storage import RoundStore
    from newscrawler_spark.sources.corpus import generate_corpus

    paths = generate_corpus(str(tmp_path / "c"), n_pages=300, n_hosts=6, seed=42)
    prepare_bucketed_pages(
        spark, paths["pages"], "pages_bkt_crawl_test", 4, str(tmp_path / "tbl")
    )

    def crawl(tag, **kw):
        store = RoundStore(str(tmp_path / tag))
        cfg = CrawlConfig(max_rounds=3, round_budget=8, n_salts=4, **kw)
        FrontierCrawler(spark, paths["pages"], paths["seeds"], store, cfg).run(resume=False)
        seen = store.read_rounds(spark, "seen")
        return sorted(
            (r["url_hash"], r["canon_url"], r["fetch_seq"], r["status"])
            for r in seen.collect()
        )

    try:
        assert crawl("bkt", pages_bucketed_table="pages_bkt_crawl_test") == crawl("ref")
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bkt_crawl_test")


def test_fetch_join_rows_match_outer_semantics(spark):
    """inner + anti decomposition == the old left-outer fetch: every
    admitted URL lands in exactly one of (fetched, missing)."""
    from newscrawler_spark.crawler import fetch_join

    pages, adm = _pages_and_adm(spark)
    # knock out some pages so 'missing' is non-trivial
    pages = pages.filter(F.col("page_hash") % 3 != 0)
    hits = fetch_join(pages, adm, broadcast=True)
    missing = adm.join(
        F.broadcast(hits.select("url_hash", "canon_url")),
        on=["url_hash", "canon_url"],
        how="left_anti",
    )
    n_adm = adm.count()
    n_hits = hits.count()
    n_missing = missing.count()
    assert n_hits + n_missing == n_adm
    assert n_missing == adm.filter(F.col("url_hash") % 3 == 0).count()
    # no admitted row is duplicated by the join
    assert hits.select("url_hash").distinct().count() == n_hits


def test_robots_dim_scan_pushes_in_filter(spark, tmp_path):
    """The robots-dim build must reach the parquet scan with an In
    predicate over the literal robots URLs (row-group pruning before
    any html byte is decoded), not a post-scan endswith filter — the
    naive filter was measured at 35 s/600k pages on one executor."""
    from newscrawler_spark.crawler import CrawlConfig, FrontierCrawler
    from newscrawler_spark.plans.storage import RoundStore
    from newscrawler_spark.sources.corpus import generate_corpus

    paths = generate_corpus(str(tmp_path / "c"), n_pages=200, n_hosts=4, seed=7)
    crawler = FrontierCrawler(
        spark,
        paths["pages"],
        paths["seeds"],
        RoundStore(str(tmp_path / "s")),
        CrawlConfig(max_rounds=1, cache_pages=False),
    )
    # the crawler persists robots_dim (InMemoryRelation hides the scan
    # from explain) — assert on the unpersisted plan of the same build
    plan = _plan(crawler._robots_dim_plan())
    assert "PushedFilters" in plan, plan
    assert "robots.txt" in plan, plan
    # the pushed predicate is the In/equality form over the RAW url
    # column (page_url is computed — nothing over it can push)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("In(url" in ln or "EqualTo(url" in ln for ln in pushed), plan
    # and the dim still has exactly one row per host
    rows = crawler.robots_dim.collect()
    assert len(rows) == 4 and len({r["host"] for r in rows}) == 4

def _missing_join_plan(spark, tmp_path, cfg):
    """Build the REAL crawler's missing-join plan under ``cfg`` (drives
    FrontierCrawler._missing_join, the branch run_round executes — a
    hand-built replica would not fail when the threshold/condition in
    the bulk branch regresses)."""
    from newscrawler_spark.crawler import FrontierCrawler
    from newscrawler_spark.plans.storage import RoundStore
    from newscrawler_spark.sources.corpus import generate_corpus

    paths = generate_corpus(str(tmp_path / "c"), n_pages=60, n_hosts=3, seed=7)
    crawler = FrontierCrawler(
        spark, paths["pages"], paths["seeds"], RoundStore(str(tmp_path / "s")), cfg
    )
    pages, adm = _pages_and_adm(spark)
    ext_keys = pages.select(
        F.col("page_hash").alias("url_hash"), F.col("page_url").alias("canon_url")
    )
    return _plan(crawler._missing_join(adm, ext_keys))


def test_bulk_missing_antijoin_is_shuffled_hash(spark, tmp_path):
    """Bulk rounds (budget ≈ ∞) must not broadcast the extracted-key
    set for the missing-status anti-join: the broadcast hash-relation
    build is single-threaded driver time, identical at every core
    count — pure Amdahl serial cost in the N→4N ratio — and caps out
    entirely when the bulk admitted set outgrows driver memory.  The
    shuffled hash join of the two bounded-size key sets is the scale
    shape (the pages table is not involved either way)."""
    from newscrawler_spark.crawler import CrawlConfig

    cfg = CrawlConfig(
        max_rounds=1, round_budget=1_000_000_000, cache_pages=False,
        broadcast_admitted_max=5_000_000,
    )
    assert cfg.is_bulk_round
    plan = _missing_join_plan(spark, tmp_path, cfg)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_budget_round_missing_antijoin_broadcasts(spark, tmp_path):
    """Budget-bounded rounds broadcast the tiny extracted-key set."""
    from newscrawler_spark.crawler import CrawlConfig

    cfg = CrawlConfig(max_rounds=1, round_budget=10, cache_pages=False)
    assert not cfg.is_bulk_round
    plan = _missing_join_plan(spark, tmp_path, cfg)
    assert "BroadcastHashJoin" in plan, plan


def test_budget_round_broadcast0_missing_antijoin_unhinted(spark, tmp_path):
    """broadcast_admitted_max=0 on a budget-bounded round must leave the
    strategy to AQE/Catalyst (no forced hint) — the documented escape
    hatch for memory-constrained deployments (ADVICE r2)."""
    from newscrawler_spark.crawler import CrawlConfig, FrontierCrawler
    from newscrawler_spark.plans.storage import RoundStore
    from newscrawler_spark.sources.corpus import generate_corpus

    cfg = CrawlConfig(
        max_rounds=1, round_budget=10, cache_pages=False, broadcast_admitted_max=0
    )
    paths = generate_corpus(str(tmp_path / "c"), n_pages=60, n_hosts=3, seed=7)
    crawler = FrontierCrawler(
        spark, paths["pages"], paths["seeds"], RoundStore(str(tmp_path / "s")), cfg
    )
    pages, adm = _pages_and_adm(spark)
    ext_keys = pages.select(
        F.col("page_hash").alias("url_hash"), F.col("page_url").alias("canon_url")
    )
    df = crawler._missing_join(adm, ext_keys)
    # assert on the pre-optimization logical plan: no hint node of any
    # kind may be injected (Catalyst/AQE then owns the strategy)
    logical = df._jdf.queryExecution().logical().toString()
    assert "hint" not in logical.lower(), logical


def test_paragraph_dedup_distinct_agg_is_skew_safe(spark):
    """paragraph_dedup's document-frequency count must plan as Spark's
    two-stage distinct-agg rewrite: the FIRST aggregate keys on
    (h, doc_id) — doc_id in the grouping key means a boilerplate
    paragraph shared by 10^9 docs still spreads across all reducers —
    and the count-per-hash stage map-side combines.  A plan that
    grouped straight on h with an exact distinct set per key would
    funnel every occurrence of the hottest paragraph into one task."""
    from newscrawler_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(i, f"body {i}\n\nshared footer") for i in range(30)],
        "doc_id long, text string",
    )
    plan = _plan(paragraph_dedup(docs, min_docs=2), "simple")
    import re

    keys = re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
    # the (h, doc_id) pre-dedup stage must exist...
    assert any("h#" in k and "doc_id#" in k for k in keys), keys
    # ...and feed a partial (map-side) distinct count keyed on h alone
    assert "partial_count(distinct doc_id" in plan


def test_bm25_single_broadcast_no_corpus_shuffle(spark, no_auto_broadcast):
    """BM25's only join is the one-row stats dim broadcast onto the
    per-doc projection: no Exchange keyed on corpus rows, no sort-merge
    — at 100 TB the corpus must stream through two scans and a top-k."""
    from newscrawler_spark.operators.search import bm25_rank

    docs = spark.createDataFrame(
        [(i, f"cat dog doc {i}") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(bm25_rank(docs, ["cat", "dog"], k=5), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # hashpartitioning exchanges would mean the corpus shuffles
    assert "Exchange hashpartitioning" not in plan, plan


def test_url_filter_broadcasts_blocklist(spark, no_auto_broadcast):
    from newscrawler_spark.operators.quality import url_filter

    urls = spark.createDataFrame(
        [(i, f"https://h{i}.com/x") for i in range(50)], "doc_id long, url string"
    )
    blocked = spark.createDataFrame([("h1.com",)], "host string")
    plan = _plan(url_filter(urls, blocked))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_dsir_scoring_join_is_broadcast(spark, no_auto_broadcast):
    """The 64-row llr dim must broadcast onto the (doc, bucket) counts;
    the corpus side shuffles only for its own partial aggregations."""
    from newscrawler_spark.operators.selection import dsir_weights

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(40)], "doc_id long, text string"
    )
    plan = _plan(dsir_weights(docs, F.col("doc_id") % 2 == 0))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sessionize_single_user_exchange(spark):
    """Gaps-and-islands must shuffle ONCE on the session key: the
    rollup's (user_id, sid) grouping is satisfied by the window's
    hashpartitioning(user_id) — a second exchange would double the
    corpus shuffle at scale."""
    from newscrawler_spark.operators.events import sessionize

    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", i % 5, "view") for i in range(50)],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = _plan(sessionize(ev), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_join_no_row_expansion_join(spark, no_auto_broadcast):
    """The as-of plan is union + window — there must be NO join operator
    at all (a band/range join would explode per key)."""
    from newscrawler_spark.operators.events import last_error_asof

    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", i % 5, "error" if i % 3 == 0 else "view")
         for i in range(60)],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = _plan(last_error_asof(ev))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_winnow_fingerprints_zero_shuffle(spark, sf_dir):
    """Winnowing is pure array expressions per document row — the
    selection plan must contain NO Exchange of any kind."""
    from newscrawler_spark.operators.dedup import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_funnel_single_user_exchange(spark, sf_dir):
    """The chained step windows must reuse ONE user-keyed exchange
    (the subset rule) — an agg-and-join-back shape would plan one scan
    and shuffle per step."""
    from newscrawler_spark.operators.events import funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = funnel(ev)._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_kmeans_assignment_zero_shuffle(spark, sf_dir):
    """The final k-means assignment is a codegen argmin over literal
    centroids — one scan, no Exchange."""
    from newscrawler_spark.operators.cluster import kmeans_lloyd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = kmeans_lloyd(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pivot_single_aggregate_no_distinct_job(spark, sf_dir):
    """The explicit-value pivot must compile to ONE hash aggregate over
    one scan with a single day-keyed exchange — no driver-side distinct
    job over the pivot column, no per-type scan."""
    from newscrawler_spark.operators.events import pivot_daily_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = pivot_daily_counts(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rollup_one_scan_one_exchange(spark, sf_dir):
    """GROUP BY ROLLUP must Expand the 3 grouping sets map-side over a
    single corpus scan and shuffle once — not plan one scan+agg per
    level."""
    import __spark_entry__ as m

    df = m.q_a8_rollup_report(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_checksum_single_scan_partial_agg(spark, sf_dir):
    """The reconciliation fingerprint is one scan + map-side partial
    XOR/count into a buckets-sized exchange — the scan is the only
    row-scaled work."""
    import __spark_entry__ as m

    df = m.q_storage_checksum(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_bit_xor" in plan or "partial" in plan.lower(), plan


def test_rolling_window_single_exchange(spark, sf_dir):
    """The RANGE-frame rolling aggregate must shuffle once on user_id
    over one scan — bounded frames stream in the partition sort pass."""
    import __spark_entry__ as m

    plan = (
        m.q_events_rolling(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan  # never the interval self-join shape


def test_graph_pair_ops_no_nested_loop(spark, sf_dir):
    """Triangles and co-citation must plan hash joins only — a
    BroadcastNestedLoopJoin would mean a non-equi pair blowup."""
    import __spark_entry__ as m

    for qname in ("graph_triangles", "graph_cocitation"):
        df = m.queries()[qname](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, (qname, plan)
        assert "CartesianProduct" not in plan, (qname, plan)


def test_storage_diff_bucket_filter_is_broadcast(spark, sf_dir):
    """The changed-bucket list must reach both snapshot scans as a
    broadcast hash join (the partition-pruning surrogate), and the row
    anti-joins must be keyed (no nested loop)."""
    import __spark_entry__ as m

    plan = (
        m.q_storage_diff(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_grouped_topk_uses_window_group_limit(spark, sf_dir):
    """rank<=k on a row_number window must trigger Spark's
    WindowGroupLimit rewrite — mappers keep k rows per group before
    the shuffle, the grouped twin of TakeOrderedAndProject."""
    import __spark_entry__ as m

    plan = (
        m.q_events_topk_daily(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_olap_q5_pushdown_and_broadcasts(spark, sf_dir):
    """The date predicate must reach the orders parquet scan as a
    pushed filter; nation/region join as broadcasts; no nested loop."""
    import __spark_entry__ as m

    df = m.q_olap_q5_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "LessThan(o_orderdate" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_olap_q6_pushdown_single_scan(spark, sf_dir):
    """Q6 is the partition-pruning showcase: the shipdate range must
    reach the lineitem scan as pushed filters, the whole query is ONE
    scan, and the single-row aggregate needs no hash exchange (partial
    → single-partition final)."""
    import __spark_entry__ as m

    df = m.q_olap_q6_forecast(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the toString PushedFilters list is truncated mid-entry — assert
    # the scan-level date bounds via the pushed IsNotNull prefix plus
    # the Filter node's literal bounds
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    assert ">= 1997-01-01" in plan, plan
    assert "< 1998-01-01" in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_olap_q10_take_ordered_and_broadcast_nation(spark, sf_dir):
    """Q10's top-20 must plan as TakeOrderedAndProject and the nation
    dim as a broadcast; the returnflag and orderdate predicates push
    to their scans."""
    import __spark_entry__ as m

    df = m.q_olap_q10_returns(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EqualTo(l_returnflag,R)" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_olap_q18_aggregates_before_join(spark, sf_dir):
    """Q18 must aggregate lineitem to qualifying orderkeys BEFORE any
    dimension join (the HAVING shrink), then broadcast the tiny
    qualifying set — joining first and aggregating the fat row is the
    anti-pattern this asserts against."""
    import __spark_entry__ as m

    df = m.q_olap_q18_large_orders(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # STRUCTURAL check (not mere presence): the sum_qty>200 filter must
    # sit directly over the HashAggregate whose subtree reaches the
    # lineitem scan with NO Join in between — plan lines print parent-
    # before-child, so in the slice [filter line → lineitem scan line]
    # a join-first plan would interpose a Join node
    start = plan.index("(sum_qty")
    scan = plan.index("lineitem.parquet", start)
    between = plan[start:scan]
    assert "Join" not in between, between
    assert "HashAggregate" in between, between
    # and the qualifying set (the aggregate side) is what broadcasts
    bexch = plan.index("BroadcastExchange")
    assert bexch < start < scan, plan


def test_olap_q4_plans_semi_join(spark, sf_dir):
    """The EXISTS must plan as a LEFT-SEMI join (lineitem never fans
    out the orders side) with the quarter predicate pushed to the
    orders scan."""
    import __spark_entry__ as m

    df = m.q_olap_q4_priority(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan, plan


def test_olap_q13_outer_join_preserved(spark, sf_dir):
    """The order-side filters must stay IN the join condition — a
    post-join filter would have Catalyst rewrite the outer join inner
    and drop the zero-order customers.  Assert the physical join is
    still LeftOuter and the zero bucket is non-empty."""
    import __spark_entry__ as m

    df = m.q_olap_q13_custdist(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in plan, plan
    zeros = {r["c_count"]: r["custdist"] for r in df.collect()}.get(0, 0)
    assert zeros > 0, "zero-order customers missing - outer join degraded"


def test_text_readability_zero_shuffle(spark, sf_dir):
    """Readability is pure column expressions: one scan, no exchange
    of any kind."""
    import __spark_entry__ as m

    df = m.q_text_readability(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange" not in plan, plan


def test_olap_q3_take_ordered_limit(spark, sf_dir):
    """The ordered top-10 must plan as TakeOrderedAndProject — never a
    global Sort followed by a limit."""
    import __spark_entry__ as m

    plan = (
        m.q_olap_q3_shipping(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_dataset_card_single_scan(spark, sf_dir):
    """The card's distinct-fingerprint count must plan as the two-stage
    distinct rewrite over ONE corpus scan — not a second scan or an
    extra corpus-wide exchange."""
    import __spark_entry__ as m

    plan = (
        m.q_pipeline_dataset_card(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_olap_q21_semi_anti_pair(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS must plan as a LeftSemi + LeftAnti pair
    over the DISTINCT (order, supplier) reductions, with the final
    top-20 as TakeOrderedAndProject — no fan-out self-join of raw
    lineitem rows."""
    import __spark_entry__ as m

    plan = (
        m.q_olap_q21_waiting_suppliers(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the distinct (order, supplier) pair reduction exists in the plan
    # (Catalyst pushes the semi below the probe-side distinct, which is
    # fine — the BUILD sides are the aggregates)
    import re

    assert re.search(r"HashAggregate\(keys=\[l_orderkey#\d+L, l_suppkey#\d+L\]", plan), plan


def test_olap_q17_single_window_shuffle(spark, sf_dir):
    """The correlated per-part average must be ONE window over
    l_partkey (a single hash exchange), with the part dim broadcast —
    not an agg-and-join-back that scans lineitem twice."""
    import __spark_entry__ as m

    df = m.q_olap_q17_small_qty(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan
    assert "hashpartitioning(l_partkey" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_olap_q16_distinct_then_anti(spark, sf_dir):
    """The (part, supplier) distinct reduction must happen and the
    complaint-supplier exclusion must plan as a broadcast LeftAnti."""
    import __spark_entry__ as m

    plan = (
        m.q_olap_q16_supplier_diversity(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, plan
    assert "count(distinct l_suppkey" in plan, plan


def test_events_cusum_plan_shape(spark, sf_dir):
    """CUSUM must plan as: one daily-aggregate exchange + ONE
    event_type window exchange — no joins anywhere (the whole-frame
    target and the two ordered frames all reuse the same exchange),
    and the windows operate on the per-(type, day) aggregate, never on
    event rows."""
    import __spark_entry__ as m

    plan = (
        m.q_events_cusum(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
