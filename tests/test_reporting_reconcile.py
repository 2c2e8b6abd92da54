"""Pivot report, rollup, reconciliation checksums, incremental MV."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_pivot_totals_reconcile(spark, sf_dir):
    """Pivot cells sum to the plain groupBy counts; every (day, type)
    cell is present (0, never null)."""
    from newscrawler_spark.operators.events import (
        EVENT_TYPES,
        pivot_daily_counts,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    wide = pivot_daily_counts(ev).collect()
    by_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for t in EVENT_TYPES:
        assert sum(r[f"n_{t}"] for r in wide) == by_type.get(t, 0)
    assert all(r[f"n_{t}"] is not None for r in wide for t in EVENT_TYPES)


def test_rollup_levels_reconcile(spark, sf_dir):
    """Grand total row equals the table count; per-source rows equal
    the sum of their (source, lang) leaves; gid encodes the level."""
    import __spark_entry__ as m

    rows = m.q_a8_rollup_report(spark, sf_dir).collect()
    leaves = [r for r in rows if r["gid"] == 0]
    per_source = {r["source"]: r for r in rows if r["gid"] == 1}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert grand[0]["n_docs"] == sum(r["n_docs"] for r in leaves)
    for s, row in per_source.items():
        mine = [r for r in leaves if r["source"] == s]
        assert row["n_docs"] == sum(r["n_docs"] for r in mine)
        assert row["total_tokens"] == sum(r["total_tokens"] for r in mine)


def test_checksum_flags_exactly_the_changed_bucket(spark):
    """Two snapshots differing in one row differ in exactly one bucket
    fingerprint; identical snapshots produce identical summaries."""
    from newscrawler_spark.operators.reconcile import table_checksum

    rows = [Row(doc_id=i, text=f"doc {i} body") for i in range(200)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b_rows = [
        Row(doc_id=i, text=("TAMPERED" if i == 137 else f"doc {i} body"))
        for i in range(200)
    ]
    b = spark.createDataFrame(b_rows, "doc_id long, text string")

    fa = {r["bucket"]: r for r in table_checksum(a, buckets=16).collect()}
    fb = {r["bucket"]: r for r in table_checksum(b, buckets=16).collect()}
    assert set(fa) == set(fb)
    diff = [k for k in fa if fa[k]["xor_hash"] != fb[k]["xor_hash"]]
    assert diff == [137 % 16]
    assert all(fa[k]["n_rows"] == fb[k]["n_rows"] for k in fa)
    fa2 = {r["bucket"]: r for r in table_checksum(a, buckets=16).collect()}
    assert all(fa[k] == fa2[k] for k in fa)


def test_incremental_stats_equal_full_recompute(spark, sf_dir):
    """The incrementally-maintained per-source aggregates equal a full
    recompute over the merged snapshot — on the gate's own CDC log."""
    import __spark_entry__ as m
    from newscrawler_spark.functions.text import ws_token_count
    from newscrawler_spark.operators.upsert import merge_snapshot

    incr = {
        r["source"]: (r["n_rows"], r["total"])
        for r in m.q_s15_incr_agg(spark, sf_dir).collect()
    }

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    did = F.col("doc_id")

    def _ch(pred, key, seqn, text_expr, opv="U"):
        return docs.where(pred).select(
            key.alias("doc_id"),
            F.lit(seqn).alias("seq"),
            F.lit(opv).alias("op"),
            text_expr.alias("text"),
            "source",
        )

    changes = (
        _ch(did % 10 == 1, did, 1, F.concat("text", F.lit(" [rev1]")))
        .unionByName(_ch(did % 20 == 1, did, 2, F.concat("text", F.lit(" [rev2]"))))
        .unionByName(
            _ch(did % 10 == 3, did + 1000000, 1,
                F.concat(F.lit("new:"), F.col("source")))
        )
        .unionByName(_ch(did % 10 == 2, did, 1,
                         F.lit(None).cast("string"), "D"))
    )
    snap = merge_snapshot(
        docs.select("doc_id", "text", "source"), changes, "doc_id",
        ["text", "source"],
    )
    full = {
        r["source"]: (r["n"], r["t"])
        for r in snap.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(ws_token_count(F.col("text"))).alias("t"),
        )
        .collect()
    }
    assert incr == full


def test_langid_confusion_totals(spark, sf_dir):
    """Row counts reconcile: per-lang totals equal the table's lang
    counts; diagonal + off-diagonal sum to the total per lang."""
    import __spark_entry__ as m

    rows = m.q_text_langid_confusion(spark, sf_dir).collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    truth = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, cells in per_lang.items():
        assert sum(c["n"] for c in cells) == truth[lang]
        assert all(c["lang_total"] == truth[lang] for c in cells)


def test_length_filter_bounds_are_percentile_disc(spark, sf_dir):
    """The kept range per lang matches a pure-Python percentile-disc
    twin over the token counts, and every kept doc is inside it."""
    from newscrawler_spark.functions.text import ws_token_count
    from newscrawler_spark.operators.quality import length_filter_percentile

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = {
        (r["doc_id"], r["lang"]): r["t"]
        for r in docs.select(
            "doc_id", "lang", ws_token_count(F.col("text")).alias("t")
        ).collect()
    }
    by_lang: dict = {}
    for (_, lang), t in toks.items():
        by_lang.setdefault(lang, []).append(t)

    def disc(vals, pct):
        vals = sorted(vals)
        n = len(vals)
        for i, v in enumerate(vals, start=1):
            if 100 * i >= pct * n:
                return v

    kept = length_filter_percentile(docs).collect()
    for r in kept:
        lo = disc(by_lang[r["lang"]], 5)
        hi = disc(by_lang[r["lang"]], 95)
        assert r["lo"] == lo and r["hi"] == hi
        assert lo <= r["ws_tokens"] <= hi
    # trim is real: some docs dropped, most kept
    assert 0 < len(kept) < len(toks)
    assert len(kept) > 0.8 * len(toks)


def test_length_filter_no_corpus_shuffle(spark, sf_dir):
    """The corpus side must reach the bounds join without an Exchange:
    only the distinct-value table shuffles; the bounds dim broadcasts."""
    from newscrawler_spark.operators.quality import length_filter_percentile

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = (
        length_filter_percentile(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # exchanges: value-table agg (1) + its window repartition (1); the
    # corpus side contributes only the broadcast exchange
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_skew_report_hand_data(spark):
    """One hot key (60% of rows) among many cold ones: only the hot key
    is reported; salt restores the fair share; cold keys stay silent."""
    from newscrawler_spark.operators.diag import skew_report

    rows = [Row(k="hot") for _ in range(600)] + [
        Row(k=f"cold{i % 40}") for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k string")
    got = {r["key"]: r for r in skew_report(df, "k", target_partitions=10).collect()}
    assert set(got) == {"hot"}
    r = got["hot"]
    assert r["cnt"] == 600 and r["share_bp"] == 6000
    # ceil(600*10/1000) = 6 sub-keys -> largest slice ~100 = fair share
    assert r["salt"] == 6


def test_table_diff_finds_exact_rows(spark):
    """Update shows as (a, b) pair; delete as a; insert as b; identical
    rows never appear."""
    from newscrawler_spark.operators.reconcile import table_diff

    a = spark.createDataFrame(
        [Row(doc_id=i, text=f"body {i}") for i in range(100)],
        "doc_id long, text string",
    )
    b_rows = (
        [Row(doc_id=i, text=f"body {i}") for i in range(100) if i != 7]  # del 7
        + [Row(doc_id=200, text="inserted")]                              # ins
    )
    b_rows = [
        Row(doc_id=r.doc_id, text=("CHANGED" if r.doc_id == 13 else r.text))
        for r in b_rows
    ]
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    got = {(r["doc_id"], r["side"]) for r in table_diff(a, b, buckets=8).collect()}
    assert got == {(7, "a"), (13, "a"), (13, "b"), (200, "b")}


def test_vocab_coverage_hand_corpus(spark):
    """With vocab_size=2 the two most frequent words are in-vocab and
    everything else counts as OOV; fractions are exact."""
    from newscrawler_spark.operators.tokenizer import vocab_coverage

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat the dog"),
            Row(doc_id=2, text="the cat zebra"),
            Row(doc_id=3, text="quark"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    # freqs: the=3, cat=2, dog=1, zebra=1, quark=1 -> vocab {the, cat}
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (4, 1)
    assert (got[2]["n_tokens"], got[2]["n_oov"]) == (3, 1)
    assert (got[3]["n_tokens"], got[3]["n_oov"]) == (1, 1)
    assert got[1]["oov_frac"] == 0.25
    assert got[3]["oov_frac"] == 1.0
