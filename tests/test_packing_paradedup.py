"""Sequence packing, domain mix (operators/packing.py) and
paragraph-level boilerplate dedup (operators/dedup.paragraph_dedup)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row

from newscrawler_spark.operators.dedup import paragraph_dedup
from newscrawler_spark.operators.packing import domain_mix, pack_sequences


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- paragraph_dedup ----------------------------------------------------


def _para_rows(spark, texts):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    return {r["doc_id"]: r for r in paragraph_dedup(df, min_docs=2).collect()}


def test_paragraph_dedup_drops_boilerplate_keeps_unique(spark):
    boiler = "subscribe now"
    texts = [
        f"unique body {i}\n\n{boiler}" if i < 2 else f"unique body {i}\n\nown footer {i}"
        for i in range(4)
    ]
    out = _para_rows(spark, texts)
    for i in (0, 1):  # boilerplate appears in 2 docs >= min_docs=2
        assert out[i]["n_paras"] == 2 and out[i]["n_dropped"] == 1
        assert out[i]["cleaned_md5"] == _md5(f"unique body {i}")
    for i in (2, 3):  # own footer is doc-unique — survives
        assert out[i]["n_dropped"] == 0
        assert out[i]["cleaned_md5"] == _md5(f"unique body {i}\n\nown footer {i}")


def test_paragraph_dedup_order_and_all_dropped(spark):
    # reassembly preserves original paragraph order even when a middle
    # paragraph is dropped; a fully-boilerplate doc hashes ''
    texts = ["a\n\nshared\n\nz", "shared", "shared\n\nshared"]
    out = _para_rows(spark, texts)
    assert out[0]["cleaned_md5"] == _md5("a\n\nz")
    assert out[1]["cleaned_md5"] == _md5("") and out[1]["kept_chars"] == 0
    # duplicate paragraph twice in one doc: counted per occurrence
    assert out[2]["n_paras"] == 2 and out[2]["n_dropped"] == 2


def test_paragraph_dedup_blank_paragraphs_skipped(spark):
    out = _para_rows(spark, ["a\n\n\n\nb", "c"])
    assert out[0]["n_paras"] == 2  # the empty middle span never counts


# --- pack_sequences -----------------------------------------------------


def test_pack_sequences_blocks_and_straddle(spark):
    # tokens: doc0=3, doc1=4, doc2=2 in one shard, block=5:
    # starts 0,3,7 -> blocks 0,0,1 (doc1 straddles but belongs to its
    # start block)
    df = spark.createDataFrame(
        [
            Row(doc_id=0, source="s", text="a b c"),
            Row(doc_id=1, source="s", text="d e f g"),
            Row(doc_id=2, source="s", text="h i"),
            Row(doc_id=3, source="t", text="x"),
        ]
    )
    rows = {
        (r["shard"], r["block_id"]): r
        for r in pack_sequences(df, block_tokens=5).collect()
    }
    b0 = rows[("s", 0)]
    assert b0["n_docs"] == 2 and b0["n_tokens"] == 7
    assert b0["first_doc"] == 0 and b0["last_doc"] == 1
    b1 = rows[("s", 1)]
    assert b1["n_docs"] == 1 and b1["first_doc"] == 2
    assert rows[("t", 0)]["n_tokens"] == 1


def test_pack_sequences_shards_independent(spark):
    # identical doc sets in two shards pack identically
    rows = [
        Row(doc_id=i + off, source=s, text="w " * 10)
        for s, off in (("a", 0), ("b", 100))
        for i in range(6)
    ]
    out = pack_sequences(
        spark.createDataFrame(rows), block_tokens=25
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["block_id"], r["n_docs"], r["n_tokens"]))
    assert sorted(by_shard["a"]) == sorted(by_shard["b"])


# --- domain_mix ---------------------------------------------------------


def test_domain_mix_flattens_toward_tail(spark):
    rows = [Row(doc_id=i, source="big", text="w " * 99) for i in range(9)]
    rows += [Row(doc_id=100, source="small", text="w " * 99)]
    out = {r["domain"]: r for r in domain_mix(spark.createDataFrame(rows)).collect()}
    assert out["big"]["weight"] < 1.0 < out["small"]["weight"]
    # alpha=0.5 exact: p=0.9/0.1 -> shares proportional to sqrt
    sb, ss = math.sqrt(0.9), math.sqrt(0.1)
    assert abs(out["big"]["share"] - sb / (sb + ss)) < 1e-4
    assert abs(out["small"]["share"] - ss / (sb + ss)) < 1e-4
    assert abs(out["big"]["share"] + out["small"]["share"] - 1.0) < 1e-4


def test_domain_mix_uniform_is_identity(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 4}", text="a b c d e") for i in range(8)
    ]
    out = domain_mix(spark.createDataFrame(rows)).collect()
    assert all(abs(r["weight"] - 1.0) < 1e-3 for r in out)
    assert all(r["n_tokens"] == 10 for r in out)


# --- deterministic epoch shuffle ------------------------------------------


def test_shuffle_assign_is_bijective_permutation(spark):
    from newscrawler_spark.operators.packing import shuffle_assign
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    out = shuffle_assign(df, salt="e1", n_shards=4).collect()
    assert len(out) == 200 and len({r["doc_id"] for r in out}) == 200
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for rows in by_shard.values():
        # positions are exactly 1..n within the shard
        assert sorted(r["pos"] for r in rows) == list(range(1, len(rows) + 1))
        # order follows (sort_key, doc_id)
        srt = sorted(rows, key=lambda r: (r["sort_key"], r["doc_id"]))
        assert [r["pos"] for r in srt] == list(range(1, len(rows) + 1))


def test_shuffle_assign_salt_changes_permutation(spark):
    from newscrawler_spark.operators.packing import shuffle_assign
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=i) for i in range(100)])
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in shuffle_assign(df, salt="e1").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in shuffle_assign(df, salt="e2").collect()}
    assert a != b
    # and the same salt is bit-stable across runs
    a2 = {r["doc_id"]: (r["shard"], r["pos"]) for r in shuffle_assign(df, salt="e1").collect()}
    assert a == a2


def test_shuffle_assign_single_exchange(spark):
    from newscrawler_spark.operators.packing import shuffle_assign
    from pyspark.sql import Row
    from tests.test_plans import _plan

    df = spark.createDataFrame([Row(doc_id=i) for i in range(10)])
    plan = _plan(shuffle_assign(df), "simple")
    assert plan.count("Exchange") == 1, plan


def test_mix_budget_allocation_properties(spark, sf_dir):
    """Allocations never exceed the budget (floor rounding), track the
    sqrt-flattened shares (smaller domain => higher epochs), and
    epochs_bp = alloc*1e4 // n_tokens exactly."""
    import os

    from newscrawler_spark.operators.packing import mix_budget

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    budget = 25_000
    rows = mix_budget(docs, budget).collect()
    assert sum(r["alloc_tokens"] for r in rows) <= budget
    for r in rows:
        assert r["epochs_bp"] == r["alloc_tokens"] * 10000 // r["n_tokens"]
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    assert smallest["epochs_bp"] > largest["epochs_bp"]
