"""Tests for int8 quantized ANN, CDC merge-upsert, and the KN bigram LM."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from newscrawler_spark.operators.lm import bigram_counts, kneser_ney_bigrams
from newscrawler_spark.operators.quantize import sq_encode, sq_query_codes, sq_topk
from newscrawler_spark.operators.upsert import merge_snapshot


# --------------------------------------------------------------- quantize


def _load_emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_sq_codes_in_int8_range_and_scale(spark, sf_dir):
    emb = _load_emb(spark, sf_dir)
    enc = sq_encode(emb)
    bad = enc.where(
        F.exists("codes", lambda c: (c > 127) | (c < -127))
    ).count()
    assert bad == 0
    # the max-magnitude component must hit exactly +/-127
    hit = enc.where(
        F.array_contains("codes", 127) | F.array_contains("codes", -127)
    ).count()
    assert hit == enc.count()
    assert enc.where(F.col("scale_micro") <= 0).count() == 0


def test_sq_query_codes_matches_engine_encode(spark, sf_dir):
    emb = _load_emb(spark, sf_dir)
    row = emb.where(F.col("vec_id") == 7).select("embedding").first()
    q = [float(x) for x in row["embedding"]]
    py_codes, py_sm = sq_query_codes(q)
    eng = sq_encode(emb).where(F.col("vec_id") == 7).first()
    assert list(eng["codes"]) == py_codes
    assert eng["scale_micro"] == py_sm


def test_sq_topk_recall_vs_exact_dot(spark, sf_dir):
    emb = _load_emb(spark, sf_dir)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    q = vecs[0]
    exact = sorted(
        vecs, key=lambda v: (-sum(a * b for a, b in zip(vecs[v], q)), v)
    )[:20]
    approx = [r["vec_id"] for r in sq_topk(emb, q, k=20).collect()]
    recall = len(set(exact) & set(approx)) / 20.0
    assert recall >= 0.8, (recall, exact, approx)
    # the query itself must be its own best match
    assert approx[0] == 0


def test_sq_zero_vector_guard(spark):
    dim = 4
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.0] * dim), Row(vec_id=1, embedding=[1.0, -2.0, 0.5, 0.0])]
    )
    enc = {r["vec_id"]: r for r in sq_encode(df).collect()}
    assert list(enc[0]["codes"]) == [0] * dim
    assert enc[0]["scale_micro"] == 0
    assert list(enc[1]["codes"]) == [64, -127, 32, 0]
    codes, sm = sq_query_codes([0.0] * dim)
    assert codes == [0] * dim and sm == 0


# ----------------------------------------------------------------- upsert


def test_merge_snapshot_semantics(spark):
    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, seq=1, op="U", v="a1"),
            Row(k=1, seq=2, op="U", v="a2"),  # last-wins
            Row(k=2, seq=1, op="D", v=None),  # delete
            Row(k=4, seq=5, op="U", v="new"),  # insert
        ]
    )
    out = {
        r["k"]: (r["v"], r["version"])
        for r in merge_snapshot(base, changes, "k", ["v"]).collect()
    }
    assert out == {1: ("a2", 2), 3: ("c", 0), 4: ("new", 5)}


def test_merge_snapshot_delete_then_reinsert(spark):
    base = spark.createDataFrame([Row(k=1, v="a")])
    changes = spark.createDataFrame(
        [Row(k=1, seq=1, op="D", v=None), Row(k=1, seq=2, op="U", v="back")]
    )
    out = merge_snapshot(base, changes, "k", ["v"]).collect()
    assert [(r["k"], r["v"], r["version"]) for r in out] == [(1, "back", 2)]


# --------------------------------------------------------------------- lm

_WS = " \t\n\r\f\x0b"


def _py_tokens(text: str) -> list[str]:
    # the frozen explicit-ASCII split: trim spaces, lower, split on the class
    t = text.strip(" ").lower()
    out, cur = [], []
    for ch in t:
        if ch in _WS:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _py_kn(texts: list[str], top: int = 200):
    c12: Counter = Counter()
    for t in texts:
        w = _py_tokens(t)
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    nf: Counter = Counter()
    np_: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        nf[a] += 1
        np_[b] += 1
    B = len(c12)
    rows = []
    for (a, b), c in c12.items():
        num = B * max(4 * c - 3, 0) + 3 * nf[a] * np_[b]
        den = 4 * c1[a] * B
        p = math.floor((num / den) * 1e8 + 0.5) / 1e8
        rows.append((a, b, c, c1[a], nf[a], np_[b], p))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:top]


def test_kn_matches_pure_python(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "the cat the cat the cat",
        "",
        "single",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = [
        (r["w1"], r["w2"], r["c12"], r["c1"], r["nf"], r["np"], r["p_kn"])
        for r in kneser_ney_bigrams(df, top=200).collect()
    ]
    assert got == _py_kn(texts)


def test_kn_probability_bounds_and_mass(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = kneser_ney_bigrams(docs, top=500)
    bad = out.where((F.col("p_kn") <= 0) | (F.col("p_kn") > 1)).count()
    assert bad == 0
    # observed-bigram mass per context never exceeds 1 (the KN discount
    # reserves mass for unseen continuations)
    bc = bigram_counts(docs)
    # replay the full table in python for a per-context mass check
    rows = bc.collect()
    c1 = defaultdict(int)
    nf = defaultdict(int)
    np_ = defaultdict(int)
    for r in rows:
        c1[r["w1"]] += r["c12"]
        nf[r["w1"]] += 1
        np_[r["w2"]] += 1
    B = len(rows)
    mass = defaultdict(float)
    for r in rows:
        num = B * max(4 * r["c12"] - 3, 0) + 3 * nf[r["w1"]] * np_[r["w2"]]
        mass[r["w1"]] += num / (4 * c1[r["w1"]] * B)
    assert all(m <= 1.0 + 1e-9 for m in mass.values())


def test_kn_short_docs_yield_no_bigrams(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="one"), Row(doc_id=1, text=""), Row(doc_id=2, text="  ")]
    )
    assert bigram_counts(df).count() == 0
