"""DSIR importance weights (operators/selection.py) and
duplicated-substring stats (operators/dedup.substring_dup_stats)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from newscrawler_spark.operators.dedup import substring_dup_stats
from newscrawler_spark.operators.selection import dsir_weights


def _weights(spark, rows, mod=2):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    out = dsir_weights(df, F.col("doc_id") % mod == 0)
    return {r["doc_id"]: r for r in out.collect()}


def test_dsir_separates_target_like_docs(spark):
    # target (even ids) speaks apples; raw pool: doc 1 apples-like,
    # doc 3 bananas-like — weight must rank 1 above 3 with logw>0 / <0
    rows = [
        (0, "apple pie apple tart apple"),
        (2, "apple cider apple jam"),
        (1, "apple pie apple"),
        (3, "banana split banana bread banana"),
    ]
    w = _weights(spark, rows)
    assert set(w) == {1, 3}  # only the raw pool is scored
    assert w[1]["logw"] > 0 and w[1]["keep"]
    assert w[3]["logw"] < 0 and not w[3]["keep"]


def test_dsir_gram_count_is_unigrams_plus_bigrams(spark):
    w = _weights(spark, [(0, "a b c"), (1, "x y z w")])
    assert w[1]["n_grams"] == 4 + 3  # 4 unigrams + 3 bigrams


def test_dsir_weight_matches_hand_formula(spark):
    # single-word docs, no hash collisions assumed between two words
    # only if they land in different buckets — compute from the op's
    # own dim arithmetic instead: one raw doc of one repeated word that
    # also dominates the target => logw = c * [ln(ct+1)-ln(cr+1)
    # - ln(Tt+B) + ln(Tr+B)] with B=64
    w = _weights(spark, [(0, "zzz zzz zzz"), (1, "zzz zzz")])
    # target: 3 unigrams + 2 bigrams of zzz-zzz; raw doc 1: 2 uni + 1 bi
    # unigram bucket: ct=3, cr=2; bigram bucket: ct=2, cr=1 (distinct
    # gram strings may share a bucket — recompute generically)
    from newscrawler_spark.operators.selection import DSIR_BUCKETS as B
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    tgt = {"zzz": 3, "zzz zzz": 2}
    raw = {"zzz": 2, "zzz zzz": 1}
    ct, cr = {}, {}
    for g, c in tgt.items():
        ct[bucket(g)] = ct.get(bucket(g), 0) + c
    for g, c in raw.items():
        cr[bucket(g)] = cr.get(bucket(g), 0) + c
    tt, tr = sum(ct.values()), sum(cr.values())
    logw = sum(
        c
        * (
            math.log(ct.get(bucket(g), 0) + 1)
            - math.log(cr.get(bucket(g), 0) + 1)
            - math.log(tt + B)
            + math.log(tr + B)
        )
        for g, c in raw.items()
    )
    assert abs(w[1]["logw"] - logw) < 1e-3


def test_substring_dup_fraction(spark):
    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=shared + " alpha beta gamma delta"),
            Row(doc_id=1, text=shared + " epsilon zeta eta theta"),
            Row(doc_id=2, text="totally different words " * 4),
        ]
    )
    out = {r["doc_id"]: r for r in substring_dup_stats(df).collect()}
    # docs 0/1: 12 words -> 5 gram positions; only the first (the full
    # shared run) appears in both docs
    assert out[0]["n_grams"] == 5 and out[0]["dup_grams"] == 1
    assert abs(out[0]["dup_frac"] - 0.2) < 1e-4 and out[0]["keep"]
    assert out[2]["dup_grams"] == 0 and out[2]["keep"]


def test_substring_dup_within_doc_repeat_not_cross_doc(spark):
    # a gram repeated WITHIN one doc only is not boilerplate (df counts
    # distinct documents)
    run = "a b c d e f g h"
    df = spark.createDataFrame(
        [Row(doc_id=0, text=run + " x " + run), Row(doc_id=1, text="unrelated " * 10)]
    )
    out = {r["doc_id"]: r for r in substring_dup_stats(df).collect()}
    assert out[0]["dup_grams"] == 0


def test_substring_dup_flags_heavy_overlap(spark):
    body = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [Row(doc_id=0, text=body + " tail0"), Row(doc_id=1, text=body + " tail1")]
    )
    out = {r["doc_id"]: r for r in substring_dup_stats(df).collect()}
    # 31 words -> 24 positions; grams not touching the tail (23) dupe
    assert out[0]["n_grams"] == 24 and out[0]["dup_grams"] == 23
    assert not out[0]["keep"]


# --- CCNet perplexity buckets ---------------------------------------------


def _ccnet(spark, rows, mod=2):
    from newscrawler_spark.operators.selection import ccnet_perplexity

    df = spark.createDataFrame(
        [Row(doc_id=i, lang=lang, text=t) for i, lang, t in rows]
    )
    out = ccnet_perplexity(df, F.col("doc_id") % mod == 0)
    return {r["doc_id"]: r for r in out.collect()}


def test_ccnet_nll_matches_hand_formula(spark):
    """One raw doc scored against a one-doc target LM: mean NLL of its
    hashed bigrams under add-one smoothing, recomputed in Python from
    the identical md5 bucket grid."""
    import hashlib

    from newscrawler_spark.operators.selection import DSIR_BUCKETS as B

    rows = [(0, "en", "zzz zzz zzz qqq"), (1, "en", "zzz zzz qqq zzz")]
    got = _ccnet(spark, rows)

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    tgt_bigrams = ["zzz zzz", "zzz zzz", "zzz qqq"]
    raw_bigrams = ["zzz zzz", "zzz qqq", "qqq zzz"]
    cb = {}
    for g in tgt_bigrams:
        cb[bucket(g)] = cb.get(bucket(g), 0) + 1
    tb = len(tgt_bigrams)
    nll = -sum(
        math.log((cb.get(bucket(g), 0) + 1) / (tb + B)) for g in raw_bigrams
    ) / len(raw_bigrams)
    assert got[1]["n_grams"] == 3
    assert abs(got[1]["nll"] - nll) < 1e-3
    assert 0 not in got, "target docs are not scored"


def test_ccnet_terciles_follow_integer_cdf_rule(spark):
    """Buckets must equal the integer rule 3*cum<=n / 3*cum<=2n applied
    to the per-lang CDF of the pinned nll values — recomputed from the
    operator's own output."""
    # 9 raw docs in one lang with graded repetition => spread nll values
    rows = [(0, "en", "common words shared by all docs here")]
    for i in range(1, 10):
        extra = " ".join(f"rare{i}w{j}" for j in range(i))
        rows.append((2 * i + 1, "en", f"common words shared by all docs {extra}"))
    got = _ccnet(spark, rows)
    assert len(got) == 9
    by_lang: dict = {}
    for r in got.values():
        by_lang.setdefault(r["lang"], []).append(r)
    for docs in by_lang.values():
        n = len(docs)
        docs.sort(key=lambda r: r["nll"])
        cum = 0
        i = 0
        while i < len(docs):
            j = i
            while j < len(docs) and docs[j]["nll"] == docs[i]["nll"]:
                j += 1
            cum += j - i
            want = "head" if cum * 3 <= n else ("middle" if cum * 3 <= 2 * n else "tail")
            for k in range(i, j):
                assert docs[k]["bucket"] == want, (docs[k], want, cum, n)
                assert docs[k]["keep"] == (want != "tail")
            i = j


def test_ccnet_buckets_partition_each_lang(spark):
    """Across two langs, every tercile is populated and langs are
    bucketed independently."""
    rows = []
    did = 0
    for lang in ("en", "de"):
        for i in range(12):
            extra = " ".join(f"{lang}x{i}y{j}" for j in range(i))
            rows.append((2 * did + 1, lang, f"base words for {lang} {extra}"))
            did += 1
    rows.append((0, "en", "base words for en base words for de"))
    got = _ccnet(spark, rows)
    for lang in ("en", "de"):
        buckets = [r["bucket"] for r in got.values() if r["lang"] == lang]
        assert len(buckets) == 12
        assert {"head", "middle", "tail"} == set(buckets)
        assert buckets.count("head") == 4  # 12 distinct-ish values => exact thirds


def test_ccnet_plan_broadcasts_dim_and_buckets(spark):
    """Both join-backs (64-row LM dim, per-(lang,nll) bucket table) must
    broadcast — the corpus side never sort-merges or re-shuffles for
    them."""
    from newscrawler_spark.operators.selection import ccnet_perplexity
    from tests.test_plans import _plan

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text=f"alpha beta gamma delta w{i}") for i in range(6)]
    )
    plan = _plan(ccnet_perplexity(df, F.col("doc_id") % 2 == 0), "simple")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
