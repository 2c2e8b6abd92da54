"""Gopher-style quality filter + PII scrub (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from newscrawler_spark.operators.quality import (
    GOPHER_MIN_WORDS,
    gopher_stats,
    pii_counts,
    pii_scrub,
)


def _stats(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = gopher_stats(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in rows}


def test_gopher_fractions_exact(spark):
    # "a a a b" -> 4 words, 2 distinct, top=3: dup=0.5, top=0.75, mwl=1.0
    s = _stats(spark, ["a a a b"])
    r = s[0]
    assert r["n_words"] == 4
    assert r["dup_word_frac"] == pytest.approx(0.5)
    assert r["top_word_frac"] == pytest.approx(0.75)
    assert r["mean_word_len"] == pytest.approx(1.0)
    assert not r["keep"]  # fails the min-words and repetition rules


def test_gopher_keep_rule(spark):
    # GOPHER_MIN_WORDS distinct 5-char words: every rule passes.
    good = " ".join(f"wrd{i:02d}" for i in range(GOPHER_MIN_WORDS))
    # the same length but one word repeated: top_word_frac = 1.0.
    bad = " ".join(["loop0"] * GOPHER_MIN_WORDS)
    s = _stats(spark, [good, bad])
    assert s[0]["keep"] and not s[1]["keep"]


def test_gopher_blank_and_case(spark):
    # blank docs drop; counting is case-folded ("The the" is one word).
    s = _stats(spark, ["   ", "The the THE"])
    assert 0 not in s
    assert s[1]["n_words"] == 3 and s[1]["dup_word_frac"] == pytest.approx(
        round(1 - 1 / 3, 4)
    )


def test_pii_scrub_and_counts(spark):
    txt = (
        "mail bob.smith+x@corp.example.org now, call 555-867-5309, "
        "host at 192.168.001.1 but not 1.2.3 or a-b-c"
    )
    df = spark.createDataFrame([Row(t=txt)])
    ne, np_, ni = pii_counts(F.col("t"))
    out = df.select(
        ne.alias("e"), np_.alias("p"), ni.alias("i"), pii_scrub(F.col("t")).alias("s")
    ).first()
    assert (out["e"], out["p"], out["i"]) == (1, 1, 1)
    assert "<EMAIL>" in out["s"] and "<PHONE>" in out["s"] and "<IP>" in out["s"]
    assert "bob.smith" not in out["s"] and "867-5309" not in out["s"]
    assert "192.168" not in out["s"]
    # scrubbing is idempotent: placeholders match no PII pattern
    out2 = df.select(pii_scrub(pii_scrub(F.col("t"))).alias("s")).first()
    assert out2["s"] == out["s"]


def test_pii_email_consumes_dotted_host(spark):
    # the dotted mail host must be eaten by <EMAIL>, never left for the
    # IPv4 pattern to half-match
    df = spark.createDataFrame([Row(t="u@10.0.0.7x.example.com end")])
    out = df.select(pii_scrub(F.col("t")).alias("s")).first()
    assert out["s"] == "<EMAIL> end"
