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


def test_stratified_sample_deterministic_and_rated(spark):
    from newscrawler_spark.operators.quality import stratified_sample

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 == 0 else "zz") for i in range(2000)]
    )
    rates = {"en": 5000, "zz": 500}
    kept = stratified_sample(docs, rates)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # deterministic: identical under a different partitioning
    ids2 = sorted(r["doc_id"] for r in stratified_sample(docs.repartition(7), rates).collect())
    assert ids == ids2
    en = sum(1 for i in ids if i % 2 == 0)
    zz = len(ids) - en
    # 1000 docs per stratum at 50% / 5%: ~6-sigma binomial bounds
    # around the 500 / 50 expectations
    assert 400 <= en <= 600 and 10 <= zz <= 95
    # unknown stratum drops
    extra = spark.createDataFrame([Row(doc_id=1, lang="xx")])
    assert stratified_sample(extra, rates).count() == 0


def test_decontaminate_ngram_exact(spark):
    from newscrawler_spark.operators.quality import decontaminate_ngram

    shared = "alpha beta gamma delta"
    ev = spark.createDataFrame([Row(doc_id=0, text=f"pre {shared} post")])
    tr = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"x y {shared} z"),          # 1 shared 4-gram
            Row(doc_id=2, text="totally different words here now"),
            Row(doc_id=3, text=shared),                      # exact overlap
        ]
    )
    out = {r["doc_id"]: r for r in decontaminate_ngram(tr, ev, n=4).collect()}
    assert set(out) == {1, 3}
    assert out[3]["n_hits"] == 1 and out[3]["first_hit"] == shared
    assert out[1]["n_hits"] == 1


def test_gopher_matches_python_counter_spec(spark):
    """Property: gopher_stats == a pure-Python Counter over the frozen
    ASCII-whitespace split, on a deterministic zoo of texts (hypothesis
    via explicit examples — one Spark job for the whole batch)."""
    import random
    import re
    from collections import Counter

    texts = [
        "",
        " \t ",
        "a",
        "a a\tb\nb\x0bc\fd\re",
        "Tab\tmixed  CASE case",
    ]
    rng = random.Random(42)
    chars = "ab z.\t\n\x0b\f\r-9"
    texts += [
        "".join(rng.choice(chars) for _ in range(rng.randint(0, 60)))
        for _ in range(60)
    ]

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r["doc_id"]: r for r in gopher_stats(df).collect()}

    ws_re = re.compile(r"[ \t\n\r\f\x0b]+")
    for i, t in enumerate(texts):
        lowered = t.lower().strip(" ")  # Spark trim() strips spaces only
        if lowered == "":
            assert i not in got, (i, repr(t))
            continue
        words = ws_re.split(lowered)
        c = Counter(words)
        n = sum(c.values())
        r = got[i]
        assert r["n_words"] == n, (repr(t), r)
        assert r["dup_word_frac"] == pytest.approx(round(1 - len(c) / n, 4))
        assert r["top_word_frac"] == pytest.approx(round(max(c.values()) / n, 4))
        assert r["mean_word_len"] == pytest.approx(
            round(sum(len(w) * k for w, k in c.items()) / n, 4)
        )


def test_pii_cross_engine_parity(spark):
    """Java regex (Spark) and RE2 (DuckDB) must agree on counts AND the
    scrubbed bytes over an adversarial zoo — the gate only exercises the
    planted corpus PII; this pins the dialect-sensitive edges (\\b on
    digit runs, naive octets, ASCII-only classes, pre-scrubbed text)."""
    import duckdb

    from newscrawler_spark.operators.quality import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    zoo = [
        "a@b.co and c.d+e@f-g.h.ij tails",
        "not-an-email @x.com a@b a@b. a@@b.com",
        "1234-567-8901 555-123-4567x 555-123-456",  # \b digit edges
        "999.999.999.999 and 1.2.3.4.5 and 1.2.3",  # naive octets, overlap
        "<EMAIL> 555-123-4567 10.0.0.1",            # already-scrubbed text
        "\xa0u@ex.com  10.0.0.2\xa0",          # unicode ws at edges
        "v4 at 010.000.000.001, ver 1.2.33.444.",
        "UPPER@CASE.ORG mixed@Case.Net",
        "١٢٣-456-7890 phone? ٥@x.com",              # non-ASCII digits
    ]
    df = spark.createDataFrame([Row(doc_id=i, t=z) for i, z in enumerate(zoo)])
    from newscrawler_spark.operators.quality import pii_counts, pii_scrub

    ne, np_, ni = pii_counts(F.col("t"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", ne.alias("e"), np_.alias("p"), ni.alias("i"),
            pii_scrub(F.col("t")).alias("s"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE zoo(doc_id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO zoo VALUES (?, ?)", list(enumerate(zoo)))
    want = con.execute(
        f"""
SELECT doc_id,
  len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS e,
  len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS p,
  len(regexp_extract_all(t, '{PII_IPV4_RE}')) AS i,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_PHONE_RE}', '<PHONE>', 'g'),
      '{PII_IPV4_RE}', '<IP>', 'g') AS s
FROM zoo ORDER BY doc_id
"""
    ).fetchall()
    for doc_id, e, p, i, s in want:
        g = got[doc_id]
        assert (g["e"], g["p"], g["i"], g["s"]) == (e, p, i, s), (
            zoo[doc_id], (g["e"], g["p"], g["i"], g["s"]), (e, p, i, s)
        )


def test_pii_email_consumes_dotted_host(spark):
    # the dotted mail host must be eaten by <EMAIL>, never left for the
    # IPv4 pattern to half-match
    df = spark.createDataFrame([Row(t="u@10.0.0.7x.example.com end")])
    out = df.select(pii_scrub(F.col("t")).alias("s")).first()
    assert out["s"] == "<EMAIL> end"


def test_gopher_ngram_fractions_exact(spark):
    from newscrawler_spark.operators.quality import gopher_ngram_stats

    # "a b a b c": 2-grams = [a b, b a, a b, b c] -> 'a b' x2 (3 chars),
    # total_chars = 9; top2 = 2*3/9; dup2 = 2*3/9; 3-grams all unique.
    df = spark.createDataFrame([Row(doc_id=0, text="a b a b c")])
    r = gopher_ngram_stats(df).collect()[0]
    assert abs(r["top2_frac"] - 6 / 9) < 1e-4
    assert abs(r["dup2_frac"] - 6 / 9) < 1e-4
    assert r["dup3_frac"] == 0.0 and not r["keep"]


def test_gopher_ngram_dup3_and_keep(spark):
    from newscrawler_spark.operators.quality import gopher_ngram_stats

    # long unique doc keeps; heavy 3-gram repetition fails dup3
    uniq = " ".join(f"w{i}" for i in range(80))
    rep = "x y z " * 10 + "tail"
    rows = {r["doc_id"]: r for r in gopher_ngram_stats(
        spark.createDataFrame(
            [Row(doc_id=0, text=uniq), Row(doc_id=1, text=rep)]
        )
    ).collect()}
    assert rows[0]["keep"] and rows[0]["dup2_frac"] == 0.0
    assert rows[1]["dup3_frac"] > 0.5 and not rows[1]["keep"]


def test_gopher_ngram_short_docs_excluded(spark):
    from newscrawler_spark.operators.quality import gopher_ngram_stats

    out = gopher_ngram_stats(
        spark.createDataFrame(
            [Row(doc_id=0, text="solo"), Row(doc_id=1, text="two words")]
        )
    ).collect()
    assert [r["doc_id"] for r in out] == [1]  # <2 words has no 2-gram


def test_url_filter_verdict_precedence(spark):
    from newscrawler_spark.operators.quality import url_filter

    urls = spark.createDataFrame(
        [
            Row(doc_id=0, url="https://bad.com/premium/x"),  # host beats path
            Row(doc_id=1, url="https://ok.com/premium/x"),
            Row(doc_id=2, url="https://ok.com/news/x"),
            Row(doc_id=3, url="http://bad.com/news/x"),  # http scheme too
        ]
    )
    blocked = spark.createDataFrame([Row(host="bad.com")])
    out = {r["doc_id"]: r["verdict"] for r in url_filter(urls, blocked).collect()}
    assert out == {
        0: "blocked_host",
        1: "blocked_path",
        2: "kept",
        3: "blocked_host",
    }


def test_percentile_norm_matches_python_cdf(spark, sf_dir):
    """pct_bp equals the strictly-below integer CDF computed in pure
    Python over the same pinned scores, per source."""
    import os

    import __spark_entry__ as m
    from newscrawler_spark.functions.text import quality_score
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    scores = [
        (r["source"], r["doc_id"], r["q"])
        for r in docs.select(
            "source", "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    ]
    by_src: dict = {}
    for s, d, q in scores:
        by_src.setdefault(s, []).append(q)
    got = {r["doc_id"]: r["pct_bp"] for r in
           m.q_quality_percentile_norm(spark, sf_dir).collect()}
    for s, d, q in scores:
        vals = by_src[s]
        want = 10000 * sum(1 for v in vals if v < q) // len(vals)
        assert got[d] == want, (d, got[d], want)
