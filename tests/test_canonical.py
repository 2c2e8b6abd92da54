"""Canonicalizer contract: pure-Python spec == Spark exprs == DuckDB SQL.

The canonical URL defines URL-seen identity (reference relies on a
Postgres UNIQUE on the raw url, init-schema.sql:8; we freeze an explicit
spec).  Any drift between the three implementations silently corrupts
the seen set, so this test is exhaustive over a generated URL zoo plus
hypothesis-driven random URLs.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from newscrawler_spark.functions.canonical import (
    CANON_SQL,
    HASH60_SQL,
    canonicalize_expr,
    canonicalize_url,
    host_expr,
    host_of,
    url_hash60,
    url_hash_expr,
)

URL_ZOO = [
    "http://example.com",
    "http://example.com/",
    "HTTP://EXAMPLE.COM/Path/To/Page",
    "https://example.com:443/a",
    "http://example.com:80/a",
    "http://example.com:8080/a",
    "https://example.com:8443/x?y=1",
    "  http://spaced.example.com/a  ",
    "http://example.com/a#frag",
    "http://example.com/a?b=1&c=2#frag",
    "http://example.com?q=1",
    "http://example.com/a?",
    "ftp://example.com/a",
    "mailto:a@b.com",
    "not a url",
    "//protocol-relative.com/a",
    "http://",
    "http:///path-only",
    "http://host.with.dots.example.org/deep/path/page.html",
    "https://sub.example.com/MiXeD/CaSe?Key=Val",
    "http://example.com/a/b/../c",  # no dot-segment resolution in spec
    "http://example.com//double//slash",
    # explicit ASCII whitespace class edges — the three engines' \s
    # classes disagree (Python Unicode-wide, Java has \x0b, RE2 not),
    # so the contract pins [ \t\n\r\f\x0b] and treats everything else
    # (NBSP!) as an ordinary URL character
    "\thttp://tabbed.example.com/a",
    "\x0bhttp://vt.example.com/a",
    "\f http://ff.example.com/a",
    "http://example.com/a\tq",
    "http://example.com/a\nb",
    "http://example.com/nbsp\xa0kept",
    " http://thin-space.example.com/a",  # NOT stripped: non-ASCII ws
]


def _spark_canon(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = (
        df.withColumn("c", canonicalize_expr(F.col("url")))
        .withColumn("h", F.when(F.col("c").isNotNull(), host_expr(F.col("c"))))
        .withColumn("k", F.when(F.col("c").isNotNull(), url_hash_expr(F.col("c"))))
        .collect()
    )
    return [(r["c"], r["h"], r["k"]) for r in rows]


def _check(spark, urls):
    got = _spark_canon(spark, urls)
    for u, (c, h, k) in zip(urls, got):
        expect = canonicalize_url(u)
        assert c == expect, f"spark canon({u!r}) = {c!r}, spec = {expect!r}"
        if expect is not None:
            assert h == host_of(expect), f"host({u!r})"
            assert k == url_hash60(expect), f"hash({u!r})"
        # DuckDB oracle SQL agrees with the spec
        (dc,) = duckdb.execute(
            f"select {CANON_SQL.format(col='$u')}", {"u": u}
        ).fetchone()
        assert dc == expect, f"duckdb canon({u!r}) = {dc!r}, spec = {expect!r}"
        if expect is not None:
            (dk,) = duckdb.execute(
                f"select {HASH60_SQL.format(col='$u')}", {"u": expect}
            ).fetchone()
            assert dk == url_hash60(expect), f"duckdb hash({u!r})"


def test_url_zoo(spark):
    _check(spark, URL_ZOO)


def test_idempotent(spark):
    canon = [canonicalize_url(u) for u in URL_ZOO]
    canon = [c for c in canon if c is not None]
    for c in canon:
        assert canonicalize_url(c) == c, f"not idempotent: {c!r}"


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet="abcXYZ019:/?#.&=%-_ \t\n\x0b\f\xa0",
        min_size=0,
        max_size=40,
    ).map(lambda s: "http://" + s)
)
def test_spec_never_crashes(url):
    c = canonicalize_url(url)
    if c is not None:
        assert canonicalize_url(c) == c
        assert 0 <= url_hash60(c) < 1 << 60


def test_random_urls_spark_matches_spec(spark):
    import random

    rng = random.Random(42)
    parts_scheme = ["http", "https", "HTTP", "ftp"]
    hosts = ["a.com", "B.org", "x.y.z.net", "h-1.io", ""]
    ports = ["", ":80", ":443", ":8080", ":0"]
    paths = ["", "/", "/p", "/p/q.html", "/UPPER/x"]
    queries = ["", "?a=1", "?a=1&b=2", "?"]
    frags = ["", "#f", "#a#b"]
    urls = [
        rng.choice(parts_scheme)
        + "://"
        + rng.choice(hosts)
        + rng.choice(ports)
        + rng.choice(paths)
        + rng.choice(queries)
        + rng.choice(frags)
        for _ in range(300)
    ]
    _check(spark, urls)
