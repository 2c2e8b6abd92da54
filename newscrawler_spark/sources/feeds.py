"""S4 RSS/Atom feed source + F12 script-count page sniff, pure codegen.

The reference's feed scraper runs ``feedparser.parse`` per feed URL and
yields up to ``max_entries_per_feed`` = 20 entries
(``src/scrapers/feed_scraper.py:169-188,333``); its URL classifier
counts ``<script>`` tags to spot SPA shells
(``src/utils/url_classifier.py:286-314``).  Here both are whole-stage
codegen column expressions over the pages table — no Python in the hot
path; the frozen Python twins (``functions/extract.parse_feed`` /
``script_count`` / ``is_spa``) define the contract and the golden tests
assert Spark ≡ Python over the whole synthetic corpus.

Scale notes: feed parsing is a narrow map over the pages scan (filter
pushdown on the url suffix prunes at the source); the per-feed
``row_number`` window partitions on feed_url with ≤ 20 rows per
partition — no skew, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extract import (
    FEED_BLOCK_PATTERN,
    FEED_LINK_PATTERN,
    FEED_PUBDATE_PATTERN,
    FEED_TITLE_PATTERN,
    MAX_FEED_ENTRIES,
    SCRIPT_OPEN_PATTERN,
    SPA_MAX_TEXT_RATIO,
    SPA_MIN_SCRIPTS,
)


def _html_str(html_col: str):
    return F.decode(F.col(html_col), "UTF-8")


def feed_entries(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(feed_url, entry_no, title, link, published) — posexplode of the
    first ``MAX_FEED_ENTRIES`` <item> blocks per feed page, mirroring
    ``functions/extract.parse_feed`` expression-for-expression.

    ``entry_no`` numbers the KEPT entries (blocks lacking an absolute
    http(s) <link> are dropped after the cap, like the reference's
    entries[:20]-then-validate order).
    """
    blocks = F.slice(
        F.regexp_extract_all(_html_str(html_col), F.lit(FEED_BLOCK_PATTERN), F.lit(1)),
        1,
        MAX_FEED_ENTRIES,
    )
    e = pages.select(
        F.col(url_col).alias("feed_url"),
        F.posexplode(blocks).alias("block_no", "block"),
    )
    link = F.regexp_extract("block", FEED_LINK_PATTERN, 1)
    title_raw = F.regexp_extract("block", FEED_TITLE_PATTERN, 1)
    # explicit ASCII whitespace class — the collapse_ws tri-engine pin
    # (functions/extract.collapse_ws): Java \s would also eat \x0b while
    # the DuckDB oracle's RE2 \s would not, and neither matches NBSP
    ws = r"[ \t\n\r\f\x0b]+"
    title = F.trim(F.regexp_replace(F.regexp_replace(title_raw, r"<[^>]+>", " "), ws, " "))
    published = F.when(
        F.col("block").rlike(FEED_PUBDATE_PATTERN),
        F.trim(F.regexp_replace(F.regexp_extract("block", FEED_PUBDATE_PATTERN, 1), ws, " ")),
    )
    kept = e.filter(link != "").select(
        "feed_url",
        F.col("block_no"),
        title.alias("title"),
        F.trim(link).alias("link"),
        published.alias("published"),
    )
    w = Window.partitionBy("feed_url").orderBy("block_no")
    return kept.select(
        "feed_url",
        (F.row_number().over(w) - 1).alias("entry_no"),
        "title",
        "link",
        "published",
    )


def script_sniff(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """(url, n_scripts, text_ratio, is_spa) — F12 page classification,
    mirroring ``functions/extract.script_count`` / ``is_spa``.

    ``text_ratio`` is truncated (floor at 6dp), not rounded: floor of an
    identical IEEE double is bit-stable across engines, while decimal
    rounding at an exact .5 boundary is half-up in Spark/DuckDB but
    banker's in Python — truncation removes that cross-engine hazard.
    ``is_spa`` always uses the untruncated ratio."""
    h = _html_str(html_col)
    n_scripts = F.size(F.regexp_extract_all(h, F.lit(SCRIPT_OPEN_PATTERN), F.lit(0)))
    ratio = F.when(F.length(h) > 0, F.length(text_col) / F.length(h)).otherwise(F.lit(0.0))
    return pages.select(
        F.col(url_col).alias("url"),
        n_scripts.alias("n_scripts"),
        (F.floor(ratio * F.lit(1e6)) / F.lit(1e6)).alias("text_ratio"),
        ((n_scripts >= SPA_MIN_SCRIPTS) & (ratio < SPA_MAX_TEXT_RATIO)).alias("is_spa"),
    )
