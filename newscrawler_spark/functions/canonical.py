"""URL canonicalization + hashing — the URL-seen identity contract.

The reference has no explicit canonicalizer (it calls ``urlparse`` ad
hoc, e.g. ``src/utils/url_classifier.py:123``, and relies on a Postgres
UNIQUE constraint on the raw url string, ``init-schema.sql:8``), so the
rebuild freezes one here.  The spec (``canonicalize_url``) is pure
Python; ``canonicalize_cols`` is the equivalent built from Spark column
expressions only (no UDF — stays inside whole-stage codegen), and
``CANON_SQL`` is the same thing in ANSI SQL for the DuckDB oracle.
``test_canonical.py`` property-tests all three against each other.

Spec (frozen):
  1. skip leading ASCII whitespace (``[ \\t\\n\\r\\f\\x0b]``) and
     truncate at the first ASCII whitespace after it — the class is
     EXPLICIT because the three engines' ``\\s`` classes disagree
     (Python re is Unicode-wide, Java includes ``\\x0b``, RE2 does
     not); non-ASCII whitespace (e.g. NBSP) is treated as an ordinary
     URL character by all three
  2. lowercase scheme and host
  3. drop the ``#fragment``
  4. drop default ports (``:80`` for http, ``:443`` for https)
  5. empty path → ``/``
  6. query string preserved verbatim (the synthetic web never relies on
     param-order equivalence, and the reference treats differing query
     strings as distinct articles)
  Non-http(s) URLs canonicalize to NULL (the crawler only follows
  http/https, mirroring the ``startswith('http')`` gate at
  ``src/utils/batch_processor.py:77``).

Hashing (frozen): ``url_hash = int(md5(canon_url)[:15], 16)`` — the top
60 bits of the MD5 digest, which fits a signed 64-bit long in every
engine (Spark ``conv``, DuckDB arithmetic, Python ``int``).  At a
10^10-URL frontier a 60-bit hash expects a handful of birthday
collisions, so the seen-set anti-join keys on **(url_hash, url)** — the
hash exists for partitioning, bloom filters, and compact shuffles, never
as the sole identity (see ``operators/seen.py``).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pure-Python spec -------------------------------------------------

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#:]*)(?::(?P<port>[0-9]*))?"
    r"(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#.*)?$"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# ONE whitespace class, spelled identically in all three engines:
# Python's str.strip()/\s are Unicode-wide, Java's \s includes \x0b,
# RE2's does not — an implicit class would canonicalize tab- or
# NBSP-edged URLs differently per engine (different seen-set identity
# in the oracle vs the engine).
_WS_CLASS = r" \t\n\r\f\x0b"
_TRUNC_RE = re.compile(rf"[{_WS_CLASS}]*([^{_WS_CLASS}]*)")


def canonicalize_url(url: str) -> str | None:
    """Frozen canonicalization spec. Returns None for non-crawlable URLs.

    Internal whitespace is URL-invalid; the spec truncates at the first
    ASCII whitespace character (so the canonical form never contains
    any, which keeps canonicalization idempotent — hypothesis-found
    edge).
    """
    if url is None:
        return None
    url = _TRUNC_RE.match(url).group(1)
    m = _URL_RE.match(url)
    if not m:
        return None
    scheme = m.group("scheme").lower()
    if scheme not in ("http", "https"):
        return None
    host = m.group("host").lower()
    if not host:
        return None
    port = m.group("port")
    netloc = host if (not port or port == _DEFAULT_PORTS[scheme]) else f"{host}:{port}"
    path = m.group("path") or "/"
    query = m.group("query")
    out = f"{scheme}://{netloc}{path}"
    if query is not None and query != "":
        out += f"?{query}"
    return out


def host_of(canon_url: str) -> str:
    """Host (with any non-default port) of an already-canonical URL."""
    rest = canon_url.split("://", 1)[1]
    for sep in ("/", "?"):
        i = rest.find(sep)
        if i >= 0:
            rest = rest[:i]
    return rest


def url_hash60(canon_url: str) -> int:
    """Frozen 60-bit MD5 hash of the canonical URL (fits signed int64)."""
    return int(hashlib.md5(canon_url.encode("utf-8")).hexdigest()[:15], 16)


# --- Spark column-expression implementation ---------------------------
# Pure expressions: stays JVM-side / codegen'd; no Python in the hot path.

_SCHEME_RE = r"^\s*([A-Za-z][A-Za-z0-9+.-]*)://.*$"
# host[:port] = chars after :// up to first of / ? #
_HOSTPORT_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$"
_PATH_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*).*$"
_QUERY_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*).*$"


def canonicalize_expr(url: Column) -> Column:
    """Canonical URL as a Spark column expression (NULL if non-crawlable)."""
    # leading-skip + truncate in one pass over the SHARED explicit class
    url = F.regexp_extract(
        url, rf"^[{_WS_CLASS}]*([^{_WS_CLASS}]*)", 1
    )
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_extract(hostport, r"^([^:]*)(:[0-9]*)?$", 1)
    port = F.regexp_extract(hostport, r"^[^:]*:([0-9]*)$", 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)

    default_port = F.when(scheme == "http", F.lit("80")).otherwise(F.lit("443"))
    netloc = F.when(
        (port == "") | (port == default_port), host
    ).otherwise(F.concat_ws(":", host, port))
    path_c = F.when(path == "", F.lit("/")).otherwise(path)
    canon = F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path_c,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https") & (host != ""), canon)


def host_expr(canon_url: Column) -> Column:
    """Host[:port] of an already-canonical URL column."""
    return F.regexp_extract(canon_url, r"^[a-z]+://([^/?#]*)", 1)


def url_hash_expr(canon_url: Column) -> Column:
    """60-bit MD5 url hash as LongType (matches ``url_hash60``)."""
    return F.conv(F.substring(F.md5(canon_url), 1, 15), 16, 10).cast("long")


def with_canonical(df, url_col: str = "url"):
    """Attach canon_url / host / url_hash columns and drop NULL-canon rows."""
    return (
        df.withColumn("canon_url", canonicalize_expr(F.col(url_col)))
        .filter(F.col("canon_url").isNotNull())
        .withColumn("host", host_expr(F.col("canon_url")))
        .withColumn("url_hash", url_hash_expr(F.col("canon_url")))
    )


# --- DuckDB/ANSI SQL equivalent (for the correctness oracle) ----------
# {col} is interpolated by the caller; produces the same canonical string.
# Matches the frozen spec for ports, query strings and the
# truncate-at-whitespace rule, not just the happy path.
# backslash escapes reach RE2 inside the SQL string literal unprocessed
# (standard-conforming strings); RE2 interprets \t, \n, \x0b itself —
# the identical explicit class the Python and Spark twins use
_SQL_BASE = (
    "regexp_extract({col}, '^[" + _WS_CLASS + "]*([^" + _WS_CLASS + "]*)', 1)"
)
_SQL_SCHEME = f"lower(regexp_extract({_SQL_BASE}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
_SQL_HOSTPORT = f"lower(regexp_extract({_SQL_BASE}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
_SQL_HOST = f"regexp_extract({_SQL_HOSTPORT}, '^([^:]*)', 1)"
_SQL_PORT = f"regexp_extract({_SQL_HOSTPORT}, '^[^:]*:([0-9]*)$', 1)"
_SQL_PATH = (
    f"coalesce(nullif(regexp_extract({_SQL_BASE},"
    " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), ''), '/')"
)
_SQL_QUERY = (
    f"regexp_extract({_SQL_BASE},"
    " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\\?([^#]*)', 1)"
)
CANON_SQL = (
    f"CASE WHEN {_SQL_SCHEME} IN ('http','https') AND {_SQL_HOST} <> '' THEN "
    f"{_SQL_SCHEME} || '://' || "
    f"(CASE WHEN {_SQL_PORT} = '' OR {_SQL_PORT} = "
    f"(CASE WHEN {_SQL_SCHEME} = 'http' THEN '80' ELSE '443' END) "
    f"THEN {_SQL_HOST} ELSE {_SQL_HOST} || ':' || {_SQL_PORT} END) || "
    f"{_SQL_PATH} || "
    f"(CASE WHEN {_SQL_QUERY} <> '' THEN '?' || {_SQL_QUERY} ELSE '' END) "
    "ELSE NULL END"
)

HASH60_SQL = (
    "CAST(('0x' || substring(md5({col}), 1, 15)) AS BIGINT)"
)
