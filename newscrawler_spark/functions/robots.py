"""Frozen robots.txt contract.

The reference fetches and TTL-caches per-domain robots.txt and gates
every fetch on ``can_fetch`` (``src/scrapers/newspaper_scraper/
robots_cache.py:33-91``, ``src/scrapers/robots_handler.py:50-82``).  The
rebuild stores robots bodies as ordinary pages (``https://{host}/
robots.txt`` rows in the pages table), distills them into a small
per-host rules dimension, **broadcast-joins** it against the frontier,
and evaluates allow/deny in a vectorized pandas UDF.

Parser spec (frozen, standard longest-match semantics):
  * only the ``User-agent: *`` group applies (the reference crawls with
    a single agent string and the synthetic web only emits ``*`` groups)
  * ``Allow:`` / ``Disallow:`` values are path prefixes; ``Disallow:``
    with empty value means allow-all
  * decision: the longest matching rule wins; on equal length, Allow
    wins; no matching rule → allowed
  * ``Crawl-delay: <seconds>`` is surfaced for the politeness budget
  * a host with no robots.txt page → everything allowed, delay None
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

# --- pure-Python frozen spec -------------------------------------------


def parse_robots(body: str) -> dict:
    """robots.txt body → {"rules": [(path, allow:bool), ...], "delay": float|None}

    Rules are kept in file order; evaluation applies longest-match.
    """
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    applies = False
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
            continue
        if not applies:
            continue
        if key == "disallow":
            if val:
                rules.append((val, False))
        elif key == "allow":
            if val:
                rules.append((val, True))
        elif key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return {"rules": rules, "delay": delay}


def robots_allowed(rules: list[tuple[str, bool]] | None, path: str) -> bool:
    """Longest-match decision for a canonical URL path."""
    if not rules:
        return True
    best_len = -1
    best_allow = True
    for prefix, allow in rules:
        if path.startswith(prefix) and len(prefix) > best_len:
            best_len = len(prefix)
            best_allow = allow
        elif path.startswith(prefix) and len(prefix) == best_len and allow:
            best_allow = True
    return best_allow


def rules_to_json(parsed: dict) -> str:
    """Serialize parsed rules for the broadcast dimension column."""
    return json.dumps(parsed, separators=(",", ":"))


# --- Spark vectorized implementation -----------------------------------

ROBOTS_DIM_SCHEMA = "host string, robots_rules string, robots_delay double"


def robots_dim_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` body distilling robots.txt pages into the per-host
    rules dimension (host, robots_rules JSON, robots_delay).

    Parsing runs on the executors: at web scale there are 10^7-10^8
    hosts, and collecting every robots body to the driver for a Python
    loop would OOM it — only the finished (tiny) dim ever moves, via the
    broadcast exchange of the frontier join.  Input: page_url, html.
    """
    from ..sources.corpus import robots_body_of

    for pdf in it:
        hosts, rules, delays = [], [], []
        for url, blob in zip(pdf["page_url"].tolist(), pdf["html"].tolist()):
            hosts.append(url.split("://", 1)[1].split("/", 1)[0])
            parsed = parse_robots(robots_body_of(bytes(blob)))
            rules.append(rules_to_json(parsed))
            delays.append(parsed["delay"])
        yield pd.DataFrame(
            {
                "host": hosts,
                "robots_rules": rules,
                "robots_delay": pd.Series(delays, dtype="float64"),
            }
        )


def robots_filter_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` body evaluating the allow predicate per batch.

    Input columns: ``canon_url`` and ``robots_rules`` (JSON string from
    the broadcast robots dimension; NULL → no robots for the host).
    Appends boolean ``allowed``.  Parsed rule sets are memoized per
    distinct rules-string within the batch, so cost is O(hosts), not
    O(rows).
    """
    for pdf in it:
        cache: dict[str, list] = {}
        allowed = []
        for canon, rules_json in zip(pdf["canon_url"].tolist(), pdf["robots_rules"].tolist()):
            if rules_json is None or rules_json != rules_json:  # None or NaN
                allowed.append(True)
                continue
            rules = cache.get(rules_json)
            if rules is None:
                rules = [tuple(r) for r in json.loads(rules_json)["rules"]]
                cache[rules_json] = rules
            rest = canon.split("://", 1)[1]
            i = rest.find("/")
            path = rest[i:] if i >= 0 else "/"
            allowed.append(robots_allowed(rules, path))
        pdf["allowed"] = pd.Series(allowed, dtype=bool)
        yield pdf
