"""Pure-Python reference crawl oracle.

An independent, sequential implementation of the frozen round spec —
faithful to the reference's observable semantics (heap order
``scheduler.py:44-56,344-356``; insert-if-absent seen set
``cli.py:72-77``; robots gate ``newspaper_scraper.py:165-167``;
min-content ``newspaper_scraper.py:39,193-203``; link cap
``scraper_gui.py:483-486``) but written with plain dicts/sorts so it
shares NO dataflow code with the Spark engine.  The shared pieces are
exactly the frozen scalar contracts (canonicalize, extract, robots
parser), which is what makes "byte-identical text" a meaningful claim.

The pytest equivalence harness asserts, for the same corpus + config:
  * identical global fetch order (url, fetch_seq),
  * identical final URL-seen set (url_hash, status),
  * byte-identical article text per url,
against the Spark ``FrontierCrawler``.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from .crawler import CrawlConfig
from .functions.canonical import canonicalize_url, host_of, url_hash60
from .functions.extract import extract_page
from .functions.robots import parse_robots, robots_allowed
from .sources.corpus import robots_body_of


def crawl_oracle(pages_path: str, seeds_path: str, config: CrawlConfig = CrawlConfig()):
    """Run the reference crawl; returns dict with order/seen/articles."""
    pages_tbl = pq.read_table(pages_path, columns=["url", "html"]).to_pylist()
    # skip rows whose URL canonicalizes to None (non-http(s)/malformed)
    # — the engine's with_canonical filter does the same; a None key
    # here would crash the robots scan on None.split
    web = {}
    for r in pages_tbl:
        cu = canonicalize_url(r["url"])
        if cu is not None:
            web[cu] = bytes(r["html"])

    robots: dict[str, dict] = {}
    robots_src: dict[str, str] = {}
    for url, html in web.items():
        # robots lives at the HOST ROOT only (spec parity with the
        # engine's anchored filter): /sub/robots.txt is an ordinary page.
        # One robots page per host — min canonical URL wins (the shared
        # spec with the engine dim and the SQL oracle), so cross-scheme
        # duplicates resolve deterministically instead of by scan order.
        scheme = url.split("://", 1)[0]
        host = host_of(url)
        if url == f"{scheme}://{host}/robots.txt":
            if host not in robots_src or url < robots_src[host]:
                robots_src[host] = url
                robots[host] = parse_robots(robots_body_of(html))

    def allowed(url: str) -> bool:
        if not config.respect_robots:
            return True
        host = host_of(url)
        rules = robots.get(host, {}).get("rules")
        rest = url.split("://", 1)[1]
        i = rest.find("/")
        path = rest[i:] if i >= 0 else "/"
        return robots_allowed(rules, path)

    def budget(host: str) -> int:
        delay = robots.get(host, {}).get("delay") or 1.0
        return max(1, int(config.round_budget / max(delay, 1.0)))

    # pending: canon_url -> (priority, discovered_round)
    pending: dict[str, tuple[int, int]] = {}
    seeds = pq.read_table(seeds_path).to_pylist()
    # J3 strategy routing into extraction (reference Source.scraper_type
    # → puppeteer_scraper): hosts marked 'puppeteer' extract with the
    # JS-heavy variant.  Host-keyed, ALL seed rows (active or not) —
    # the engine builds its strategy dim the same way.  Duplicate
    # domains resolve by the explicit tri-engine rule min(scraper_type)
    # (engine groupBy-min, SQL replay min() aggregate).
    strategy: dict[str, str] = {}
    for s in seeds:
        d, st = s["domain"], s["scraper_type"]
        if d not in strategy or st < strategy[d]:
            strategy[d] = st
    for s in seeds:
        if not s["active"]:
            continue
        cu = canonicalize_url(s["base_url"])
        if cu is None:
            continue
        key = (int(s["priority"]), 0)
        if cu not in pending or key < pending[cu]:
            pending[cu] = key

    seen: dict[str, str] = {}  # canon_url -> terminal status
    order: list[tuple[str, int]] = []  # (url, fetch_seq)
    articles: dict[str, dict] = {}
    seq = 0

    for round_id in range(config.max_rounds):
        if not pending:
            break
        # 1. anti-join seen
        candidates = {u: k for u, k in pending.items() if u not in seen}
        # 2. robots gate (terminal deny)
        denied = [u for u in candidates if not allowed(u)]
        for u in denied:
            seen[u] = "robots_denied"
            del candidates[u]
        # 3. per-host budget admission in the frozen total order
        by_host: dict[str, list[tuple[tuple, str]]] = {}
        for u, (prio, disc) in candidates.items():
            by_host.setdefault(host_of(u), []).append(((prio, disc, url_hash60(u)), u))
        admitted: list[tuple[tuple, str]] = []
        deferred: dict[str, tuple[int, int]] = {}
        for host, items in by_host.items():
            items.sort()
            b = budget(host)
            admitted.extend(items[:b])
            for _, u in items[b:]:
                deferred[u] = candidates[u]
        # 4. global fetch order
        admitted.sort()
        new_links: dict[str, tuple[int, int]] = {}
        for key, u in admitted:
            seq += 1
            order.append((u, seq))
            html = web.get(u)
            if html is None:
                seen[u] = "missing"
                continue
            rec = extract_page(
                html, u, js_render=(strategy.get(host_of(u)) == "puppeteer")
            )
            if len(rec["text"]) >= config.min_content_len:
                seen[u] = "fetched"
                articles[u] = {
                    "text": rec["text"],
                    "title": rec["title"],
                    "round_id": round_id,
                }
            else:
                seen[u] = "short"
            for link in rec["out_links"][: config.max_links_per_page]:
                k = (config.default_priority, round_id + 1)
                if link in new_links:
                    new_links[link] = min(new_links[link], k)
                else:
                    new_links[link] = k
        # 5. next frontier = deferred ∪ links, lexicographic-min dedup
        nxt = dict(deferred)
        for u, k in new_links.items():
            if u in nxt:
                nxt[u] = min(nxt[u], k)
            else:
                nxt[u] = k
        pending = nxt

    return {"order": order, "seen": seen, "articles": articles}
