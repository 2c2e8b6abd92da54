"""The frozen crawl round spec as ONE ANSI-SQL statement (DuckDB oracle).

A third, fully independent implementation of the crawl semantics — after
the Spark engine (``crawler.py``) and the pure-Python oracle
(``oracle.py``) — written only from the frozen scalar contracts:
canonicalize (``CANON_SQL``), 60-bit url hash, the byte-identical
extraction spec (``functions/extract.py`` docstring), the robots parser
spec (``functions/robots.py``), and the round protocol (anti-join seen →
robots terminal deny → per-host budget admission in (priority,
discovered_round, url_hash, canon_url) order → fetch → extract → links
at default priority next round).  ``max_rounds`` is unrolled into
chained CTEs; everything else is plain joins, windows and regexes, so
the driver's DuckDB gate can replay the ENTIRE iterative crawl and
hash-compare global fetch order and article rows against the engine.

Equivalence is asserted three ways in tests/test_crawl_sql_oracle.py:
SQL ≡ pure-Python oracle (order, statuses, byte-identical text) and —
via the driver-gate replica — SQL ≡ Spark engine output.

The boilerplate regex expands the Python spec's backreference
(``<(script|…)\\b.*?</\\1>``) into a per-tag alternation because RE2 has
no backreferences; per-tag pairing is what the backreference expressed.
"""

from __future__ import annotations

from .crawler import CrawlConfig
from .functions.canonical import CANON_SQL, HASH60_SQL

_BOILER_TAGS = ("script", "style", "nav", "header", "footer", "aside")
_BOILER = "|".join(rf"<{t}\b.*?</{t}\s*>" for t in _BOILER_TAGS)
# single frozen hash contract (canonical.HASH60_SQL) — no local copy so a
# contract change cannot silently diverge the oracle from the engine
_HASH60 = HASH60_SQL

# resolve_link spec (functions/extract.resolve_link) for a trimmed href
# against an already-canonical base url (scheme/host/cu columns in scope).
_RESOLVE = """
    CASE
      WHEN trim({h}) = '' OR starts_with(trim({h}), '#')
           OR starts_with(trim({h}), 'javascript:') OR starts_with(trim({h}), 'mailto:')
        THEN NULL
      WHEN contains(substring(trim({h}), 1, 10), '://') THEN trim({h})
      WHEN starts_with(trim({h}), '//') THEN scheme || ':' || trim({h})
      WHEN starts_with(trim({h}), '/') THEN scheme || '://' || host || trim({h})
      ELSE scheme || '://' || host ||
           regexp_replace(regexp_extract(cu, '^[a-z]+://[^/]*(/[^?#]*)', 1), '[^/]*$', '') || trim({h})
    END
"""


# Longest-match robots decision over a (path, rules) pair, where rules is
# LIST<STRUCT(prefix, allow)> in file order — mirrors robots_allowed():
# no rules or no matching prefix → allowed; else allowed iff some rule of
# maximal matching-prefix length is an Allow.
ALLOWED_SQL = """
    CASE WHEN {rules} IS NULL OR len({rules}) = 0 THEN true
         ELSE (
           CASE WHEN len(list_filter({rules}, x -> starts_with({path}, x.prefix))) = 0 THEN true
           ELSE len(list_filter({rules},
                 x -> starts_with({path}, x.prefix) AND x.allow
                      AND length(x.prefix) = list_max(list_transform(
                            list_filter({rules}, y -> starts_with({path}, y.prefix)),
                            y -> length(y.prefix))))) > 0
           END) END
"""

_ROBOTS_BODY = (
    "CASE WHEN position('<pre>' IN raw) > 0 AND position('</pre>' IN raw) > 0 "
    "THEN substring(raw, position('<pre>' IN raw) + 5, "
    "position('</pre>' IN raw) - position('<pre>' IN raw) - 5) ELSE '' END"
)


def robots_dim_sql(pages_path: str) -> str:
    """(host, rules LIST<STRUCT(prefix,allow)>, delay) from the root
    robots.txt pages — the parse_robots() spec in SQL: strip comments,
    windowed user-agent grouping (a rule applies iff its nearest
    preceding User-agent line is '*'), rules kept in file order,
    last-wins crawl-delay."""
    return rf"""
WITH pagemeta AS (
  SELECT url AS cu, decode(html) AS raw,
         regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
         regexp_extract(url, '^[a-z]+://([^/?#]*)', 1) AS host
  FROM read_parquet('{pages_path}')
),
robots_lines AS (
  SELECT host, pos, clean,
    lower(trim(split_part(clean, ':', 1))) AS key,
    trim(substring(clean, position(':' IN clean) + 1)) AS val
  FROM (
    SELECT host,
      unnest(string_split({_ROBOTS_BODY}, chr(10))) AS ln0,
      unnest(range(1, len(string_split({_ROBOTS_BODY}, chr(10)))+1)) AS pos
    FROM (
      -- one robots page per host, min canonical URL (spec shared with
      -- the engine dim and the Python oracle): cross-scheme duplicates
      -- (http:// and https:// robots.txt) must not merge or fan out
      SELECT host, raw FROM pagemeta
      WHERE cu = scheme || '://' || host || '/robots.txt'
      QUALIFY row_number() OVER (PARTITION BY host ORDER BY cu) = 1
    ) rp
  ) z, LATERAL (SELECT trim(split_part(z.ln0, '#', 1)) AS clean) c
  WHERE position(':' IN trim(split_part(z.ln0, '#', 1))) > 0
),
robots_grp AS (
  SELECT *, max(CASE WHEN key = 'user-agent' THEN pos END)
              OVER (PARTITION BY host ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua_pos
  FROM robots_lines
),
robots_app AS (
  SELECT g.*,
    (SELECT bool_or(g2.val = '*') FROM robots_grp g2
      WHERE g2.host = g.host AND g2.pos = g.ua_pos AND g2.key = 'user-agent') AS ap
  FROM robots_grp g
)
SELECT hosts.host, COALESCE(r.rules, []) AS rules, d.delay
FROM (SELECT DISTINCT host FROM robots_app) hosts
LEFT JOIN (
  SELECT host, list(struct_pack(prefix := val, allow := (key = 'allow')) ORDER BY pos) AS rules
  FROM robots_app WHERE key IN ('allow','disallow') AND ap AND val <> ''
  GROUP BY host
) r ON hosts.host = r.host
LEFT JOIN (
  SELECT host, arg_max(TRY_CAST(val AS DOUBLE), pos) AS delay
  FROM robots_app WHERE key = 'crawl-delay' AND ap AND TRY_CAST(val AS DOUBLE) IS NOT NULL
  GROUP BY host
) d ON hosts.host = d.host
"""


def crawl_sql(pages_path: str, seeds_path: str, cfg: CrawlConfig) -> str:
    """Full crawl as SQL: one row per admitted URL, in global fetch order,
    with status and the extracted article fields needed downstream."""
    canon_base = CANON_SQL.format(col="base_url")
    canon_href = CANON_SQL.format(col="target")

    head = rf"""
WITH pagemeta AS (
  SELECT url AS cu, decode(html) AS raw,
         regexp_replace(decode(html), '(?is){_BOILER}', ' ', 'g') AS body,
         regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
         regexp_extract(url, '^[a-z]+://([^/?#]*)', 1) AS host
  FROM read_parquet('{pages_path}')
),
strat AS (
  -- J3 strategy dim (engine: strategy_dim from ALL seed rows, host-
  -- keyed; corpus domains are unique so min() is a no-op determinizer)
  SELECT domain AS host, min(scraper_type) AS scraper_type
  FROM read_parquet('{seeds_path}') GROUP BY domain
),
ext AS (
  SELECT cu, pagemeta.host AS host,
    COALESCE(trim(regexp_replace(regexp_replace(regexp_extract(body, '(?is)<title[^>]*>(.*?)</title\s*>', 1), '<[^>]+>', ' ', 'g'), '[ \t\n\r\f\x0b]+', ' ', 'g')), '') AS title,
    -- text: <p> paragraphs; puppeteer-strategy hosts (JS-heavy variant,
    -- functions/extract.py js_render spec) append the JSON-LD
    -- articleBody blocks read from the RAW html (the boilerplate strip
    -- removes every <script> subtree from body)
    COALESCE(trim(regexp_replace(
      array_to_string(list_transform(
        regexp_extract_all(body, '(?is)<p\b[^>]*>(.*?)</p\s*>', 1),
        x -> regexp_replace(x, '<[^>]+>', ' ', 'g')), ' ')
      || CASE WHEN COALESCE(strat.scraper_type, '') = 'puppeteer'
              THEN ' ' || array_to_string(flatten(list_transform(
                regexp_extract_all(raw, '(?is)<script\b[^>]*?\btype[ \t\n\r\f\x0b]*=[ \t\n\r\f\x0b]*["'']application/ld\+json["''][^>]*>(.*?)</script[ \t\n\r\f\x0b]*>', 1),
                b -> regexp_extract_all(b, '"articleBody"[ \t\n\r\f\x0b]*:[ \t\n\r\f\x0b]*"([^"]*)"', 1))), ' ')
              ELSE '' END,
      '[ \t\n\r\f\x0b]+', ' ', 'g')), '') AS text,
    len(regexp_extract_all(raw, '(?i)<meta\b[^>]*?\bname\s*=\s*["'']author["''][^>]*?\bcontent\s*=\s*["'']([^"''>]*)["'']', 1)) AS n_authors,
    regexp_matches(raw, '(?i)<meta\b[^>]*?\bproperty\s*=\s*["'']article:published_time["''][^>]*?\bcontent\s*=\s*["'']([^"''>]*)["'']') AS has_published
  FROM pagemeta LEFT JOIN strat ON strat.host = pagemeta.host
),
imgs AS (
  SELECT cu, CAST(count(DISTINCT link) AS INT) AS n_images FROM (
    SELECT cu, {canon_href} AS link FROM (
      SELECT cu, {_RESOLVE.format(h="src")} AS target FROM (
        SELECT cu, scheme, host,
               unnest(regexp_extract_all(body, '(?i)<img\b[^>]*?\bsrc\s*=\s*["'']([^"''>]+)["'']', 1)) AS src
        FROM pagemeta) s0
    ) s1 WHERE target IS NOT NULL
  ) s2 WHERE link IS NOT NULL GROUP BY cu
),
hx AS (
  SELECT cu, scheme, host, unnest(hrefs) AS href, unnest(range(1, len(hrefs)+1)) AS pos
  FROM (
    SELECT cu, scheme, host,
      list_concat(
        regexp_extract_all(body, '(?i)<a\b[^>]*?\bhref\s*=\s*["'']([^"''>]+)["'']', 1),
        list_slice(regexp_extract_all(body, '(?i)<link>[ \t\n\r\f\x0b]*(https?://[^< \t\n\r\f\x0b]+)[ \t\n\r\f\x0b]*</link>', 1), 1, 20)
      ) AS hrefs
    FROM pagemeta) hr
),
lc AS (
  SELECT cu, pos, {canon_href} AS link
  FROM (SELECT cu, pos, {_RESOLVE.format(h="href")} AS target FROM hx) r
  WHERE target IS NOT NULL
),
lk AS (
  SELECT cu, link, row_number() OVER (PARTITION BY cu ORDER BY pos) AS rk
  FROM (
    SELECT cu, pos, link, row_number() OVER (PARTITION BY cu, link ORDER BY pos) AS occ
    FROM lc WHERE link IS NOT NULL) d
  WHERE occ = 1
),
page_links AS (
  SELECT cu, link FROM lk WHERE rk <= {cfg.max_links_per_page}
),
robots_dim AS (
  SELECT * FROM ({robots_dim_sql(pages_path)}) rdim
),
seeds0 AS (
  SELECT {canon_base} AS cu, priority
  FROM read_parquet('{seeds_path}') WHERE active
),
pending_0 AS (
  SELECT cu, CAST(min(priority) AS INT) AS prio, 0 AS disc
  FROM seeds0 WHERE cu IS NOT NULL GROUP BY cu
)"""

    rounds = []
    for r in range(cfg.max_rounds):
        seen_union = (
            "SELECT cu FROM ("
            + " UNION ALL ".join(
                f"SELECT cu FROM denied_{i} UNION ALL SELECT cu FROM admitted_{i}"
                for i in range(r)
            )
            + ") su"
        ) if r > 0 else "SELECT NULL AS cu WHERE false"
        rounds.append(rf"""
cand_{r} AS (
  SELECT p.cu, p.prio, p.disc,
    regexp_extract(p.cu, '^[a-z]+://([^/?#]*)', 1) AS host,
    COALESCE('/' || regexp_extract(p.cu, '^[a-z]+://[^/]*/(.*)$', 1), '/') AS path
  FROM pending_{r} p
  WHERE p.cu NOT IN ({seen_union})
),
cand_rb_{r} AS (
  SELECT c.*,
    {ALLOWED_SQL.format(rules="rd.rules", path="c.path")} AS allowed,
    greatest(1, CAST(trunc({cfg.round_budget}.0 / greatest(COALESCE(rd.delay, 1.0), 1.0)) AS INT)) AS budget
  FROM cand_{r} c LEFT JOIN robots_dim rd ON c.host = rd.host
),
denied_{r} AS (
  SELECT cu, 'robots_denied' AS status FROM cand_rb_{r} WHERE NOT allowed
),
ranked_{r} AS (
  SELECT cu, prio, disc, host, budget, {_HASH60.format(col="cu")} AS h,
    row_number() OVER (PARTITION BY host ORDER BY prio, disc, {_HASH60.format(col="cu")}, cu) AS rn
  FROM cand_rb_{r} WHERE allowed
),
admitted_{r} AS (
  SELECT cu, prio, disc, h, {r} AS round_id FROM ranked_{r} WHERE rn <= budget
),
deferred_{r} AS (
  SELECT cu, prio, disc FROM ranked_{r} WHERE rn > budget
),
links_{r} AS (
  SELECT pl.link AS cu, {cfg.default_priority} AS prio, {r + 1} AS disc
  FROM admitted_{r} a JOIN page_links pl ON a.cu = pl.cu
  GROUP BY pl.link
),
pending_{r + 1} AS (
  SELECT cu, CAST(k.prio AS INT) AS prio, CAST(k.disc AS INT) AS disc FROM (
    SELECT cu, min(struct_pack(prio := prio2, disc := disc2)) AS k FROM (
      SELECT cu, prio AS prio2, disc AS disc2 FROM deferred_{r}
      UNION ALL
      SELECT cu, prio AS prio2, disc AS disc2 FROM links_{r}
    ) u GROUP BY cu
  ) g
)""")

    tail = rf"""
order_all AS (
  {" UNION ALL ".join(f"SELECT cu, prio, disc, h, round_id FROM admitted_{r}" for r in range(cfg.max_rounds))}
),
ordered AS (
  SELECT cu, h AS url_hash, round_id,
    CAST(row_number() OVER (ORDER BY round_id, prio, disc, h, cu) AS BIGINT) AS fetch_seq
  FROM order_all
)
SELECT o.cu AS url, o.url_hash, o.fetch_seq, o.round_id,
  regexp_extract(o.cu, '^[a-z]+://([^/?#]*)', 1) AS source_domain,
  CASE WHEN e.cu IS NULL THEN 'missing'
       WHEN length(e.text) >= {cfg.min_content_len} THEN 'fetched'
       ELSE 'short' END AS status,
  e.title, e.text, e.n_authors, e.has_published,
  COALESCE(i.n_images, 0) AS n_images
FROM ordered o
LEFT JOIN ext e ON o.cu = e.cu
LEFT JOIN imgs i ON o.cu = i.cu
"""
    return head + "," + ",".join(rounds) + "," + tail


def crawl_order_sql(pages_path: str, seeds_path: str, cfg: CrawlConfig) -> str:
    """(url, fetch_seq) — the engine's global fetch order."""
    return (
        f"SELECT url, fetch_seq FROM ({crawl_sql(pages_path, seeds_path, cfg)}) c "
        "ORDER BY fetch_seq"
    )


def crawl_articles_sql(pages_path: str, seeds_path: str, cfg: CrawlConfig) -> str:
    """Article rows with the reference-shaped weighted quality score
    (crawler.py step 6, mirroring base_scraper.py:69-117): weighted
    content/metadata/title/images components normalized by the present
    components' total weight, rounded to 6dp — the exact expression tree
    of the Spark side, so the doubles agree bit-for-bit."""
    return rf"""
WITH crawl AS ({crawl_sql(pages_path, seeds_path, cfg)}),
a AS (SELECT * FROM crawl WHERE status = 'fetched'),
w AS (
  SELECT *,
    CASE WHEN length(text) > 0 THEN 0.3 ELSE 0.0 END AS content_w,
    CASE WHEN title IS NOT NULL AND length(title) > 10 THEN 0.2 ELSE 0.0 END AS title_w,
    CASE WHEN n_images > 0 THEN 0.2 ELSE 0.0 END AS img_w
  FROM a)
SELECT url, url_hash, source_domain, title,
  floor(((least(length(text) / 2000.0, 1.0) * content_w
       + 0.3 * (0.25 * (CASE WHEN n_authors > 0 THEN 1.0 ELSE 0.0 END)
              + 0.25 * (CASE WHEN has_published THEN 1.0 ELSE 0.0 END))
       + least(length(title) / 50.0, 1.0) * title_w
       + least(n_images / 3.0, 1.0) * img_w)
      / (content_w + 0.3 + title_w + img_w)) * 1000000.0 + 0.5) / 1000000.0
    AS quality_score,
  round_id, fetch_seq
FROM w
"""


def host_pagerank_sql(
    pages_path: str,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    max_links: int = 100,
) -> str:
    """Integer-exact host PageRank as one SQL statement (DuckDB oracle
    twin of operators/graph.host_pagerank).

    Link extraction reuses the crawl oracle's frozen spellings (same
    _BOILER alternation, same href/feed-item regexes, same _RESOLVE +
    CANON_SQL, same first-occurrence dedup + per-page cap) so the edge
    relation is the crawl's page_links CTE verbatim; the rank recurrence
    is scaled-integer (r*w // out, teleport + d*s // 100) so every
    division is exact in any engine.  Fixed `iterations` unroll into
    chained CTEs, mirroring the Spark loop.
    """
    teleport = scale - (scale * damping_pct) // 100
    head = _host_graph_head_sql(pages_path, max_links) + f""",
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src),
r_0 AS (SELECT host, CAST({scale} AS BIGINT) AS rank FROM hosts)"""
    parts = [head]
    for k in range(1, iterations + 1):
        parts.append(f""",
s_{k} AS (
  SELECT e.dst AS host, CAST(sum((r.rank * e.w) // o.outw) AS BIGINT) AS s
  FROM edges e JOIN r_{k - 1} r ON e.src = r.host JOIN outw o ON e.src = o.src
  GROUP BY e.dst
),
r_{k} AS (
  SELECT h.host,
         CAST({teleport} + ({damping_pct} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
  FROM hosts h LEFT JOIN s_{k} s ON h.host = s.host
)""")
    parts.append(f"\nSELECT host, rank FROM r_{iterations}")
    return "".join(parts)


def host_hits_sql(
    pages_path: str,
    iterations: int = 3,
    scale: int = 1_000_000,
    max_links: int = 100,
) -> str:
    """Integer-exact HITS as one SQL statement (DuckDB oracle twin of
    operators/graph.host_hits): same frozen edge extraction as the
    PageRank oracle, then `iterations` unrolled (authority, hub) CTE
    pairs — sum(score*w) per endpoint, max-normalized with exact
    integer division, 0 for hosts missing the relevant edges."""
    head = _host_graph_head_sql(pages_path, max_links) + f""",
h_0 AS (SELECT host, CAST({scale} AS BIGINT) AS hub FROM hosts)"""
    parts = [head]
    for k in range(1, iterations + 1):
        parts.append(f""",
ar_{k} AS (
  SELECT e.dst AS host, CAST(sum(h.hub * e.w) AS BIGINT) AS raw
  FROM edges e JOIN h_{k - 1} h ON e.src = h.host GROUP BY e.dst
),
a_{k} AS (
  SELECT hs.host, CAST(COALESCE(
           (n.raw * {scale}) // greatest(max(n.raw) OVER (), 1), 0) AS BIGINT) AS auth
  FROM hosts hs LEFT JOIN ar_{k} n ON hs.host = n.host
),
hr_{k} AS (
  SELECT e.src AS host, CAST(sum(a.auth * e.w) AS BIGINT) AS raw
  FROM edges e JOIN a_{k} a ON e.dst = a.host GROUP BY e.src
),
h_{k} AS (
  SELECT hs.host, CAST(COALESCE(
           (n.raw * {scale}) // greatest(max(n.raw) OVER (), 1), 0) AS BIGINT) AS hub
  FROM hosts hs LEFT JOIN hr_{k} n ON hs.host = n.host
)""")
    parts.append(
        f"\nSELECT a.host, a.auth, h.hub FROM a_{iterations} a "
        f"JOIN h_{iterations} h ON a.host = h.host"
    )
    return "".join(parts)


def _page_links_head_sql(pages_path: str, max_links: int) -> str:
    """Shared page-level link CTE chain (through ``page_links``) — the
    crawl oracle's frozen link extraction; consumed by the host-graph
    head below and the page-level k-core oracle."""
    canon_href = CANON_SQL.format(col="target")
    return rf"""
WITH pagemeta AS (
  SELECT url AS cu,
         regexp_replace(decode(html), '(?is){_BOILER}', ' ', 'g') AS body,
         regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
         regexp_extract(url, '^[a-z]+://([^/?#]*)', 1) AS host
  FROM read_parquet('{pages_path}')
),
hx AS (
  SELECT cu, scheme, host, unnest(hrefs) AS href, unnest(range(1, len(hrefs)+1)) AS pos
  FROM (
    SELECT cu, scheme, host,
      list_concat(
        regexp_extract_all(body, '(?i)<a\b[^>]*?\bhref\s*=\s*["'']([^"''>]+)["'']', 1),
        list_slice(regexp_extract_all(body, '(?i)<link>[ \t\n\r\f\x0b]*(https?://[^< \t\n\r\f\x0b]+)[ \t\n\r\f\x0b]*</link>', 1), 1, 20)
      ) AS hrefs
    FROM pagemeta) hr
),
lc AS (
  SELECT cu, pos, {canon_href} AS link
  FROM (SELECT cu, pos, {_RESOLVE.format(h="href")} AS target FROM hx) r
  WHERE target IS NOT NULL
),
lk AS (
  SELECT cu, link, row_number() OVER (PARTITION BY cu ORDER BY pos) AS rk
  FROM (
    SELECT cu, pos, link, row_number() OVER (PARTITION BY cu, link ORDER BY pos) AS occ
    FROM lc WHERE link IS NOT NULL) d
  WHERE occ = 1
),
page_links AS (
  SELECT cu, link FROM lk WHERE rk <= {max_links}
)"""


def host_lpa_sql(pages_path: str, iterations: int = 4, max_links: int = 100) -> str:
    """Deterministic synchronous label propagation as one SQL statement
    (DuckDB oracle twin of operators/graph.host_label_propagation):
    shared frozen edge-extraction head, then ``iterations`` unrolled
    vote/pick CTE pairs — per-(host, label) vote = Σ undirected edge
    weight from neighbors holding that label plus one self-vote; winner
    by (votes DESC, label ASC).  ``und`` and every ``l_k`` are
    MATERIALIZED: each is referenced twice per round and DuckDB inlines
    a doubly-referenced CTE chain exponentially otherwise (the
    page_kcore lesson)."""
    head = _host_graph_head_sql(pages_path, max_links) + """,
und AS MATERIALIZED (
  SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (
    SELECT src AS a, dst AS b, w FROM edges
    UNION ALL
    SELECT dst AS a, src AS b, w FROM edges)
  GROUP BY 1, 2),
l_0 AS MATERIALIZED (SELECT host, host AS label FROM hosts)"""
    parts = [head]
    for k in range(1, iterations + 1):
        parts.append(f""",
v_{k} AS (
  SELECT host, label, CAST(sum(votes) AS BIGINT) AS votes FROM (
    SELECT u.a AS host, l.label, u.w AS votes
    FROM und u JOIN l_{k - 1} l ON u.b = l.host
    UNION ALL
    SELECT host, label, CAST(1 AS BIGINT) AS votes FROM l_{k - 1})
  GROUP BY 1, 2),
l_{k} AS MATERIALIZED (
  SELECT host, label FROM v_{k}
  QUALIFY row_number() OVER (PARTITION BY host ORDER BY votes DESC, label) = 1)""")
    parts.append(f"""
SELECT host, label AS community,
       CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
FROM l_{iterations}""")
    return "".join(parts)


def host_seed_depth_sql(
    pages_path: str, seeds_path: str, hops: int = 4, max_links: int = 100
) -> str:
    """Capped seed-BFS as one SQL statement (DuckDB oracle twin of
    operators/graph.host_seed_depth): shared frozen edge-extraction
    head, d_0 = seed hosts ∩ page hosts (ALL seed rows), then ``hops``
    unrolled min-relaxation CTEs.  Every d_k is MATERIALIZED (each is
    referenced twice in the next hop — the doubly-referenced-chain
    inlining lesson)."""
    head = _host_graph_head_sql(pages_path, max_links) + f""",
d_0 AS MATERIALIZED (
  SELECT DISTINCT s.domain AS host, CAST(0 AS BIGINT) AS depth
  FROM read_parquet('{seeds_path}') s
  WHERE s.domain IN (SELECT host FROM hosts))"""
    parts = [head]
    for k in range(1, hops + 1):
        parts.append(f""",
d_{k} AS MATERIALIZED (
  SELECT host, CAST(min(depth) AS BIGINT) AS depth FROM (
    SELECT host, depth FROM d_{k - 1}
    UNION ALL
    SELECT e.dst AS host, d.depth + 1 AS depth
    FROM edges e JOIN d_{k - 1} d ON e.src = d.host)
  GROUP BY host)""")
    parts.append(f"\nSELECT host, depth FROM d_{hops}")
    return "".join(parts)


def _host_graph_head_sql(pages_path: str, max_links: int) -> str:
    """Shared host-link-graph CTE chain (through ``edges`` + ``hosts``)
    — the page-links head rolled up to host level; consumed by the
    graph oracles above."""
    return _page_links_head_sql(pages_path, max_links) + rf""",
hosts AS (SELECT DISTINCT host FROM pagemeta),
el AS (
  SELECT pm.host AS src, regexp_extract(pl.link, '^[a-z]+://([^/?#]*)', 1) AS dst
  FROM page_links pl JOIN pagemeta pm ON pl.cu = pm.cu
),
edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM el WHERE src <> dst AND dst IN (SELECT host FROM hosts)
  GROUP BY src, dst
)"""


def host_triangles_sql(pages_path: str, max_links: int = 100) -> str:
    """Degree-ordered triangle counting as one SQL statement (DuckDB
    oracle twin of operators/graph.host_triangles) — shares the frozen
    edge extraction head with the PageRank/HITS oracles, then the
    Suri-Vassilvitskii construction: orient edges by (degree, host)
    rank, enumerate out-edge wedges, close them against the undirected
    edge set, attribute each triangle to its three hosts."""
    head = _host_graph_head_sql(pages_path, max_links)
    return head + """,
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (
  SELECT h AS host, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS h FROM und UNION ALL SELECT b AS h FROM und)
  GROUP BY 1),
o AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN u.a ELSE u.b END AS s,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN u.b ELSE u.a END AS t
  FROM und u JOIN deg da ON u.a = da.host JOIN deg db ON u.b = db.host),
w AS (
  SELECT o1.s AS v1, o1.t AS v2, o2.t AS v3
  FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
tri AS (
  SELECT v1, v2, v3
  FROM w
  WHERE EXISTS (SELECT 1 FROM und
                WHERE und.a = least(w.v2, w.v3)
                  AND und.b = greatest(w.v2, w.v3))),
hosts3 AS (
  SELECT v1 AS host FROM tri
  UNION ALL SELECT v2 FROM tri
  UNION ALL SELECT v3 FROM tri)
SELECT host, CAST(count(*) AS BIGINT) AS n_triangles
FROM hosts3 GROUP BY host
"""


def cocitation_sql(
    pages_path: str,
    max_links: int = 100,
    max_out: int = 20,
    min_inter: int = 2,
) -> str:
    """Co-citation Jaccard as one SQL statement (DuckDB oracle twin of
    operators/graph.cocitation_jaccard) — shared extraction head, then
    the max_out source cap, shared-source pairing, and the consistent
    filtered in-degree denominator."""
    head = _host_graph_head_sql(pages_path, max_links)
    return head + f""",
keep AS (SELECT src FROM edges GROUP BY src HAVING count(*) <= {max_out}),
e2 AS (SELECT src, dst FROM edges WHERE src IN (SELECT src FROM keep)),
deg AS (SELECT dst, CAST(count(*) AS BIGINT) AS d FROM e2 GROUP BY dst),
pr AS (
  SELECT a.dst AS ha, b.dst AS hb, CAST(count(*) AS BIGINT) AS inter
  FROM e2 a JOIN e2 b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2
  HAVING count(*) >= {min_inter})
SELECT ha AS host_a, hb AS host_b, inter,
       da.d AS da, db.d AS db,
       floor((CAST(inter AS DOUBLE) / (da.d + db.d - inter)) * 10000.0 + 0.5)
         / 10000.0 AS jaccard
FROM pr JOIN deg da ON pr.ha = da.dst JOIN deg db ON pr.hb = db.dst
"""


def reciprocity_sql(pages_path: str, max_links: int = 100) -> str:
    """Per-host link reciprocity (DuckDB oracle twin of
    q_graph_reciprocity) — shared extraction head, then the swapped-key
    EXISTS probe and the pinned 4dp fraction."""
    head = _host_graph_head_sql(pages_path, max_links)
    return head + """,
e AS (SELECT src, dst FROM edges),
outd AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
rc AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_recip
  FROM e WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
  GROUP BY src)
SELECT outd.src AS host, out_deg,
       CAST(COALESCE(n_recip, 0) AS BIGINT) AS n_recip,
       floor((CAST(COALESCE(n_recip, 0) AS DOUBLE) / out_deg) * 10000.0 + 0.5)
         / 10000.0 AS reciprocity
FROM outd LEFT JOIN rc ON outd.src = rc.src
"""


def assortativity_sql(pages_path: str, max_links: int = 100) -> str:
    """In-degree assortativity (DuckDB oracle twin of
    operators/graph.degree_assortativity) — shared extraction head,
    directed edges, exact BIGINT moments, one pinned guarded
    division."""
    head = _host_graph_head_sql(pages_path, max_links)
    return head + """,
ind AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
j AS (
  SELECT COALESCE(dx.d, 0) AS x, COALESCE(dy.d, 0) AS y
  FROM edges e
  LEFT JOIN ind dx ON e.src = dx.host
  LEFT JOIN ind dy ON e.dst = dy.host),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM j)
SELECT n, sx, sxy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         floor((CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 10000.0 + 0.5)
           / 10000.0
       END AS assortativity
FROM s
"""


def page_kcore_sql(
    pages_path: str, k: int = 4, iterations: int = 6, max_links: int = 100
) -> str:
    """Page-level k-core as one SQL statement (DuckDB oracle twin of
    operators/graph.page_kcore) — the frozen page-links head, the
    symmetrized distinct edge set, then ``iterations`` peel rounds as
    chained MATERIALIZED CTEs (each referenced twice per round; without
    materialization DuckDB may inline the chain into an exponentially
    replicated tree).  The fixed unroll is the shared contract: both
    engines compute exactly ``iterations`` peels, so they agree even on
    a graph where that unroll has not yet reached the fixpoint (the
    fixpoint property itself is pytest-asserted, not gate-asserted)."""
    parts = [_page_links_head_sql(pages_path, max_links)]
    parts.append(""",
pe AS (
  SELECT DISTINCT cu AS a, link AS b FROM page_links
  WHERE link <> cu AND link IN (SELECT cu FROM pagemeta)
),
und AS MATERIALIZED (
  SELECT a, b FROM pe UNION SELECT b AS a, a AS b FROM pe
),
c_0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM und)""")
    for i in range(1, iterations + 1):
        parts.append(f""",
c_{i} AS MATERIALIZED (
  SELECT u.a AS v FROM und u
  JOIN c_{i - 1} x ON u.a = x.v JOIN c_{i - 1} y ON u.b = y.v
  GROUP BY u.a HAVING count(*) >= {k}
)""")
    parts.append(f"""
SELECT u.a AS url, CAST(count(*) AS BIGINT) AS core_degree
FROM und u
JOIN c_{iterations} x ON u.a = x.v JOIN c_{iterations} y ON u.b = y.v
GROUP BY u.a ORDER BY url
""")
    return "".join(parts)
