"""Deterministic synthetic web corpus (FIXTURES.md §1-§3).

Generates the ``pages`` table — the "web" the crawler fetches from, per
the input hint shape ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)`` — plus the ``seeds`` table (the reference's
``Source`` rows, ``src/database/models.py:38-58`` / ``news-sources.txt``)
and a ``url_index`` CSV shaped like the reference's ``url.csv:1`` header.

Properties (seed-stable, byte-stable):
  * H hosts with Zipf-skewed page counts — the hottest host holds ≥30%
    of all pages, to exercise salted-host partitioning;
  * per-host ``robots.txt`` page disallowing the ``/blocked/`` subtree
    (~10% of that host's pages) with a per-host Crawl-delay;
  * a seeded random link graph embedded in the html as ``<a href>``
    (~80% same-host, ~20% cross-host edges) plus dangling links to URLs
    absent from pages (the fetch-miss path);
  * boilerplate (<nav>/<script>/<footer>) wrapped around real <p>
    paragraphs, so extraction is non-trivial;
  * ``text`` is constructed independently from the same paragraph
    inputs as the html — the extractor must recover it byte-identically
    (asserted corpus-wide in tests/test_extract.py).

Determinism is **per-host**: every host's content comes from its own
``random.Random(f"{seed}:...:{host_idx}")`` stream, so hosts generate
independently (and in parallel via multiprocessing at bench scale)
while the byte output stays identical regardless of worker count.
"""

from __future__ import annotations

import hashlib
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_VERSION = 10  # bump to invalidate cached corpora (v10: puppeteer
# hosts serve JS-heavy article pages — first paragraph as a <p> shell,
# the rest in a JSON-LD articleBody block that only the js_render
# extraction variant recovers; ground-truth text is unchanged)

_WORDS = (
    "the quick brown fox jumps over a lazy dog while reporters file stories "
    "about markets policy science culture sports weather elections technology "
    "energy health climate courts industry transit housing schools research "
    "data networks security privacy councils budgets rivers forests cities"
).split()

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "es", "de", "fr"]

BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _sentence(rng: random.Random, n: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(ws).capitalize() + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 14)) for _ in range(rng.randint(2, 4)))


def _zipf_counts(n_pages: int, n_hosts: int) -> list[int]:
    """Page count per host: host 0 gets ~33%, rest Zipf-ish tail."""
    weights = [1.0 / (i + 1) ** 0.8 for i in range(n_hosts)]
    weights[0] = sum(weights)  # hot host ≈ half the remaining mass → ~33%+
    total = sum(weights)
    counts = [max(1, int(n_pages * w / total)) for w in weights]
    # rounding drift onto the hot host; clamp to >=1 — with n_hosts close
    # to n_pages the per-host floor of 1 can overshoot n_pages and the
    # drift would drive the hot host negative (empty URL universe →
    # randrange(0) crash in cross-host link draws)
    counts[0] = max(1, counts[0] + n_pages - sum(counts))
    return counts


def _host_urls(seed: int, i: int, host: str, count: int) -> list[str]:
    """URL universe of one host — derivable without generating content,
    so cross-host links never need another worker's output."""
    rng = random.Random(f"{seed}:urls:{i}")
    urls = []
    for j in range(count):
        section = "blocked" if j % 10 == 9 else rng.choice(["world", "tech", "sport", "biz"])
        urls.append(f"https://{host}/{section}/art-{j:06d}.html")
    return urls


def _gen_host(args) -> dict:
    """Generate one host's rows (robots, homepage, articles). Pure
    function of (seed, host index, url universe) — process-pool safe."""
    seed, i, n_hosts, host, all_host_urls, dangling, paras_range = args
    rng = random.Random(f"{seed}:content:{i}")
    mine = all_host_urls[i]
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}

    def add(url, html, text, j):
        rows["url"].append(url)
        rows["warc_ts"].append(BASE_TS + timedelta(hours=i, seconds=j))
        rows["html"].append(html.encode("utf-8"))
        rows["text"].append(text)
        rows["lang"].append(rng.choice(_LANGS))

    # robots.txt (1/4 of hosts carry a Crawl-delay)
    delay = "\nCrawl-delay: 2" if i % 4 == 1 else ""
    body = f"User-agent: *\nDisallow: /blocked/{delay}\n"
    add(
        f"https://{host}/robots.txt",
        f"<html><head><title>robots</title></head><body><pre>{body}</pre></body></html>",
        "",
        0,
    )
    # RSS-ish feed page (S4): <item> entries with title/link/pubDate
    # (feedparser entry shape, ref feed_scraper.py:169-188), newest 25
    # articles — the extraction contract caps at 20 entries per feed
    tail = mine[-25:]
    base_j = len(mine) - len(tail)
    items = "".join(
        f"<item><title>Story {base_j + k} on {host}</title><link>{u}</link>"
        f"<pubDate>{(BASE_TS + timedelta(hours=(base_j + k) % 240)).strftime('%a, %d %b %Y %H:%M:%S +0000')}</pubDate>"
        "</item>\n"
        for k, u in enumerate(tail)
    )
    add(
        f"https://{host}/feed.xml",
        f'<rss version="2.0"><channel><title>{host} feed</title>\n{items}</channel></rss>',
        "",
        2,
    )
    # SPA shell page (F12: script-count / SPA sniff, url_classifier.py:286-314):
    # many <script> tags, an app mount div, near-zero visible text.  NOT
    # linked from anywhere — it exercises classification over the raw
    # pages table without perturbing the crawl graph.
    add(
        f"https://{host}/app",
        "<html><head><title>app</title>"
        + "".join(f'<script src="/static/chunk-{k}.js"></script>' for k in range(4))
        + '</head><body><div id="root"></div>'
        "<script>window.__APP__=1;</script></body></html>",
        "",
        1,
    )
    # homepage (seed entry point)
    links = "".join(
        f'<a href="{u}">{u.rsplit("/", 1)[-1]}</a>\n' for u in mine[: min(len(mine), 50)]
    )
    add(
        f"https://{host}/",
        f"<html><head><title>{host} home</title></head><body>"
        f'<nav><a href="/about">about</a> <a href="/feed.xml">rss</a></nav>'
        f"<p>Front page of {host}.</p>{links}"
        f"<footer>copyright</footer></body></html>",
        f"Front page of {host}.",
        1,
    )
    # article pages with embedded link graph
    lo, hi = paras_range
    for j, url in enumerate(mine):
        n_links = rng.randint(2, 6)
        targets = []
        for _ in range(n_links):
            r = rng.random()
            if r < 0.78 and len(mine) > 1:
                targets.append(mine[rng.randrange(len(mine))])
            elif r < 0.96:
                other = rng.randrange(n_hosts)
                targets.append(all_host_urls[other][rng.randrange(len(all_host_urls[other]))])
            else:
                targets.append(dangling[rng.randrange(len(dangling))])
        anchors = "".join(f'<a href="{t}">link</a> ' for t in targets)
        # puppeteer-strategy hosts (same i%3 rule as seeds.scraper_type)
        # serve JS-heavy pages: only the first paragraph renders as a
        # <p> shell; the rest rides in a JSON-LD articleBody that the
        # base extractor's <script> boilerplate strip removes — the
        # js_render variant (functions/extract.py) recovers it, so the
        # stored ground-truth text is IDENTICAL either way by spec
        js_host = i % 3 == 2
        # 0-3 images per article, occasionally duplicated (exercises the
        # extractor's order-preserving image de-dup, ref scraper.py:214-226)
        n_imgs = rng.randint(0, 3)
        img_urls = [f"https://{host}/img/{j % 50}-{k}.jpg" for k in range(n_imgs)]
        if n_imgs >= 2 and rng.random() < 0.3:
            img_urls.append(img_urls[0])
        imgs = "".join(f'<img src="{u}" alt="im">' for u in img_urls)
        para_texts = [_paragraph(rng) for _ in range(rng.randint(lo, hi))]
        if js_host:
            # SPA shape: <p> shell with the first paragraph only, the
            # rest in JSON-LD (paragraph text is words+periods — no
            # quotes/backslashes — so plain string embedding is valid
            # JSON and regex-recoverable in all three engines)
            paras = f"<p>{para_texts[0]}</p>"
            ld_body = " ".join(para_texts[1:])
            ldjson = (
                '<script type="application/ld+json">'
                '{"@context":"https://schema.org","@type":"NewsArticle",'
                f'"articleBody":"{ld_body}"}}'
                "</script>"
            )
        else:
            paras = "".join(f"<p>{p}</p>" for p in para_texts)
            ldjson = ""
        author = rng.choice(["A. Reporter", "B. Writer", "C. Editor"])
        pub = (BASE_TS + timedelta(hours=j % 240)).strftime("%Y-%m-%dT%H:%M:%S+00:00")
        html = (
            "<html><head>"
            f"<title>Story {j} on {host}</title>"
            f'<meta name="author" content="{author}">'
            f'<meta property="article:published_time" content="{pub}">'
            f"<style>p{{color:black}}</style>{ldjson}</head><body>"
            '<nav><a href="/">home</a> | sections</nav>'
            f"{paras}{imgs}<div>{anchors}</div>"
            "<script>var tracking=1;</script>"
            "<footer>subscribe | contact</footer></body></html>"
        )
        add(url, html, " ".join(" ".join(para_texts).split()), j + 2)
    return rows


def generate_corpus(
    out_dir: str,
    n_pages: int = 2000,
    n_hosts: int = 20,
    seed: int = 42,
    paras_range: tuple[int, int] = (2, 5),
    workers: int | None = None,
) -> dict:
    """Generate pages/seeds/url_index under ``out_dir``; returns paths.

    Idempotent (marker file) so bench-scale corpora are generated once.
    ``paras_range`` controls page weight — (2,5) ≈ 1.5 KB pages for unit
    tests, (12,22) ≈ realistic article-sized pages for benchmarks.
    ``workers`` parallelizes per-host generation; output bytes do not
    depend on it.
    """
    key = f"v{CORPUS_VERSION}_p{n_pages}_h{n_hosts}_s{seed}_pp{paras_range[0]}-{paras_range[1]}"
    marker = os.path.join(out_dir, f".corpus_{key}")
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "url_index": os.path.join(out_dir, "url_index.csv"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    # drop markers from other param sets: regenerating into the same dir
    # overwrites the parquet files, so a surviving old marker would make
    # a LATER call with the old params silently return this corpus
    for stale in os.listdir(out_dir):
        if stale.startswith(".corpus_") and stale != f".corpus_{key}":
            os.remove(os.path.join(out_dir, stale))

    counts = _zipf_counts(n_pages, n_hosts)
    hosts = [f"news{i}.example.com" for i in range(n_hosts)]
    all_host_urls = [_host_urls(seed, i, h, c) for i, (h, c) in enumerate(zip(hosts, counts))]
    drng = random.Random(f"{seed}:dangle")
    dangling = sorted(
        {
            f"https://{drng.choice(hosts)}/gone/missing-{i:05d}.html"
            for i in range(max(1, n_pages // 50))
        }
    )

    jobs = [
        (seed, i, n_hosts, hosts[i], all_host_urls, dangling, paras_range)
        for i in range(n_hosts)
    ]
    if workers is None:
        workers = min(os.cpu_count() or 4, 16) if n_pages >= 20000 else 1
    if workers > 1:
        from multiprocessing import Pool

        with Pool(workers) as pool:
            host_rows = pool.map(_gen_host, jobs)
    else:
        host_rows = [_gen_host(j) for j in jobs]

    cols = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for rows in host_rows:  # host order → deterministic row order
        for k in cols:
            cols[k].extend(rows[k])
    pages = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us", tz="UTC")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )
    # small row groups so engines can byte-range-split a single file —
    # the local analog of Common Crawl's many-WARC layout
    pq.write_table(pages, paths["pages"], row_group_size=2048)

    # --- seeds table (reference Source analog) ---------------------------
    seed_rows = {
        "source_id": [hashlib.md5(h.encode()).hexdigest()[:12] for h in hosts],
        "domain": list(hosts),
        "base_url": [f"https://{h}/" for h in hosts],
        "scraper_type": [["newspaper", "feed", "puppeteer"][i % 3] for i in range(n_hosts)],
        "active": [i % 7 != 6 for i in range(n_hosts)],
        "crawl_frequency": [[6, 12, 24][i % 3] for i in range(n_hosts)],
        "priority": [1 + (i % 3) for i in range(n_hosts)],
        "max_urls": [100] * n_hosts,
        "crawl_delay": [2 if i % 4 == 1 else 1 for i in range(n_hosts)],
    }
    pq.write_table(pa.table(seed_rows), paths["seeds"])

    # --- url_index csv (reference url.csv shape) --------------------------
    all_urls = [u for urls in all_host_urls for u in urls]
    with open(paths["url_index"], "w", encoding="utf-8") as f:
        f.write("indexed_date,language,media_name,media_url,publish_date,title,url\n")
        for i, u in enumerate(all_urls[:: max(1, len(all_urls) // 500)]):
            h = u.split("/")[2]
            f.write(
                f"2025-01-{(i % 28) + 1:02d},en,{h},https://{h}/,2025-01-01,Story {i},{u}\n"
            )

    with open(marker, "w") as f:
        f.write(key)
    return paths


def robots_body_of(html_bytes: bytes) -> str:
    """Recover the robots.txt body from its synthetic html wrapper."""
    raw = html_bytes.decode("utf-8", errors="replace")
    start = raw.find("<pre>")
    end = raw.find("</pre>")
    if start < 0 or end < 0:
        return ""
    return raw[start + 5 : end]
