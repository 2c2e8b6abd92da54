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
  * ``text`` is produced by the frozen extractor itself, making the
    byte-identical contract checkable end-to-end.

Everything is generated with ``random.Random(seed)`` + pyarrow — no
external data, no wall-clock.
"""

from __future__ import annotations

import hashlib
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_page

CORPUS_VERSION = 3  # bump to invalidate cached corpora

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


def _zipf_counts(n_pages: int, n_hosts: int, rng: random.Random) -> list[int]:
    """Page count per host: host 0 gets ~33%, rest Zipf-ish tail."""
    weights = [1.0 / (i + 1) ** 0.8 for i in range(n_hosts)]
    weights[0] = sum(weights)  # hot host ≈ half the remaining mass → ~33%+
    total = sum(weights)
    counts = [max(1, int(n_pages * w / total)) for w in weights]
    # fix rounding drift onto the hot host
    counts[0] += n_pages - sum(counts)
    return counts


def generate_corpus(out_dir: str, n_pages: int = 2000, n_hosts: int = 20, seed: int = 42) -> dict:
    """Generate pages/seeds/url_index under ``out_dir``; returns paths.

    Idempotent: if a corpus with the same parameters already exists
    (marker file), it is reused — generation at bench scale (~100k
    pages) is cached across runs.
    """
    key = f"v{CORPUS_VERSION}_p{n_pages}_h{n_hosts}_s{seed}"
    marker = os.path.join(out_dir, f".corpus_{key}")
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "url_index": os.path.join(out_dir, "url_index.csv"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    rng = random.Random(seed)
    counts = _zipf_counts(n_pages, n_hosts, rng)
    hosts = [f"news{i}.example.com" for i in range(n_hosts)]

    # --- URL universe ---------------------------------------------------
    all_urls: list[str] = []
    host_urls: list[list[str]] = []
    for h, cnt in zip(hosts, counts):
        urls = []
        for j in range(cnt):
            section = "blocked" if j % 10 == 9 else rng.choice(
                ["world", "tech", "sport", "biz"]
            )
            urls.append(f"https://{h}/{section}/art-{j:06d}.html")
        host_urls.append(urls)
        all_urls.extend(urls)
    url_set = set(all_urls)
    hot = set()  # dangling targets (absent from pages)
    n_dangle = max(1, n_pages // 50)
    for i in range(n_dangle):
        hot.add(f"https://{rng.choice(hosts)}/gone/missing-{i:05d}.html")
    dangling = sorted(hot)

    # --- per-page rows ----------------------------------------------------
    urls_col: list[str] = []
    ts_col: list[datetime] = []
    html_col: list[bytes] = []
    text_col: list[str] = []
    lang_col: list[str] = []

    def add_page(url: str, html: str) -> None:
        blob = html.encode("utf-8")
        urls_col.append(url)
        ts_col.append(BASE_TS + timedelta(seconds=len(urls_col)))
        html_col.append(blob)
        text_col.append(extract_page(blob, url)["text"])
        lang_col.append(rng.choice(_LANGS))

    # robots.txt pages (one per host; ~1/4 of hosts have a crawl-delay)
    for i, h in enumerate(hosts):
        delay = "\nCrawl-delay: 2" if i % 4 == 1 else ""
        body = f"User-agent: *\nDisallow: /blocked/{delay}\n"
        add_page(
            f"https://{h}/robots.txt",
            f"<html><head><title>robots</title></head><body><pre>{body}</pre></body></html>",
        )
    # homepages (seed entry points)
    for i, h in enumerate(hosts):
        n_home_links = min(len(host_urls[i]), 25)
        links = "".join(
            f'<a href="{u}">{u.rsplit("/", 1)[-1]}</a>\n'
            for u in host_urls[i][:n_home_links]
        )
        html = (
            f"<html><head><title>{h} home</title></head><body>"
            f"<nav><a href=\"/about\">about</a></nav>"
            f"<p>Front page of {h}.</p>{links}"
            f"<footer>copyright</footer></body></html>"
        )
        add_page(f"https://{h}/", html)

    # article pages with embedded link graph
    for i, h in enumerate(hosts):
        mine = host_urls[i]
        for j, url in enumerate(mine):
            n_links = rng.randint(2, 6)
            targets = []
            for _ in range(n_links):
                r = rng.random()
                if r < 0.78 and len(mine) > 1:
                    targets.append(mine[rng.randrange(len(mine))])
                elif r < 0.96:
                    other = rng.randrange(n_hosts)
                    targets.append(host_urls[other][rng.randrange(len(host_urls[other]))])
                else:
                    targets.append(dangling[rng.randrange(len(dangling))])
            anchors = "".join(f'<a href="{t}">link</a> ' for t in targets)
            paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(2, 5)))
            author = rng.choice(["A. Reporter", "B. Writer", "C. Editor"])
            pub = (BASE_TS + timedelta(hours=j % 240)).strftime("%Y-%m-%dT%H:%M:%S+00:00")
            html = (
                "<html><head>"
                f"<title>Story {j} on {h}</title>"
                f'<meta name="author" content="{author}">'
                f'<meta property="article:published_time" content="{pub}">'
                "<style>p{color:black}</style></head><body>"
                '<nav><a href="/">home</a> | sections</nav>'
                f"{paras}<div>{anchors}</div>"
                "<script>var tracking=1;</script>"
                "<footer>subscribe | contact</footer></body></html>"
            )
            add_page(url, html)

    pages = pa.table(
        {
            "url": pa.array(urls_col, pa.string()),
            "warc_ts": pa.array(ts_col, pa.timestamp("us", tz="UTC")),
            "html": pa.array(html_col, pa.binary()),
            "text": pa.array(text_col, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
        }
    )
    pq.write_table(pages, paths["pages"])

    # --- seeds table (reference Source analog) ---------------------------
    seed_rows = {
        "source_id": [],
        "domain": [],
        "base_url": [],
        "scraper_type": [],
        "active": [],
        "crawl_frequency": [],
        "priority": [],
        "max_urls": [],
        "crawl_delay": [],
    }
    for i, h in enumerate(hosts):
        seed_rows["source_id"].append(hashlib.md5(h.encode()).hexdigest()[:12])
        seed_rows["domain"].append(h)
        seed_rows["base_url"].append(f"https://{h}/")
        seed_rows["scraper_type"].append(["newspaper", "feed", "puppeteer"][i % 3])
        seed_rows["active"].append(i % 7 != 6)  # a few inactive sources
        seed_rows["crawl_frequency"].append([6, 12, 24][i % 3])
        seed_rows["priority"].append(1 + (i % 3))
        seed_rows["max_urls"].append(100)
        seed_rows["crawl_delay"].append(2 if i % 4 == 1 else 1)
    pq.write_table(pa.table(seed_rows), paths["seeds"])

    # --- url_index csv (reference url.csv shape) --------------------------
    with open(paths["url_index"], "w", encoding="utf-8") as f:
        f.write("indexed_date,language,media_name,media_url,publish_date,title,url\n")
        for i, u in enumerate(all_urls[:: max(1, len(all_urls) // 500)]):
            h = u.split("/")[2]
            f.write(
                f"2025-01-{(i % 28) + 1:02d},en,{h},https://{h}/,"
                f"2025-01-01,Story {i},{u}\n"
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
