"""WARC source: ingest ISO 28500 web-archive records (the Common
Crawl / `wget --warc` interchange format) as a DataFrame.

The reference crawls live HTTP and stores rows in Postgres
(``/root/reference/src/scrapers/base_scraper.py``,
``src/database/models.py``); the archived-web twin of that ingest path
is a WARC segment directory — the input shape a 100 TB webtext build
actually starts from.  This module reads uncompressed WARC/1.0 (WET
files and our own synthetic segments are plain text; per-record gzip
members would slot in at the same seam with a binaryFile +
``mapInPandas`` decoder).

Spark-first: the reader is the BUILT-IN text source with a multi-char
record delimiter (``lineSep = "WARC/1.0\\r\\n"``) — Hadoop's line
reader splits files on arbitrary delimiters ACROSS split boundaries,
so a 1 GB segment file still fans out per
``spark.sql.files.maxPartitionBytes`` and a directory of segments
parallelizes per file with zero custom input-format code.  Header
fields are codegen'd ``regexp_extract`` columns; the payload is cut by
the Content-Length header with pure ``substring`` arithmetic.  No UDF,
no shuffle — a WARC scan is a narrow map, exactly like the parquet
page scan it substitutes for.

Cross-engine contract (the DuckDB oracle replays the parse with
``read_text`` + ``string_split`` + the same regexes): the synthetic
writer emits ASCII-only payloads with no CR bytes, so Content-Length
in characters equals bytes and ``substring``/``strpos`` arithmetic is
identical in both engines.  Writer and reader share the frozen
delimiter and header names below.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: frozen record delimiter — the WARC version line, CRLF-terminated.
WARC_DELIM = "WARC/1.0\r\n"

#: header terminator: blank CRLF line between headers and payload.
_HDR_END = "\r\n\r\n"

WARC_VERSION = 3  # bump to invalidate previously generated segments


def write_warc_segments(
    out_dir: str, pages_parquet: str, n_files: int = 4
) -> str:
    """Write the corpus pages table as deterministic uncompressed
    WARC/1.0 segment files (``segment-NNNNN.warc``) plus one
    ``warcinfo`` record per file.  Idempotent via a marker keyed by the
    layout version and file count; byte-deterministic given the
    (seed-stable) pages parquet, so the Spark reader and the DuckDB
    oracle can regenerate independently and see identical bytes.

    Records are assigned round-robin (row ``i`` → file ``i % n_files``)
    — a deterministic rule that keeps every file non-empty.  Payloads
    must be CR-free and delimiter-free (asserted) so the record
    delimiter never occurs inside a payload.
    """
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, f".warc_v{WARC_VERSION}_f{n_files}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(pages_parquet, columns=["url", "warc_ts", "html"])
    urls = tbl.column("url").to_pylist()
    tss = tbl.column("warc_ts").to_pylist()
    htmls = tbl.column("html").to_pylist()
    chunks: list[list[str]] = [[] for _ in range(n_files)]
    for i, (url, ts, html) in enumerate(zip(urls, tss, htmls)):
        payload = html.decode("ascii")
        assert "\r" not in payload and WARC_DELIM[:-2] not in payload
        rec_id = hashlib.md5(url.encode()).hexdigest()
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        chunks[i % n_files].append(
            WARC_DELIM
            + "WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:md5:{rec_id}>\r\n"
            + f"WARC-Date: {date}\r\n"
            + f"WARC-Target-URI: {url}\r\n"
            + f"Content-Length: {len(payload)}\r\n"
            + _HDR_END[2:]  # headers already end with CRLF; add one blank line
            + payload
            + _HDR_END
        )
    for f, recs in enumerate(chunks):
        info = (
            WARC_DELIM
            + "WARC-Type: warcinfo\r\n"
            + f"WARC-Date: 2025-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len('software: newscrawler-spark')}\r\n"
            + _HDR_END[2:]
            + "software: newscrawler-spark"
            + _HDR_END
        )
        path = os.path.join(out_dir, f"segment-{f:05d}.warc")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="ascii", newline="") as fh:
            fh.write(info + "".join(recs))
        os.replace(tmp, path)
    with open(marker, "w"):
        pass
    return out_dir


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse a directory of uncompressed WARC segments into
    (warc_type, url, warc_date, record_id, content_length, payload).

    One narrow stage: text scan with the record delimiter as
    ``lineSep``, header regexes, Content-Length-bounded ``substring``
    payload cut.  ``warc_date`` stays the raw ISO-8601 header string —
    timestamp PARSING is left to the caller (`to_timestamp`) because
    zone-suffix semantics are the classic cross-engine divergence.
    """
    recs = spark.read.option("lineSep", WARC_DELIM).text(path)
    hdr = lambda name: F.regexp_extract(  # noqa: E731
        F.col("value"), rf"{name}: ([^\r\n]+)", 1
    )
    return (
        recs.where(F.col("value") != "")
        .select(
            hdr("WARC-Type").alias("warc_type"),
            hdr("WARC-Target-URI").alias("url"),
            hdr("WARC-Date").alias("warc_date"),
            hdr("WARC-Record-ID").alias("record_id"),
            F.regexp_extract(
                F.col("value"), r"Content-Length: ([0-9]+)", 1
            ).cast("long").alias("content_length"),
            F.col("value"),
        )
        .withColumn(
            "payload",
            F.expr(
                "substring(value, instr(value, '\\r\\n\\r\\n') + 4,"
                " content_length)"
            ),
        )
        .drop("value")
    )


def warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """The crawl-pipeline entry view: response records only, with the
    payload as the page html — schema-compatible with the corpus pages
    table (url, html), so the extraction pipeline can run unchanged
    over an archived crawl."""
    return (
        read_warc(spark, path)
        .where(F.col("warc_type") == "response")
        .select("url", "warc_date", "content_length", "payload")
    )
