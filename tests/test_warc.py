"""S13 WARC source: the writer/reader round-trip must be
byte-identical, the reader must be a single narrow stage, and record
splitting must be robust to header order and warcinfo records."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from newscrawler_spark.sources.warc import (
    WARC_DELIM,
    read_warc,
    warc_responses,
    write_warc_segments,
)

_UTC = __import__("datetime").timezone.utc
_DT = __import__("datetime").datetime


def _pages_parquet(tmp_path, rows):
    path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "html": [r[2] for r in rows],
            }
        ),
        path,
    )
    return path


def test_warc_round_trip_byte_identical(spark, tmp_path):
    rows = [
        (f"https://h{i % 3}.example.com/a{i}", _DT(2025, 1, 1, 0, 0, i, tzinfo=_UTC),
         f"<html><body>page {i} " + "x" * i + "</body></html>")
        for i in range(17)
    ]
    pages = _pages_parquet(tmp_path, [(u, t, h.encode()) for u, t, h in rows])
    wdir = write_warc_segments(str(tmp_path / "warc"), pages, n_files=3)
    got = {r["url"]: r for r in warc_responses(spark, wdir).collect()}
    assert len(got) == len(rows)
    for u, ts, h in rows:
        r = got[u]
        assert r["payload"] == h
        assert r["content_length"] == len(h)
        assert r["warc_date"] == ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    # idempotent: second call is a no-op (marker), bytes unchanged
    files = sorted(os.listdir(wdir))
    write_warc_segments(str(tmp_path / "warc"), pages, n_files=3)
    assert sorted(os.listdir(wdir)) == files


def test_warc_reader_filters_warcinfo_and_splits_records(spark, tmp_path):
    # hand-built segment: warcinfo first, headers in a different order,
    # payload containing blank LF-only lines (never CRLF)
    payload = "line one\n\nline two"
    rec = (
        WARC_DELIM
        + "WARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        + WARC_DELIM
        + "WARC-Date: 2025-02-03T04:05:06Z\r\n"
        + "WARC-Type: response\r\n"
        + f"Content-Length: {len(payload)}\r\n"
        + "WARC-Target-URI: https://x.example.com/p\r\n"
        + "\r\n"
        + payload
        + "\r\n\r\n"
    )
    d = tmp_path / "seg"
    d.mkdir()
    (d / "segment-00000.warc").write_text(rec, newline="")
    all_rows = read_warc(spark, str(d)).collect()
    assert {r["warc_type"] for r in all_rows} == {"warcinfo", "response"}
    (resp,) = warc_responses(spark, str(d)).collect()
    assert resp["url"] == "https://x.example.com/p"
    assert resp["payload"] == payload
    assert resp["warc_date"] == "2025-02-03T04:05:06Z"


def test_warc_reader_plan_single_narrow_stage(spark, tmp_path):
    pages = _pages_parquet(
        tmp_path, [("https://a/x", _DT(2025, 1, 1, tzinfo=_UTC), b"<html/>")]
    )
    wdir = write_warc_segments(str(tmp_path / "warc"), pages, n_files=1)
    from tests.test_plans import _plan

    plan = _plan(warc_responses(spark, wdir), "simple")
    assert "Exchange" not in plan, plan
    assert "FileScan text" in plan, plan


def test_warc_writer_rejects_cr_payload(tmp_path):
    pages = _pages_parquet(
        tmp_path, [("https://a/x", _DT(2025, 1, 1, tzinfo=_UTC), b"bad\r\nbytes")]
    )
    with pytest.raises(AssertionError):
        write_warc_segments(str(tmp_path / "warc"), pages)
