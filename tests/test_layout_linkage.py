"""Z-order layout + fuzzy record linkage."""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd
from pyspark.sql import Row


def _spread8_py(x: int) -> int:
    for shift, mask in ((4, 0x0F0F), (2, 0x3333), (1, 0x5555)):
        x = (x | (x << shift)) & mask
    return x


def test_zorder_corner_codes(spark):
    """Min corner -> z 0 / file 0; max corner -> z 65535 / file 255;
    engine z equals the pure-Python Morton twin on every row."""
    from newscrawler_spark.operators.layout import zorder_values

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, 0, t0),
        (1, 1023, t0 + dt.timedelta(days=511)),
        (2, 700, t0 + dt.timedelta(days=100)),
        (3, 17, t0 + dt.timedelta(days=300)),
    ]
    df = spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=ts) for i, u, ts in rows],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r for r in zorder_values(df).collect()}
    assert got[0]["z"] == 0 and got[0]["file_id"] == 0
    assert got[1]["z"] == 65535 and got[1]["file_id"] == 255
    # python twin over the same exact-min/max normalisation
    u_lo, u_hi = 0, 1023
    d_lo = got[0]["day"]
    d_hi = got[1]["day"]
    for i, u, ts in rows:
        day = got[i]["day"]
        ub = (u - u_lo) * 256 // (u_hi - u_lo + 1)
        db = (day - d_lo) * 256 // (d_hi - d_lo + 1)
        z = _spread8_py(ub) | (_spread8_py(db) << 1)
        assert got[i]["z"] == z and got[i]["file_id"] == z // 256


def test_zorder_files_are_rectangular_cells(spark, sf_dir):
    """Pruning property on the real events table: every layout file
    covers exactly one 16x16-bucket cell — the per-file bucket span in
    EACH dimension is <= 15, so min/max pruning on either key skips
    15/16 of files for a point predicate."""
    from newscrawler_spark.operators.layout import zorder_values

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    pdf = zorder_values(ev).toPandas()
    u_lo, u_hi = pdf["user_id"].min(), pdf["user_id"].max()
    d_lo, d_hi = pdf["day"].min(), pdf["day"].max()
    pdf["ub"] = (pdf["user_id"] - u_lo) * 256 // (u_hi - u_lo + 1)
    pdf["db"] = (pdf["day"] - d_lo) * 256 // (d_hi - d_lo + 1)
    g = pdf.groupby("file_id").agg(
        ub_span=("ub", lambda s: s.max() - s.min()),
        db_span=("db", lambda s: s.max() - s.min()),
    )
    assert (g["ub_span"] <= 15).all()
    assert (g["db_span"] <= 15).all()
    assert len(g) > 16  # the layout actually fans out


def test_fuzzy_pairs_hand_data(spark):
    """A one-char typo inside the same block matches; an equally-close
    title in another block (different prefix) does not; distance > 8
    does not."""
    from newscrawler_spark.operators.dedup import fuzzy_title_pairs

    docs = [
        (1, "en", "spark shuffles the partitions tonight"),
        (2, "en", "spark shuffles the partitionz tonight"),  # dist 1
        (3, "en", "zpark shuffles the partitions tonight"),  # prefix differs
        (4, "en", "spark " + "x" * 40),                      # same block, far
        (5, "de", "spark shuffles the partitions tonight"),  # other lang
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=l, text=t) for i, l, t in docs],
        "doc_id long, lang string, text string",
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["dist"]
        for r in fuzzy_title_pairs(df).collect()
    }
    assert got == {(1, 2): 1}


def test_fuzzy_pairs_whitespace_class_pinned(spark):
    """Titles differing only in ASCII whitespace runs (tab/newline/VT)
    collapse to distance 0 — the frozen [ \\t\\n\\r\\f\\x0b] contract."""
    from newscrawler_spark.operators.dedup import fuzzy_title_pairs

    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="alpha beta\tgamma"),
            Row(doc_id=2, lang="en", text="alpha beta\n\x0bgamma"),
        ],
        "doc_id long, lang string, text string",
    )
    got = fuzzy_title_pairs(df).collect()
    assert len(got) == 1 and got[0]["dist"] == 0

def test_compaction_plan_packs_adjacent_files(spark, sf_dir):
    """Jobs are contiguous z-ranges covering every file exactly once;
    each job stops at the first file crossing the target; totals
    reconcile with the file stats."""
    from newscrawler_spark.operators.layout import (
        compaction_plan,
        zorder_file_stats,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stats = {
        r["file_id"]: r["n_rows"] for r in zorder_file_stats(ev).collect()
    }
    target = 300
    plan = sorted(
        compaction_plan(ev, target_rows=target).collect(),
        key=lambda r: r["job_id"],
    )
    # contiguous, non-overlapping coverage of the file list in z order
    files_in_order = sorted(stats)
    walked = []
    for job in plan:
        rng = [f for f in files_in_order if job["file_lo"] <= f <= job["file_hi"]]
        assert job["n_files"] == len(rng)
        assert job["total_rows"] == sum(stats[f] for f in rng)
        walked.extend(rng)
    assert walked == files_in_order
    # greedy pack twin: job_id == rows_before // target per file
    before = 0
    expect_jobs = {}
    for f in files_in_order:
        expect_jobs.setdefault(before // target, []).append(f)
        before += stats[f]
    assert len(plan) == len(expect_jobs)
    for job in plan:
        assert expect_jobs[job["job_id"]][0] == job["file_lo"]
        assert expect_jobs[job["job_id"]][-1] == job["file_hi"]


def test_three_way_split_deterministic_and_stable(spark):
    """Split fractions track the 90/95 thresholds, assignment is a pure
    function of doc_id (append-stability: a superset corpus preserves
    every earlier assignment), and all three splits appear."""
    from newscrawler_spark.operators.quality import three_way_split

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text="t") for i in range(400)],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r["split"] for r in three_way_split(docs).collect()}
    frac_train = sum(1 for s in got.values() if s == "train") / len(got)
    assert 0.84 <= frac_train <= 0.96
    assert set(got.values()) == {"train", "valid", "test"}
    # append-stability: half corpus assigns identically
    half = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text="t") for i in range(200)],
        "doc_id long, lang string, text string",
    )
    got_half = {r["doc_id"]: r["split"] for r in three_way_split(half).collect()}
    assert all(got[i] == got_half[i] for i in range(200))
