"""Winnowing fingerprints (operators/dedup.winnow_fingerprints)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Row

from newscrawler_spark.operators.dedup import winnow_fingerprints, winnow_pairs

K, W = 4, 5


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _pure_python_winnow(text: str, k: int = K, w: int = W):
    """Independent third implementation of the pinned spec."""
    toks = [t for t in re.split(r"[ \t\n\r\f\x0b]+", text or "") if t]
    g = [_h60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    if not g:
        return set()
    out = set()
    for j in range(max(len(g) - w, 0) + 1):
        win = g[j : j + w]
        mn = min(win)
        # rightmost tie: max 1-based gram position with the min hash
        pos = max(j + 1 + i for i, h in enumerate(win) if h == mn)
        out.add((pos, mn))
    return out


def test_winnow_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    want = {
        r["doc_id"]: _pure_python_winnow(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    want = {d: s for d, s in want.items() if s}
    assert got == want and len(want) > 0


def test_winnow_shared_substring_guarantee(spark):
    """The paper's guarantee: any shared token run of >= k+w-1 tokens
    produces at least one shared fingerprint."""
    shared = " ".join(f"s{i}" for i in range(K + W - 1))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"aa bb cc {shared} dd ee"),
            Row(doc_id=1, text=f"zz yy {shared} xx ww vv uu"),
        ],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {0: set(), 1: set()}
    for r in winnow_fingerprints(docs).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1]


def test_winnow_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c d e"),  # 2 grams < w: one window
            Row(doc_id=1, text="a b"),        # < k tokens: no grams
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="x y z w"),    # exactly k tokens: 1 gram
        ],
        "doc_id long, text string",
    )
    got: dict[int, list] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert set(got) == {0, 3}
    assert got[0] == [(p, f) for p, f in sorted(_pure_python_winnow("a b c d e"))]
    assert got[3] == [(1, _h60("x y z w"))]


def test_winnow_pairs_detects_planted_contamination(spark):
    run = " ".join(f"c{i}" for i in range(12))  # long shared run
    pad = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"{pad('a')} {run}"),
            Row(doc_id=1, text=f"{run} {pad('b')}"),
            Row(doc_id=2, text=pad("z")),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in winnow_pairs(docs).collect()
    }
    assert pairs == {(0, 1)}
