"""Supervised hashed-unigram Naive Bayes (operators/classifier.py):
pure-Python third implementation of the fit→score contract, a
separable-data learning check, and the broadcast plan shape."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from newscrawler_spark.operators.classifier import (
    NB_BUCKETS,
    NB_SALT,
    NB_TRAIN_BP,
    nb_classify,
)

_SPLIT_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def _grid(doc_id: int, salt: str) -> int:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()
    return int(h[:15], 16) % 10000


def _bucket(w: str, n_buckets: int) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % n_buckets


def _ascii_lower(s: str) -> str:
    return s.translate(
        str.maketrans(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
        )
    )


def _pinned(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _nb_spec(rows, n_buckets=NB_BUCKETS, train_bp=NB_TRAIN_BP, salt=NB_SALT):
    """rows: (doc_id, text, y).  Returns {doc_id: (score, pred, y)}
    for test docs with >=1 token."""
    pos = [0] * n_buckets
    neg = [0] * n_buckets
    np_docs = nn_docs = 0
    test = []
    for d, t, y in rows:
        toks = [w for w in _SPLIT_RE.split(_ascii_lower(t or "")) if w]
        tr = _grid(d, salt) < train_bp
        if tr:
            np_docs += y
            nn_docs += not y
            for w in toks:
                if y:
                    pos[_bucket(w, n_buckets)] += 1
                else:
                    neg[_bucket(w, n_buckets)] += 1
        elif toks:
            test.append((d, toks, y))
    pt, nt = sum(pos), sum(neg)
    prior = math.log((np_docs + 1) / (nn_docs + 1))
    w = [
        math.log((pos[b] + 1) / (pt + n_buckets))
        - math.log((neg[b] + 1) / (nt + n_buckets))
        for b in range(n_buckets)
    ]
    out = {}
    for d, toks, y in test:
        raw = sum(w[_bucket(t, n_buckets)] for t in toks)
        s = _pinned(raw + prior)
        out[d] = (s, s > 0, y)
    return out


def test_nb_matches_python_spec_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [
        (r["doc_id"], r["text"], r["lang"] == "en")
        for r in docs.select("doc_id", "text", "lang").collect()
    ]
    spec = _nb_spec(rows)
    got = {
        r["doc_id"]: (r["score_nb"], r["pred_pos"], r["label_pos"])
        for r in nb_classify(docs, F.col("lang") == "en").collect()
    }
    assert set(got) == set(spec)
    for d, (s, p, y) in spec.items():
        gs, gp, gy = got[d]
        assert abs(gs - s) < 1e-9 and gp == p and gy == y, (d, got[d], spec[d])


def test_nb_learns_separable_vocab(spark):
    """Disjoint class vocabularies must classify perfectly: the spam
    docs use only spam words, ham only ham words."""
    rows = [
        Row(doc_id=i, text=("buy cheap pills now " * 5) if i % 2 else ("dear colleague meeting agenda " * 5), y=bool(i % 2))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    out = nb_classify(df, F.col("y"), n_buckets=512).collect()
    assert len(out) > 50  # held-out split is non-trivial
    assert all(r["pred_pos"] == r["label_pos"] for r in out)


def test_nb_plan_broadcast_dim_and_partial_agg(spark):
    from tests.test_plans import _plan

    df = spark.createDataFrame(
        [Row(doc_id=i, text="a b c", y=i % 2 == 0) for i in range(10)]
    )
    plan = _plan(nb_classify(df, F.col("y")), "simple")
    # the weight dimension and the 1-row prior must broadcast; the
    # (doc, bucket) count must partial-combine before its shuffle
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_count" in plan, plan
    assert "SortMergeJoin" not in plan, plan
