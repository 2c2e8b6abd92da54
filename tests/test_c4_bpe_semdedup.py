"""C4 line cleaning, Gopher line repetition, BPE pair counts, SemDeDup
(operators/quality.py, operators/tokenizer.py, operators/similarity.py).

Each operator is pinned to an independent pure-Python spec over an
adversarial zoo (whitespace edges, unicode, blanks), and its physical
plan is asserted to be the scale shape the docstring claims.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
from pyspark.sql import Row

from newscrawler_spark.operators.quality import (
    C4_MIN_KEPT_LINES,
    C4_MIN_LINE_WORDS,
    GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    GOPHER_MAX_DUP_LINE_FRAC,
    c4_line_filter,
    gopher_line_stats,
)
from newscrawler_spark.operators.tokenizer import BPE_EOW, bpe_pair_counts

_WS_CLASS = "[ \t\n\r\f\x0b]"
_EDGE_RE = re.compile(f"^{_WS_CLASS}+|{_WS_CLASS}+$")
_SPLIT_RE = re.compile(f"{_WS_CLASS}+")
_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

# Adversarial line zoo: NBSP is NOT ASCII whitespace (stays attached);
# \x0b / \t / \r ARE in the frozen class; unicode text; quote terminal;
# javascript in mixed case; braces and lorem markers.
ZOO = [
    "Good first line with words.\ntoo short\nAnother good line here!\n"
    "Ends with quote éé words.\nFifth decent line present.",
    "dup line here ok.\ndup line here ok.\ndup line here ok.\nunique one.",
    " \t padded line with tabs. \x0b \nshort.\nUses JAVASCRIPT heavily here.\n"
    "a b c\nno terminal punct here",
    "ends with nbsp. \nThis page contains { braces }.\nlorem ipsum dolor.",
    "",
    "\n\n\n",
    "One line only with terminal mark?",
    "LoReM IpSuM mixed case page.\nNormal line to keep around.",
]


def _lines(text: str) -> list[str]:
    out = [_EDGE_RE.sub("", x) for x in text.split("\n")]
    return [x for x in out if x != ""]


def _words(line: str) -> list[str]:
    return [w for w in _SPLIT_RE.split(line) if w != ""]


def _c4_spec(doc_id: int, text: str) -> dict:
    lines = _lines(text)
    kept = [
        l
        for l in lines
        if l[-1] in '.!?"'
        and len(_words(l)) >= C4_MIN_LINE_WORDS
        and "javascript" not in l.translate(_LOWER)
    ]
    low = text.translate(_LOWER)
    has_lorem = "lorem ipsum" in low
    has_brace = "{" in text
    return {
        "doc_id": doc_id,
        "n_lines": len(lines),
        "n_kept": len(kept),
        "kept_chars": sum(len(l) for l in kept),
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "keep": len(kept) >= C4_MIN_KEPT_LINES and not has_lorem and not has_brace,
    }


def test_c4_line_filter_matches_python_spec(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(ZOO)])
    rows = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert len(rows) == len(ZOO)
    for i, t in enumerate(ZOO):
        want = _c4_spec(i, t)
        got = rows[i]
        for k, v in want.items():
            assert got[k] == v, (i, k, got[k], v)
    # the zoo exercises both verdicts
    assert {r["keep"] for r in rows.values()} == {True, False}


def test_gopher_line_stats_matches_python_spec(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(ZOO)])
    rows = {r["doc_id"]: r for r in gopher_line_stats(df).collect()}
    for i, t in enumerate(ZOO):
        lines = _lines(t)
        if not lines:
            assert i not in rows  # blank docs are filtered, like gopher_stats
            continue
        dist = list(dict.fromkeys(lines))
        total_c = sum(len(x) for x in lines)
        dupf = (len(lines) - len(dist)) / len(lines)
        dupc = (total_c - sum(len(x) for x in dist)) / total_c
        got = rows[i]
        assert got["n_lines"] == len(lines) and got["n_distinct"] == len(dist)
        assert got["total_chars"] == total_c
        assert abs(got["dup_line_frac"] - dupf) < 5e-5
        assert got["keep"] == (
            dupf <= GOPHER_MAX_DUP_LINE_FRAC and dupc <= GOPHER_MAX_DUP_LINE_CHAR_FRAC
        )
    # the 3x-duplicated doc must fail, the clean doc must pass
    assert rows[1]["keep"] is False and rows[0]["keep"] is True


def test_c4_and_gopher_lines_plan_no_shuffle(spark):
    """Both per-doc line operators must be pure maps — zero Exchange."""
    from tests.test_plans import _plan

    df = spark.createDataFrame([Row(doc_id=1, text="a b c.\nd e f!")])
    for op in (c4_line_filter, gopher_line_stats):
        plan = _plan(op(df), "simple")
        assert "Exchange" not in plan, plan


def test_bpe_pair_counts_matches_counter_spec(spark):
    texts = [
        "the cat sat on the mat",
        "a cat and a bat \t with tabs",
        "unicode été café",
        "",
        "x",
    ]
    spec: Counter = Counter()
    for t in texts:
        for w in _SPLIT_RE.split(t):
            if not w:
                continue
            syms = list(w) + [BPE_EOW]
            for a, b in zip(syms, syms[1:]):
                spec[(a, b)] += 1
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = bpe_pair_counts(df, topk=1000).collect()
    got_map = {(r["left_sym"], r["right_sym"]): r["pair_count"] for r in got}
    assert got_map == dict(spec)
    # deterministic order: count desc, then pair
    keys = [(-r["pair_count"], r["left_sym"], r["right_sym"]) for r in got]
    assert keys == sorted(keys)


def test_bpe_plan_takeordered_two_exchanges(spark):
    from tests.test_plans import _plan

    df = spark.createDataFrame([Row(doc_id=1, text="a b ab")])
    plan = _plan(bpe_pair_counts(df), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    # word-count shuffle + pair-count shuffle only (no global sort)
    assert plan.count("Exchange") == 2, plan
    assert "Sort " not in plan, plan


def _bpe_spec(texts, n_merges):
    """Pure-Python BPE (Sennrich et al. 2016 alg. 1): fit merges over
    word frequencies, then encode — the independent third
    implementation of the engine + SQL-oracle contract."""
    wc: Counter = Counter()
    doc_words: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        ws = [w for w in _SPLIT_RE.split(t) if w]
        doc_words[i] = ws
        wc.update(ws)
    reps = {w: list(w) + [BPE_EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in reps.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in reps.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reps[w] = out
    enc = {
        d: (len(ws), sum(len(reps[w]) for w in ws))
        for d, ws in doc_words.items()
        if ws
    }
    return merges, enc


def test_bpe_fit_encode_matches_python_spec(spark):
    from newscrawler_spark.operators.tokenizer import bpe_encode, bpe_fit

    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "the the the cat",
        "unicode été café été",
        "",
        "x",
    ]
    spec_merges, spec_enc = _bpe_spec(texts, n_merges=4)
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    merges, _ = bpe_fit(df, n_merges=4)
    assert merges == spec_merges
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(df, n_merges=4).collect()
    }
    assert got == spec_enc


def test_bpe_encode_left_to_right_nonoverlap(spark):
    """'l l l' under merge (l,l) must become 'll l' (left-to-right,
    non-overlapping) in engine, spec, and SQL replace alike."""
    from newscrawler_spark.operators.tokenizer import bpe_fit

    df = spark.createDataFrame([Row(doc_id=1, text="lll lll")])
    merges, fitted = bpe_fit(df, n_merges=1)
    assert merges == [("l", "l")]
    (row,) = fitted.collect()
    assert row["rep"] == " ll l </w> "


def _pinned(x: float) -> float:
    return float(np.floor(x * 10000.0 + 0.5) / 10000.0)


def _semdedup_spec(ids, vecs, eps, n_centroids):
    """Pure-Python SemDeDup spec: sequential-fold centroid cosine
    (mirroring the engine's aggregate expr), numpy pairwise GEMM."""
    cents = {}
    for c in range(n_centroids):
        members = [i for i in ids if i % n_centroids == c]
        if members:
            cents[c] = vecs[ids.index(min(members))]

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    assign = {}
    for idx, vid in enumerate(ids):
        v = vecs[idx]
        nv = np.sqrt(seq_dot(v, v))
        best = None
        for c, cv in sorted(cents.items()):
            import math

            cn = math.sqrt(sum(float(x) * float(x) for x in cv))
            sim = _pinned(seq_dot(v, cv) / (nv * cn))
            if best is None or sim > best[0] or (sim == best[0] and c < best[1]):
                best = (sim, c)
        assign[vid] = best
    out = {}
    for c in sorted(set(cid for _, cid in assign.values())):
        members = sorted(
            [vid for vid in ids if assign[vid][1] == c],
            key=lambda vid: (assign[vid][0], vid),
        )
        m = np.stack([np.asarray(vecs[ids.index(v)], dtype=np.float64) for v in members])
        nrm = np.sqrt((m * m).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        g = np.floor(((m @ m.T) / np.outer(nrm, nrm)) * 10000.0 + 0.5) / 10000.0
        for j, vid in enumerate(members):
            dropped = any(g[j, i] >= eps for i in range(j))
            out[vid] = (c, assign[vid][0], not dropped)
    return out


def test_semantic_dedup_matches_python_spec(spark, sf_dir):
    from newscrawler_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [list(map(float, r["embedding"])) for r in rows]
    spec = _semdedup_spec(ids, vecs, eps=0.30, n_centroids=8)

    got = semantic_dedup(emb, eps=0.30, n_centroids=8).collect()
    assert len(got) == len(ids)
    for r in got:
        c, csim, keep = spec[r["vec_id"]]
        assert (r["cid"], r["keep"]) == (c, keep), (r, spec[r["vec_id"]])
        assert abs(r["csim"] - csim) < 5e-5
    kept = {r["keep"] for r in got}
    assert kept == {True, False}, "eps must be non-vacuous at test scale"


def test_semantic_dedup_plan_single_cid_shuffle(spark, sf_dir):
    """One hash shuffle on cid feeding FlatMapGroupsInPandas; the
    centroid collect is bounded (C rows) and not part of this plan."""
    from tests.test_plans import _plan
    from newscrawler_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(semantic_dedup(emb, n_centroids=4), "simple")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_collocations_pmi_python_spec(spark):
    import math
    import re

    from newscrawler_spark.operators.tokenizer import collocations_pmi

    texts = [
        "new york new york new york new york new york",
        "the cat the dog the cat the dog the fish",
        "a b a b a b a b a b a b",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r["w1"], r["w2"], r["c_xy"], r["pmi"])
           for r in collocations_pmi(docs, min_count=3, top_k=5).collect()]

    toks = [[t for t in re.split(r"[ \t\n\r\f\x0b]+", s) if t] for s in texts]
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(ts, ts[1:]):
            big[(x, y)] = big.get((x, y), 0) + 1
    nu = float(sum(uni.values()))
    nb = float(sum(big.values()))
    cand = []
    for (x, y), c in big.items():
        if c >= 3:
            pmi = math.floor(
                math.log((c * nu * nu) / (float(uni[x]) * uni[y] * nb)) * 10000 + 0.5
            ) / 10000
            cand.append((x, y, c, pmi))
    want = sorted(cand, key=lambda r: (-r[3], r[0], r[1]))[:5]
    assert got == want
    # 'new york' is a perfect collocation and must rank in the top-5;
    # the promiscuous 'the' pairs must not
    top_pairs = [(w1, w2) for w1, w2, _, _ in got]
    assert ("new", "york") in top_pairs
    assert ("the", "cat") not in top_pairs
