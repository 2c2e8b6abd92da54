"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length/alpha/
stopword ratios — the scalar analog of the reference's weighted quality
score, ``src/scrapers/base_scraper.py:69-117``), token counting
(whitespace + a BPE-ish regex), and document fingerprinting.

Everything here is pure Spark column expressions — JVM-side, inside
whole-stage codegen, zero Python in the hot path — with semantics
chosen to be expressible identically in ANSI SQL so every operator is
DuckDB-oracle-checkable (see ``__spark_entry__.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword banks for the language-ID heuristic. Small on purpose: at
# 100 TB the cost is a handful of regex scans per row, all codegen'd.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")
ES_STOPWORDS = ("el", "la", "de", "que", "y", "los", "un")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "ein", "zu")

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
# explicit ASCII whitespace class (the collapse_ws tri-engine pin):
# Java \s and the DuckDB oracle's RE2 \s disagree on \x0b
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0b]"


def _stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(text)
    # explicit ASCII class: Java \s has \x0b, the DuckDB oracle's RE2
    # \s does not (the collapse_ws tri-engine pin)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"[ \t\n\r\f\x0b]+"))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword-proxy token count (letter/digit/punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword-hit counts, 'und' if
    no bank scores (deterministic tiebreak en > es > de)."""
    en = _stopword_hits(text, EN_STOPWORDS)
    es = _stopword_hits(text, ES_STOPWORDS)
    de = _stopword_hits(text, DE_STOPWORDS)
    return (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("und")
    )


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: 40% length band, 30% alpha ratio,
    30% stopword density band. Pinned 4dp rounding (functions/rounding:
    plain round(x, 4) diverged from DuckDB at half boundaries —
    6/5000 docs at sf0.1)."""
    from .rounding import pinned_round

    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    toks = ws_token_count(text)
    stop = _stopword_hits(text, EN_STOPWORDS)
    len_band = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    stop_density = F.when(toks > 0, F.least(stop * F.lit(8.0) / toks, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    return pinned_round(0.4 * len_band + 0.3 * alpha_ratio + 0.3 * stop_density, 4)


# Topic keyword banks (reference X8: keyword classifier,
# src/topics/classifier.py:18-216 — keyword → topic with a hit threshold)
TOPIC_BANKS = {
    "query_engine": ("query", "scan", "filter", "sort", "agg"),
    "storage": ("table", "row", "column", "part", "hash"),
    "streaming": ("stream", "window", "batch"),
}
TOPIC_MIN_HITS = 3


def topics(text: Column) -> Column:
    """Array of matched topics: banks with ≥ TOPIC_MIN_HITS keyword hits,
    in bank-declaration order. Pure column expressions."""
    pieces = []
    for name, words in TOPIC_BANKS.items():
        hits = _stopword_hits(text, words)
        pieces.append(
            F.when(hits >= TOPIC_MIN_HITS, F.array(F.lit(name))).otherwise(
                F.array().cast("array<string>")
            )
        )
    return F.concat(*pieces)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the lowercased,
    whitespace-collapsed text (the normalize-then-hash contract)."""
    return F.md5(
        F.regexp_replace(F.lower(F.trim(text)), r"[ \t\n\r\f\x0b]+", " ")
    )


def _ws_tokens(text_col):
    """Nonempty tokens of the frozen explicit-ASCII whitespace split."""
    return F.filter(
        F.split(F.coalesce(text_col, F.lit("")), r"[ \t\n\r\f\x0b]+"),
        lambda x: x != "",
    )


# Polarity lexicons for the deterministic sentiment stand-in
# (reference `src/api/routers/llm.py:245-256` analyze-sentiment, which
# calls an LLM; a lexicon scorer stands in, same philosophy as the
# gazetteer entities in functions/entities.py).  Small on purpose —
# membership tests are codegen'd array_contains over literal arrays.
POS_WORDS = ("fast", "small", "good", "great", "clean")
NEG_WORDS = ("slow", "big", "dup", "bad", "stale")


def sentiment_cols(text: Column) -> dict[str, Column]:
    """Deterministic lexicon polarity: tokens on the frozen ASCII
    whitespace class, ASCII-folded via translate (never lower() — the
    needle-check rule), counted against the two lexicons.

    ``polarity_bp`` is the cross-engine pinned form
    ``floor((pos-neg)/(pos+neg+1)·10⁴ + 0.5)`` — one exact-integer
    division in doubles (IEEE-exact both engines), round-half-up for
    either sign.  Zero shuffle, zero Python: pure column expressions.
    """
    folded = F.translate(
        F.coalesce(text, F.lit("")),
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "abcdefghijklmnopqrstuvwxyz",
    )
    toks = _ws_tokens(folded)
    in_set = lambda words: F.size(  # noqa: E731
        F.filter(toks, lambda x: F.array_contains(F.array(*[F.lit(w) for w in words]), x))
    ).cast("long")
    pos, neg = in_set(POS_WORDS), in_set(NEG_WORDS)
    n_toks = F.size(toks).cast("long")
    polarity_bp = F.floor(
        (pos - neg).cast("double") / (pos + neg + F.lit(1)).cast("double") * 10000
        + F.lit(0.5)
    ).cast("long")
    label = (
        F.when(pos > neg, "positive").when(neg > pos, "negative").otherwise("neutral")
    )
    return {
        "n_tokens": n_toks,
        "pos_hits": pos,
        "neg_hits": neg,
        "polarity_bp": polarity_bp,
        "sentiment": label,
    }
