"""Training-corpus quality filters: Gopher-style repetition rules and
PII scrubbing.

The reference's cleaning stops at whitespace collapse + a weighted
quality score (``/root/reference/src/scrapers/base_scraper.py:69-117``,
covered by A7/F8); a corpus destined for LLM training additionally
needs the Gopher/C4-family *repetition* heuristics (duplicate-word
fraction, most-frequent-word fraction, word-count and word-length
bounds — Rae et al. 2021, "Scaling Language Models: ... Gopher",
table A1) and PII redaction.  Both are implemented here Spark-first:

* ``gopher_stats`` — explode words → two-level aggregate.  One row per
  document goes in, one comes out; the only shuffle is the
  (doc_id, word) partial-count exchange, which map-side combines to the
  per-document *distinct* word list before leaving the mapper (each
  document is a single input row, so every occurrence of a word is in
  the same map task).  At 100 TB this is the standard token-stream
  shuffle, hash-partitioned on (doc_id, word) — near-uniform, no hot
  keys (doc_id is in the key), AQE-splittable.
* ``pii_scrub`` — pure ``regexp_replace`` column expressions (JVM
  codegen, zero Python).  Patterns are RE2-safe (no backrefs or
  lookaround) so the DuckDB oracle evaluates the identical regexes.

Whitespace is the frozen explicit ASCII class ``[ \\t\\n\\r\\f\\x0b]``
(see functions/extract.py) — never ``\\s``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Explicit ASCII whitespace (the tri-engine collapse_ws pin).
_WS = r"[ \t\n\r\f\x0b]+"

# Gopher-style keep thresholds, tuned to be non-vacuous on the
# synthetic documents table (126/500 keep at sf0.01): real Gopher uses
# 50..100k words / mwl 3..10 / dup-line fractions; the synthetic docs
# are single-line, so the repetition rules are word-based.
GOPHER_MIN_WORDS = 30
GOPHER_MWL_MIN = 3.0
GOPHER_MWL_MAX = 10.0
GOPHER_MAX_DUP_WORD_FRAC = 0.55
GOPHER_MAX_TOP_WORD_FRAC = 0.12

# PII patterns — identical semantics under Java regex (Spark) and RE2
# (DuckDB): ASCII classes, bounded quantifiers, \b word boundaries;
# no lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def gopher_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher-style repetition/quality statistics.

    Input: one row per document with (doc_id, `text_col`).  Output one
    row per non-blank document:
      n_words, mean_word_len, dup_word_frac (1 - distinct/total),
      top_word_frac (most frequent word / total), keep (all rules hold).

    Ratio columns are rounded to 4 decimals for the cross-engine value
    hash; the `keep` decision compares the *unrounded* doubles, whose
    expression trees are bit-identical in Spark and the DuckDB oracle
    (integer-ratio IEEE754 divisions).
    """
    t = F.trim(F.lower(F.col(text_col)))
    words = docs.where(t != "").select(
        "doc_id", F.explode(F.split(t, _WS)).alias("word")
    )
    wc = words.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.length("word") * F.col("cnt")).alias("len_sum"),
    )
    n_words = F.col("n_words").cast("double")
    mwl = F.col("len_sum") / n_words
    dupf = F.lit(1.0) - F.col("n_distinct") / n_words
    topf = F.col("top_cnt") / n_words
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (mwl >= GOPHER_MWL_MIN)
        & (mwl <= GOPHER_MWL_MAX)
        & (dupf <= GOPHER_MAX_DUP_WORD_FRAC)
        & (topf <= GOPHER_MAX_TOP_WORD_FRAC)
    )
    from newscrawler_spark.functions.rounding import pinned_round

    return agg.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        pinned_round(mwl, 4).alias("mean_word_len"),
        pinned_round(dupf, 4).alias("dup_word_frac"),
        pinned_round(topf, 4).alias("top_word_frac"),
        keep.alias("keep"),
    )


def stratified_sample_hash(doc_id: Column, salt: str) -> Column:
    """Deterministic per-row uniform in [0, 10000): md5 of the salted
    doc_id, first 15 hex chars as a 60-bit int, mod 10000.  Unlike
    ``df.sample``/``sampleBy`` this is reproducible under any
    partitioning, any engine (the DuckDB oracle computes the identical
    value), and any subset of the data — the property a training-mix
    sampler actually needs (re-running on an updated corpus keeps every
    previously-sampled doc in/out deterministically)."""
    h = F.md5(F.concat(doc_id.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 10000


def stratified_sample(
    docs: DataFrame,
    rates_bp: dict[str, int],
    stratum_col: str = "lang",
    salt: str = "sample:v1",
) -> DataFrame:
    """Keep each row iff hash(doc_id) mod 10000 < its stratum's rate
    (basis points).  Pure codegen filter — zero shuffle at any scale;
    strata missing from `rates_bp` drop (rate 0)."""
    u = stratified_sample_hash(F.col("doc_id"), salt)
    rate = F.lit(0)
    for stratum, bp in rates_bp.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    return docs.where(u < rate)


def three_way_split(
    docs: DataFrame,
    train_bp: int = 9000,
    valid_bp: int = 9500,
    salt: str = "split:v1",
) -> DataFrame:
    """Deterministic train/valid/test assignment: the same salted-md5
    uniform as ``stratified_sample`` thresholded at ``train_bp`` /
    ``valid_bp`` basis points.  Content-addressed splits are the only
    kind that survive a growing corpus — re-running after ingesting new
    docs never migrates an old doc across splits (``df.randomSplit``
    reshuffles everything), so eval sets stay uncontaminated.  Pure
    codegen projection: zero shuffle at any scale."""
    u = stratified_sample_hash(F.col("doc_id"), salt)
    split = (
        F.when(u < train_bp, F.lit("train"))
        .when(u < valid_bp, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


def decontaminate_ngram(
    train: DataFrame, eval_docs: DataFrame, n: int = 8
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word
    `n`-gram with the eval/benchmark set.  Returns one row per
    contaminated doc: (doc_id, n_hits = distinct shared shingles,
    first_hit = min shared shingle).

    Scale shape: the eval side is a benchmark suite (thousands of docs,
    ~MBs of distinct shingles) — broadcast it; the 100 TB training side
    streams through a map-side hash join, no shuffle of the corpus.
    The per-doc rollup shuffles only the (rare) contaminated hits.
    """
    from newscrawler_spark.operators.dedup import with_shingles

    train_sh = with_shingles(train, n=n)
    eval_sh = with_shingles(eval_docs, n=n).select("shingle").distinct()
    hits = train_sh.join(F.broadcast(eval_sh), "shingle")
    return hits.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"),
        F.min("shingle").alias("first_hit"),
    )


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in `text` — count before
    scrubbing so overlapping replacements can't hide a match."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), F.lit(0))),
    )


def pii_scrub(text: Column) -> Column:
    """Redact emails → <EMAIL>, then phones → <PHONE>, then IPv4 →
    <IP>.  Order matters: the email pattern consumes dotted hosts that
    the IPv4 pattern would otherwise partially match."""
    scrubbed = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(scrubbed, PII_IPV4_RE, "<IP>")


# Gopher table-A1 n-gram repetition thresholds, tuned non-vacuous for
# the synthetic docs (published Gopher: top-2-gram 0.20, dup-5-gram
# 0.15..0.30 over much longer documents).
GOPHER_NG_MAX_TOP2 = 0.12
GOPHER_NG_MAX_DUP2 = 0.22
GOPHER_NG_MAX_DUP3 = 0.05


def gopher_ngram_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-family *n-gram* repetition stats (the word-level
    complement lives in :func:`gopher_stats`): per document with >= 2
    words,
      top2_frac — chars of the most frequent 2-gram × its count over
                  the whitespace-normalized doc length,
      dup2_frac / dup3_frac — chars covered by n-grams occurring >= 2
                  times (count × gram length, clamped to 1.0),
      keep — all three under their thresholds (compared unrounded).

    Plan shape: same token-stream plan as gopher_stats, from ONE corpus
    scan — n ∈ {2, 3} is exploded as a column (a union of per-n
    branches re-scans the corpus once per n), each doc is a single
    input row so the (doc_id, n, gram) partial count finalizes
    map-side, and the per-doc rollups shuffle only doc-sized rows.
    """
    from newscrawler_spark.functions.rounding import pinned_round

    t = F.trim(F.lower(F.col(text_col)))
    base = docs.where(t != "").select(
        "doc_id", F.split(t, _WS).alias("w")
    ).withColumn("total_chars", F.length(F.array_join("w", " ")))
    fanned = base.select(
        "doc_id",
        "total_chars",
        "w",
        F.explode(F.array(F.lit(2), F.lit(3))).alias("n"),
    ).where(F.size("w") >= F.col("n"))
    grams = fanned.select(
        "doc_id",
        "total_chars",
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - F.col("n")),
                lambda i: F.array_join(F.slice("w", i + 1, F.col("n")), " "),
            )
        ).alias("g"),
    )
    counts = grams.groupBy("doc_id", "n", "g").agg(
        F.count("*").alias("cnt"), F.max("total_chars").alias("total_chars")
    )
    chars = F.col("cnt") * F.length("g")
    per = counts.groupBy("doc_id", "n").agg(
        F.max(chars).alias("top_chars"),
        F.coalesce(F.sum(F.when(F.col("cnt") >= 2, chars)), F.lit(0)).alias("dup_chars"),
        F.max("total_chars").alias("total_chars"),
    )
    tot = F.col("total_chars").cast("double")
    top2 = F.max(F.when(F.col("n") == 2, F.col("top_chars") / tot))
    dup2 = F.max(F.when(F.col("n") == 2, F.least(F.col("dup_chars") / tot, F.lit(1.0))))
    dup3 = F.coalesce(
        F.max(F.when(F.col("n") == 3, F.least(F.col("dup_chars") / tot, F.lit(1.0)))),
        F.lit(0.0),
    )
    agg = per.groupBy("doc_id").agg(
        top2.alias("_top2"), dup2.alias("_dup2"), dup3.alias("_dup3")
    )
    keep = (
        (F.col("_top2") <= GOPHER_NG_MAX_TOP2)
        & (F.col("_dup2") <= GOPHER_NG_MAX_DUP2)
        & (F.col("_dup3") <= GOPHER_NG_MAX_DUP3)
    )
    return agg.select(
        "doc_id",
        pinned_round(F.col("_top2"), 4).alias("top2_frac"),
        pinned_round(F.col("_dup2"), 4).alias("dup2_frac"),
        pinned_round(F.col("_dup3"), 4).alias("dup3_frac"),
        keep.alias("keep"),
    )


# RefinedWeb-style stage-1 URL filtering: a blocklist of hosts plus a
# banned-path pattern, applied before any fetch/extraction spend.
URL_BANNED_PATH_RE = "/(premium|subscriber|member)/"


def url_filter(
    urls: DataFrame,
    blocked_hosts: DataFrame,
    banned_path_re: str = URL_BANNED_PATH_RE,
) -> DataFrame:
    """Stage-1 URL triage (RefinedWeb §3.1 / UT1-blocklist style):
    verdict per row — 'blocked_host' (host in the blocklist, checked
    first), 'blocked_path' (url matches `banned_path_re`), else 'kept'.

    `blocked_hosts` must have a single `host` column; it is a curated
    blocklist (UT1 is ~4M lines ≈ tens of MB) so it broadcasts — the
    100 TB frontier streams through a map-side hash probe, zero
    shuffle.  Host extraction is a shared-regex contract (`^https?://
    ([^/]+)/`, identical under Java regex and RE2) rather than
    parse_url, which has no DuckDB twin.
    """
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)
    marked = urls.withColumn("host", host).join(
        F.broadcast(blocked_hosts.select("host").withColumn("_blk", F.lit(True))),
        "host",
        "left",
    )
    verdict = (
        F.when(F.col("_blk").isNotNull(), "blocked_host")
        .when(F.col("url").rlike(banned_path_re), "blocked_path")
        .otherwise("kept")
    )
    return marked.select("doc_id", "url", "host", verdict.alias("verdict"))


# --- C4 line-level cleaning (Raffel et al. 2020 §2.2) --------------------

# C4's published line/page heuristics, re-expressed over an explicit
# terminal-punctuation set and the frozen ASCII whitespace class.  The
# thresholds are C4's own except MIN_KEPT_LINES (C4 uses 5 sentences;
# the synthetic gate docs carry ~5 planted lines, so 4 keeps the rule
# non-vacuous in BOTH directions at sf0.01).
C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 3
C4_MIN_KEPT_LINES = 4

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
# Edge-trim twin of the frozen collapse class — spelled identically in
# the DuckDB oracle (see CLAUDE.md: never \s / trim()).
WS_EDGE_RE = r"^[ \t\n\r\f\x0b]+|[ \t\n\r\f\x0b]+$"


def _ascii_lower(col: Column) -> Column:
    """ASCII-only lowercase via translate — byte-identical in Spark and
    DuckDB (locale-free), unlike lower(), whose Unicode case folding
    differs across engines on chars like U+212A KELVIN SIGN."""
    return F.translate(col, _ASCII_UPPER, _ASCII_LOWER)


def _doc_lines(text: Column) -> Column:
    """Non-blank, edge-trimmed lines of a document, order-preserving."""
    return F.filter(
        F.transform(
            F.split(F.coalesce(text, F.lit("")), "\n"),
            lambda x: F.regexp_replace(x, WS_EDGE_RE, ""),
        ),
        lambda x: x != F.lit(""),
    )


def _line_word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(line, _WS), lambda w: w != F.lit("")))


def c4_line_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2), one row per document.

    Line rules (a line survives iff ALL hold):
      * ends in terminal punctuation (``. ! ? "``),
      * has >= ``C4_MIN_LINE_WORDS`` words,
      * does not contain 'javascript' (ASCII case-insensitive).
    Page rules: keep iff >= ``C4_MIN_KEPT_LINES`` lines survive AND the
    raw text contains neither 'lorem ipsum' (ASCII-ci) nor '{'.

    Everything is array higher-order expressions over the one input row
    — whole-stage codegen, ZERO shuffle: at 100 TB this is a pure map
    over the corpus scan, trivially partition-parallel.  ``cleaned_md5``
    hashes the kept lines joined by newline, gating the reassembly
    order cross-engine.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = _doc_lines(F.col(text_col))

    def kept_line(l: Column) -> Column:
        terminal = l.substr(F.length(l), F.lit(1)).isin(*C4_TERMINAL_PUNCT)
        return (
            terminal
            & (_line_word_count(l) >= C4_MIN_LINE_WORDS)
            & ~_ascii_lower(l).contains("javascript")
        )

    kept = F.filter(lines, kept_line)
    has_lorem = _ascii_lower(raw).contains("lorem ipsum")
    has_brace = raw.contains("{")
    n_kept = F.size(kept)
    keep = (n_kept >= C4_MIN_KEPT_LINES) & ~has_lorem & ~has_brace
    kept_chars = F.aggregate(
        kept, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        kept_chars.alias("kept_chars"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
        F.md5(F.array_join(kept, "\n")).alias("cleaned_md5"),
    )


# Gopher table-A1 within-document line-repetition thresholds.
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20


def gopher_line_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher's WITHIN-document duplicate-line rules (Rae et al. 2021
    table A1) — the in-doc complement of the cross-corpus
    ``paragraph_dedup``:

      dup_line_frac       = (n_lines - n_distinct) / n_lines
      dup_line_char_frac  = chars in repeat occurrences / total chars
      keep                = both fractions under the Gopher thresholds.

    Pure array expressions per row (array_distinct + aggregate), zero
    shuffle — a map-only pass at any scale.  Ratios are pinned-rounded
    for the value hash; `keep` compares the unrounded integer-ratio
    divisions, bit-identical across engines.
    """
    lines = _doc_lines(F.col(text_col))
    dist = F.array_distinct(lines)
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    n = F.size(lines).cast("long")
    nd = F.size(dist).cast("long")
    total_c = chars(lines)
    dist_c = chars(dist)
    dupf = (n - nd) / n.cast("double")
    dupc = (total_c - dist_c) / total_c.cast("double")
    keep = (dupf <= GOPHER_MAX_DUP_LINE_FRAC) & (dupc <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
    from newscrawler_spark.functions.rounding import pinned_round

    return docs.where(F.size(lines) > 0).select(
        "doc_id",
        n.alias("n_lines"),
        nd.alias("n_distinct"),
        total_c.alias("total_chars"),
        pinned_round(dupf, 4).alias("dup_line_frac"),
        pinned_round(dupc, 4).alias("dup_char_frac"),
        keep.alias("keep"),
    )


def length_filter_percentile(
    docs: DataFrame, lo_pct: int = 5, hi_pct: int = 95
) -> DataFrame:
    """Per-language length-outlier trim: keep docs whose whitespace
    token count lies within the language's [lo_pct, hi_pct]
    percentile-DISC bounds (truncated boilerplate stubs below, run-on
    concatenation artifacts above — the standard corpus length gate).

    The bounds are computed over the DISTINCT (lang, token-count)
    VALUE table with cumulative counts — an integer CDF — never a
    row-ordering window over the corpus (a per-lang full sort at
    100 TB; the value table is bounded by the token-count range).
    Percentile-disc on the CDF: bound = min value v with
    100·cum_count(≤v) ≥ pct·n — pure integer arithmetic, identical in
    any engine.  The 5-row bounds dim broadcasts back onto the corpus:
    scan + one value-table shuffle, no corpus shuffle.  Output
    ``(doc_id, lang, ws_tokens, lo, hi)`` for kept docs."""
    from pyspark.sql import Window

    from newscrawler_spark.functions.text import ws_token_count

    t = docs.select(
        "doc_id", "lang", ws_token_count(F.col("text")).alias("ws_tokens")
    )
    vt = t.groupBy("lang", "ws_tokens").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("lang")
        .orderBy("ws_tokens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("lang")
    cdf = vt.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    bounds = cdf.groupBy("lang").agg(
        F.min(
            F.when(100 * F.col("cum") >= lo_pct * F.col("n"), F.col("ws_tokens"))
        )
        .cast("long")
        .alias("lo"),
        F.min(
            F.when(100 * F.col("cum") >= hi_pct * F.col("n"), F.col("ws_tokens"))
        )
        .cast("long")
        .alias("hi"),
    )
    j = t.join(F.broadcast(bounds), "lang")
    return j.where(
        (F.col("ws_tokens") >= F.col("lo")) & (F.col("ws_tokens") <= F.col("hi"))
    ).select("doc_id", "lang", F.col("ws_tokens").cast("long").alias("ws_tokens"), "lo", "hi")
