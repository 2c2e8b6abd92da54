"""Tokenizer-fitting statistics: the BPE merge-candidate count.

Training a BPE tokenizer (Sennrich et al. 2016) over a 100 TB corpus
starts with exactly one distributed job: count adjacent symbol pairs
across the word-frequency table and take the most frequent pair (the
first merge).  Every subsequent merge re-runs the same count over a
vocabulary that is already reduced to distinct words, so the expensive
corpus pass happens ONCE — the shape implemented here:

* pass 1: explode words, groupBy(word) count — the only corpus-scale
  shuffle, hash-partitioned on the word with map-side combine (the
  classic word-count reduction, AQE-splittable if a stopword dominates);
* pass 2: per DISTINCT word, explode its adjacent character pairs
  (plus the terminal ``</w>`` end-of-word symbol) weighted by the word
  count, and aggregate — this shuffle is vocabulary-sized (millions of
  rows), not corpus-sized, regardless of input scale;
* top-k by (count, pair) with a full deterministic tiebreak — planned
  as TakeOrderedAndProject, no global sort.

``bpe_fit``/``bpe_encode`` complete the trainer: the iterative merge
loop runs ENTIRELY over the cached distinct-vocabulary table (each
round is one vocabulary-sized aggregate + a 1-row driver argmax — the
merge table is the bounded output, never row-scaled), and encoding
joins the corpus back to the fitted per-word symbol stream on the word
key — the corpus-scale work is one word shuffle each side, identical
at any input size.

Reference parity: the reference has no tokenizer job; this is part of
the LLM-training-pipeline surface (brief: "operations a large-scale
training-data pipeline would need").  Whitespace is the frozen explicit
ASCII class (see functions/extract.py) — never ``\\s``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"[ \t\n\r\f\x0b]+"

#: end-of-word marker appended to every word's symbol stream, so that
#: merges can distinguish word-final from word-internal contexts.
BPE_EOW = "</w>"
BPE_TOPK = 50

# Adjacent symbol pairs of one word as a struct array: for i in
# 1..len(w), pair (char_i, char_{i+1}), with the last right side the
# end-of-word marker.  substring() is character-based in both Spark and
# DuckDB, so the oracle mirrors this expression verbatim.
_PAIRS_EXPR = (
    "transform(sequence(1, length(w)), i -> struct("
    "substring(w, i, 1) AS a, "
    f"CASE WHEN i = length(w) THEN '{BPE_EOW}' ELSE substring(w, i + 1, 1) END AS b))"
)


#: merges learned by bpe_fit / applied by bpe_encode (unrolled in the
#: SQL oracle, so keep it small enough for a readable statement).
BPE_MERGES = 4


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): the corpus word-frequency table — the single
    corpus-scale reduction every BPE stage shares."""
    words = docs.select(
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _WS)
        ).alias("w")
    ).where(F.col("w") != "")
    return words.groupBy("w").agg(F.count("*").cast("long").alias("cnt"))


def bpe_fit(
    docs: DataFrame, text_col: str = "text", n_merges: int = BPE_MERGES
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn the first ``n_merges`` BPE merges (Sennrich et al. 2016,
    algorithm 1) and return ``(merges, fitted_vocab)`` where
    ``fitted_vocab`` is (w, cnt, rep) with ``rep`` the space-separated
    symbol stream of ``w`` after all merges (sentinel spaces at both
    ends, ``</w>`` terminal).

    Scale shape: the corpus is reduced ONCE to the distinct-word table,
    which is cached; each merge round is one vocabulary-sized aggregate
    whose argmax row (ties broken by (count desc, a, b)) — a bounded
    1-row collect — becomes a literal ``replace`` on the cached symbol
    streams.  Catalyst reuses neither exchanges nor identical aggregate
    subtrees (PLANS.md), so without the cache every round would replay
    the corpus word count.
    """
    rep0 = F.concat(
        F.lit(" "),
        F.regexp_replace("w", "(.)", "$1 "),
        F.lit(BPE_EOW + " "),
    )
    vocab = _word_counts(docs, text_col).select(
        "w", "cnt", rep0.alias("rep")
    ).persist()
    merges: list[tuple[str, str]] = []
    cur: F.Column = F.col("rep")
    for _ in range(n_merges):
        src = vocab.select("cnt", F.split(F.trim(cur), " ").alias("s"))
        pairs = src.select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("s") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("s"), i).alias("a"),
                        F.element_at(F.col("s"), i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        cur = F.replace(cur, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return merges, vocab.select("w", "cnt", cur.alias("rep"))


def bpe_encode(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Fit ``n_merges`` BPE merges on the corpus and encode it: one row
    per document with its word count and post-merge BPE token count.

    The encode side never re-tokenizes per document: it joins the
    corpus word stream to the fitted per-word symbol table on the word
    key (both sides hash-partitioned on ``w`` — vocabulary-sized build,
    corpus-sized probe) and rolls the per-word token counts up to the
    document — two key shuffles total at any corpus scale.
    """
    _, fitted = bpe_fit(docs, text_col=text_col, n_merges=n_merges)
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _WS)
        ).alias("w"),
    ).where(F.col("w") != "")
    ntok = F.size(F.split(F.trim("rep"), " "))
    return (
        words.join(fitted.select("w", ntok.alias("ntok")), "w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("ntok").cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", topk: int = BPE_TOPK
) -> DataFrame:
    """Top-``topk`` adjacent symbol-pair counts over the corpus — the
    BPE merge-candidate table (the argmax row is merge #1).

    Output: (left_sym, right_sym, pair_count), ordered by count desc
    then pair, deterministically tie-broken.
    """
    words = docs.select(
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _WS)
        ).alias("w")
    ).where(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count("*").cast("long").alias("cnt"))
    pairs = wc.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "cnt")
    return (
        pairs.groupBy(
            F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
        )
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(topk)
    )


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """PMI collocation mining — the word2phrase step (Mikolov et al.
    2013 §4) that promotes high-association bigrams into tokenizer
    vocabulary units, complementing the frequency-driven BPE trainer
    above: BPE merges what is FREQUENT, PMI surfaces what is
    ASSOCIATED (frequent together relative to the parts' frequencies).

        pmi(x, y) = ln( (c_xy / N_b) / ((c_x / N_u) * (c_y / N_u)) )

    with c_xy adjacent-bigram counts, c_x unigram counts, N_b / N_u the
    corpus totals.  Bigrams come from a zip of the token array with its
    own tail — no window, no per-doc sort; counts partial-combine
    map-side, the marginal joins key on the vocab-bounded unigram
    relation, and the totals are two bounded scalar collects.  The PMI
    double expression is spelled operation-for-operation identically in
    the DuckDB twin and pinned at 4dp (the DSIR ln precedent);
    ``min_count`` kills the low-count PMI explosion, ties break
    lexicographically.

    Output: top-``top_k`` rows (w1, w2, c_xy, pmi_e4 rank order).
    """
    from newscrawler_spark.functions.rounding import pinned_round
    from newscrawler_spark.functions.text import _ws_tokens

    arr = _ws_tokens(F.col(text_col))
    toks = docs.select(F.explode(arr).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w1"),
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_xy")
    )
    nu = uni.agg(F.sum("c")).collect()[0][0] or 0
    nb = big.agg(F.sum("c_xy")).collect()[0][0] or 0
    pmi = pinned_round(
        F.log(
            (F.col("c_xy").cast("double") * float(nu) * float(nu))
            / (F.col("cx").cast("double") * F.col("cy") * float(nb))
        ),
        4,
    )
    return (
        big.where(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("cx")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("cy")), "w2")
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def vocab_coverage(docs: DataFrame, vocab_size: int = 500) -> DataFrame:
    """Per-document OOV rate against the corpus top-``vocab_size`` word
    vocabulary — the coverage report every tokenizer build ends with
    (what fraction of the stream falls outside the vocab drives the
    UNK rate and therefore vocab-size/merge decisions).

    Fit-then-score, two deliberate corpus scans (the dsir/bm25
    pattern): the vocabulary is ONE token-count aggregate reduced to a
    TakeOrdered top-K — deterministic (count desc, word asc) — and
    broadcasts back as a build-side hash probe; scoring re-scans with
    a map-side join, so nothing token-scaled shuffles twice.  Output
    ``(doc_id, n_tokens, n_oov, oov_frac)`` with the fraction pinned
    to 4dp."""
    from newscrawler_spark.functions.rounding import pinned_round

    t = F.lower(F.trim(F.col("text")))
    words = docs.where(t != "").select(
        "doc_id", F.explode(F.split(t, _WS)).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(vocab_size)
        .select("w", F.lit(1).alias("iv"))
    )
    j = words.join(F.broadcast(vocab), "w", "left")
    per_doc = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    frac = F.col("n_oov").cast("double") / F.col("n_tokens")
    return per_doc.select(
        "doc_id", "n_tokens", "n_oov", pinned_round(frac, 4).alias("oov_frac")
    )
