"""Data selection via importance resampling (DSIR) weights.

The reference scores articles with a hand-weighted quality formula
(``/root/reference/src/scrapers/base_scraper.py:69-117``, covered by
A7/F8); selecting pretraining data *toward a target domain* is the
published complement: DSIR (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") fits two hashed-n-gram
bag-of-words distributions — one over a small curated target sample,
one over the raw pool — and scores every raw document with the
log-likelihood ratio of its features.  Documents are then resampled
proportionally to the (Gumbel-noised) weight; the deterministic weight
itself is the operator here.

Spark-first, two deliberate passes (the same shape DSIR itself has:
fit, then score):

* pass 1 (fit) reduces the corpus to a ``n_buckets``-row dimension —
  hashed unigram+bigram occurrence counts per bucket for target and
  raw, with map-side combine; the two corpus totals come from a
  whole-frame window over that tiny table (never a second corpus
  reduction — Catalyst does not reuse aggregate subtrees, PLANS.md).
* pass 2 (score) re-scans the raw pool, partial-aggregates
  (doc_id, bucket) counts map-side, broadcast-joins the dimension and
  rolls up one row per document.

Nothing row-scaled crosses the driver; the only shuffles are the two
bucket/doc-keyed partial aggregations.  The n-gram fan-out (n in
{1, 2}) is exploded as a COLUMN from one scan per pass, the
gopher_ngram_stats lesson.

Cross-engine contract: buckets are the md5/60-bit integer grid used by
the stratified sampler (exact in any engine); the weight is a sum of
``count * llr(bucket)`` terms — ln of small-integer ratios, far from
the pinned-rounding grid, and ``keep`` compares the PINNED-ROUNDED
weight so both engines threshold the identical 4dp value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round

# Explicit ASCII whitespace (the tri-engine collapse_ws pin).
_WS = r"[ \t\n\r\f\x0b]+"

DSIR_BUCKETS = 64


def _gram_buckets(
    docs: DataFrame,
    text_col: str,
    n_buckets: int,
    ns: tuple[int, ...] = (1, 2),
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, tgt, *carry, b): one row per n-gram OCCURRENCE (n in
    `ns`), hashed into `n_buckets` md5 buckets.  `docs` must carry a
    boolean `tgt`; `carry` lists extra doc-level columns to thread
    through the explosion (cheaper than re-joining the corpus later)."""
    t = F.trim(F.lower(F.col(text_col)))
    keep = ["doc_id", "tgt", *carry]
    base = docs.where(t != "").select(*keep, F.split(t, _WS).alias("w"))
    fanned = base.select(
        *keep,
        "w",
        F.explode(F.array(*[F.lit(n) for n in ns])).alias("n"),
    ).where(F.size("w") >= F.col("n"))
    grams = fanned.select(
        *keep,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - F.col("n")),
                lambda i: F.array_join(F.slice("w", i + 1, F.col("n")), " "),
            )
        ).alias("g"),
    )
    b = F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long") % n_buckets
    return grams.select(*keep, b.alias("b"))


def dsir_weights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance weight over the raw pool (rows
    where `target` is false), fit against the target sample (rows
    where it is true).  Output one row per scored raw document:
      n_grams — unigram+bigram occurrences (long),
      logw    — sum of per-bucket log-likelihood ratios, 4dp pinned,
      keep    — pinned logw > 0 (document looks target-like).
    """
    spark = docs.sparkSession
    flagged = docs.withColumn("tgt", target)
    gb = _gram_buckets(flagged, text_col, n_buckets)

    # pass 1: n_buckets-row dim; densify over the full bucket range so
    # the scoring join never needs a null-bucket fallback path
    counts = gb.groupBy("b").agg(
        F.coalesce(F.sum(F.when(F.col("tgt"), 1)), F.lit(0)).alias("ct"),
        F.coalesce(F.sum(F.when(~F.col("tgt"), 1)), F.lit(0)).alias("cr"),
    )
    dim = (
        spark.range(n_buckets)
        .select(F.col("id").alias("b"))
        # counts is <= n_buckets rows post-aggregate; hint it so the
        # densify join never sort-merges under a disabled auto-broadcast
        .join(F.broadcast(counts), "b", "left")
        .fillna(0, subset=["ct", "cr"])
    )
    # whole-frame window over n_buckets rows, never corpus rows (the
    # WindowExec single-partition warning is benign at this size)
    w0 = Window.partitionBy(F.lit(0))
    dim = dim.withColumn("tt", F.sum("ct").over(w0)).withColumn(
        "tr", F.sum("cr").over(w0)
    )
    llr = (
        F.log(F.col("ct") + 1)
        - F.log(F.col("cr") + 1)
        - F.log(F.col("tt") + n_buckets)
        + F.log(F.col("tr") + n_buckets)
    )
    dim = dim.select("b", llr.alias("llr"))

    # pass 2: score the raw pool against the broadcast dim
    per = gb.where(~F.col("tgt")).groupBy("doc_id", "b").agg(
        F.count("*").alias("c")
    )
    scored = per.join(F.broadcast(dim), "b").groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        pinned_round(F.sum(F.col("c") * F.col("llr")), 4).alias("logw"),
    )
    return scored.select(
        "doc_id", "n_grams", "logw", (F.col("logw") > 0).alias("keep")
    )


# --- CCNet perplexity buckets ---------------------------------------------

#: tercile labels in CDF order.
CCNET_HEAD, CCNET_MIDDLE, CCNET_TAIL = "head", "middle", "tail"


def ccnet_perplexity(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): fit a
    hashed-bigram LM on the `target` split, score every raw-pool doc
    with its mean negative log-likelihood, and split each language into
    head/middle/tail perplexity terciles.

    Differences from the paper, made deterministic and engine-exact:
    the 5-gram KenLM becomes an add-one-smoothed hashed-bigram LM (the
    DSIR feature space); "perplexity" is reported in log space (`nll`,
    pinned 4dp — exp() adds nothing but cross-engine float risk); the
    tercile cutoffs are the EXACT per-language CDF, not sampled
    quantiles, computed integer-only: a doc is `head` while
    3·(docs at or below its nll) <= n_lang, `middle` while <= 2·n_lang.

    Scale shape: the two corpus passes of DSIR (fit → 64-row broadcast
    dim, score → one (doc, bucket) shuffle), then the tercile CDF runs
    over the per-(lang, nll) VALUE table — thousands of rows, never
    corpus rows — and broadcast-joins back.  No global sort, no
    per-lang row-scaled window anywhere.

    Output: (doc_id, lang, n_grams, nll, bucket, keep) for raw-pool
    docs with >= 1 bigram; keep = not tail (CCNet's usual cut).
    """
    spark = docs.sparkSession
    flagged = docs.withColumn("tgt", target)
    gb = _gram_buckets(flagged, text_col, n_buckets, ns=(2,), carry=(lang_col,))

    # fit: add-one hashed-bigram LM over the target split
    counts = gb.where(F.col("tgt")).groupBy("b").agg(F.count("*").alias("cb"))
    dim = (
        spark.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(F.broadcast(counts), "b", "left")
        .fillna(0, subset=["cb"])
    )
    w0 = Window.partitionBy(F.lit(0))
    dim = dim.withColumn("tb", F.sum("cb").over(w0))
    logp = F.log(F.col("cb") + 1) - F.log(F.col("tb") + n_buckets)
    dim = dim.select("b", logp.alias("logp"))

    # score the raw pool
    per = (
        gb.where(~F.col("tgt"))
        .groupBy("doc_id", lang_col, "b")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        per.join(F.broadcast(dim), "b")
        .groupBy("doc_id", lang_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            pinned_round(-F.sum(F.col("c") * F.col("logp")) / F.sum("c"), 4).alias(
                "nll"
            ),
        )
    )

    # exact per-lang CDF over DISTINCT pinned nll values (tiny table)
    vals = scored.groupBy(lang_col, "nll").agg(F.count("*").alias("cv"))
    wl = (
        Window.partitionBy(lang_col)
        .orderBy("nll")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(lang_col)
    vals = vals.select(
        lang_col,
        "nll",
        F.sum("cv").over(wl).alias("cum"),
        F.sum("cv").over(wn).alias("n_lang"),
    )
    bucket = (
        F.when(F.col("cum") * 3 <= F.col("n_lang"), CCNET_HEAD)
        .when(F.col("cum") * 3 <= F.col("n_lang") * 2, CCNET_MIDDLE)
        .otherwise(CCNET_TAIL)
    )
    buckets = vals.select(lang_col, "nll", bucket.alias("bucket"))
    return scored.join(F.broadcast(buckets), [lang_col, "nll"]).select(
        "doc_id",
        F.col(lang_col).alias("lang"),
        "n_grams",
        "nll",
        "bucket",
        (F.col("bucket") != CCNET_TAIL).alias("keep"),
    )
