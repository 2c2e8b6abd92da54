"""Supervised hashed-feature Naive Bayes text classifier.

The GPT-3 / CCNet / fastText lineage of corpus curation trains a cheap
linear classifier on a small labeled seed ("looks like the reference
corpus?" / language / domain) and scores every pool document with it
(Brown et al. 2020 §A; Joulin et al. 2016).  The reference's analog is
its hand-weighted quality score (``base_scraper.py:69-117``, covered
by A7/F8) — this operator is the LEARNED counterpart: multinomial
Naive Bayes over hashed unigram buckets, fit and applied entirely
in-engine so the whole fit→score pipeline is one deterministic,
DuckDB-replayable query at any corpus scale.

Plan shape (the DSIR fit-then-score twin, operators/selection.py):

* the train/test split is the frozen md5/60-bit grid
  (``stratified_sample_hash`` — reproducible under any partitioning,
  engine, or corpus subset);
* fit pass: train-split tokens partial-aggregate map-side into an
  ``n_buckets``-row (bucket, pos, neg) dimension; the class totals are
  whole-frame windows OVER that tiny table (never a second corpus
  reduction — Catalyst reuses no aggregate subtrees, PLANS.md), giving
  Laplace-smoothed log-likelihood-ratio weights;
* prior pass: one doc-level aggregate that never touches the text
  column (column pruning keeps this scan almost free);
* score pass: test-split tokens partial-aggregate to (doc, bucket)
  counts, broadcast-join the weight dimension, roll up one row per
  document — ``score = prior + Σ count·w(bucket)``.

Nothing row-scaled crosses the driver; the corpus is scanned twice
(fit tokens, score tokens) plus the pruned prior scan.  Cross-engine
contract: md5 buckets are exact everywhere; weights are ``ln`` of
small-integer ratios pinned-rounded at 4dp before the sign decision
(the DSIR precedent), and ASCII ``translate`` folding — never
``lower()`` — keeps tokenization byte-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round

from .quality import _ascii_lower, stratified_sample_hash

# Explicit ASCII whitespace (the tri-engine collapse_ws pin).
_WS = r"[ \t\n\r\f\x0b]+"

NB_BUCKETS = 128
NB_TRAIN_BP = 6000  # basis points of the md5 grid that train
NB_SALT = "nbsplit:v1"


def nb_classify(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = NB_BUCKETS,
    train_bp: int = NB_TRAIN_BP,
    salt: str = NB_SALT,
) -> DataFrame:
    """Fit NB on the md5-grid train split (``u < train_bp`` of 10000),
    score the held-out split: one row per test doc with ≥1 token —
    (doc_id, score_nb, pred_pos, label_pos).

    ``pred_pos`` thresholds the PINNED-ROUNDED score at 0 so both
    engines decide on the identical 4dp value.
    """
    u = stratified_sample_hash(F.col(id_col), salt)
    base = docs.select(
        F.col(id_col),
        F.coalesce(_ascii_lower(F.col(text_col)), F.lit("")).alias("t"),
        label.alias("y"),
        (u < train_bp).alias("tr"),
    )
    b = (
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
        % n_buckets
    )
    tok = base.select(
        id_col,
        "y",
        "tr",
        F.explode(F.split("t", _WS)).alias("w"),
    ).where(F.col("w") != "").select(id_col, "y", "tr", b.alias("b"))

    # fit: bucket dimension with Laplace-smoothed LLR weights
    pos_c = F.col("pos") + 1
    neg_c = F.col("neg") + 1
    whole = Window.partitionBy()
    dim = (
        tok.where("tr")
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("pos"),
            F.sum(F.when(~F.col("y"), 1).otherwise(0)).cast("long").alias("neg"),
        )
        .select(
            "b",
            (
                F.log(pos_c / (F.sum("pos").over(whole) + n_buckets))
                - F.log(neg_c / (F.sum("neg").over(whole) + n_buckets))
            ).alias("w"),
        )
    )

    # prior: doc-level class balance on the train split — the scan is
    # pruned to (id, label, grid hash); text is never read here
    prior = base.where("tr").agg(
        F.log(
            (F.sum(F.when(F.col("y"), 1).otherwise(0)) + 1)
            / (F.sum(F.when(~F.col("y"), 1).otherwise(0)) + 1)
        ).alias("prior")
    )

    # score: (doc, bucket) integer counts, broadcast weight join, roll-up
    counts = (
        tok.where(~F.col("tr"))
        .groupBy(id_col, "y", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    s = F.col("raw") + F.col("prior")
    return (
        counts.join(F.broadcast(dim), "b")
        .groupBy(id_col, "y")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("raw"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            pinned_round(s, 4).alias("score_nb"),
            (pinned_round(s, 4) > 0).alias("pred_pos"),
            F.col("y").alias("label_pos"),
        )
    )
