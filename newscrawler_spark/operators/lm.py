"""Interpolated Kneser-Ney bigram LM estimation over the corpus.

CCNet/Gopher-style pipelines gate documents on LM perplexity; the
KenLM models they score with are n-gram counts + Kneser-Ney smoothing
(Heafield 2011; Ney-Essen-Kneser 1994) — estimating one IS a corpus
aggregation job, and at 100 TB it is one of the canonical "count
everything twice" MapReduce workloads.  The reference has no LM
(its quality gate is the weighted completeness score,
src/scrapers/base_scraper.py:69-117); this operator is part of the
training-data surface next to pipeline_ccnet_buckets' NLL scorer.

Interpolated KN with fixed discount D = 3/4:

  P(w2|w1) = (max(c12 - D, 0) + D * N1+(w1 *) * Pcont(w2)) / c1
  Pcont(w2) = N1+(* w2) / B

Cross-engine discipline: multiply through by 4*c1*B so every term is
an exact BIGINT —

  num = B * max(4*c12 - 3, 0) + 3 * nf * np      (nf=N1+(w1 *), np=N1+(* w2))
  den = 4 * c1 * B
  p_kn = pinned_round(num / den, 8)              # ONE IEEE double division

Plan shape: corpus scan -> bigram explode -> groupBy(w1,w2) [exchange 1]
-> window PARTITION BY w1 (c1 and nf share the partitioning) [exchange 2]
-> window PARTITION BY w2 (np) [exchange 3] -> broadcast of the 1-row
B aggregate (never a whole-frame window: the distinct-bigram table is
corpus-scaled, so an unpartitioned window would single-task it).
All three exchanges move the DISTINCT-pair table, not corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round
from newscrawler_spark.functions.text import _ws_tokens

D_NUM = 3  # discount D = 3/4, the standard fixed KN discount
D_DEN = 4


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c12) over lower(trim(text)) whitespace tokens.  The
    sequence(1, size-1) is guarded: Spark sequence() DESCENDS when the
    upper bound is below the lower (PLANS.md), so 0/1-token docs must
    short-circuit to an empty array, not sequence(1, 0)."""
    toks = _ws_tokens(F.lower(F.trim(F.col(text_col))))
    pairs = F.when(
        F.size(F.col("__t")) >= 2,
        F.expr(
            "transform(sequence(1, size(__t) - 1), "
            "i -> struct(__t[i-1] AS w1, __t[i] AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.select(toks.alias("__t"))
        .select(F.explode(pairs).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def kneser_ney_bigrams(
    docs: DataFrame, text_col: str = "text", top: int = 200
) -> DataFrame:
    """Top-``top`` bigrams by raw count with their interpolated-KN
    probability.  Output: w1, w2, c12, c1, nf, np, p_kn — every count
    exact BIGINT, p_kn the single pinned division.  The top-k cutoff
    orders by (c12 DESC, w1, w2): a total order, so the cut is
    deterministic in any engine."""
    bc = bigram_counts(docs, text_col=text_col)
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    scored = (
        bc.withColumn("c1", F.sum("c12").over(w1w))
        .withColumn("nf", F.count(F.lit(1)).over(w1w))
        .withColumn("np", F.count(F.lit(1)).over(w2w))
    )
    b_tot = bc.groupBy().agg(F.count(F.lit(1)).alias("B"))
    scored = scored.crossJoin(F.broadcast(b_tot))
    num = F.col("B") * F.greatest(
        F.lit(D_DEN) * F.col("c12") - F.lit(D_NUM), F.lit(0)
    ) + F.lit(D_NUM) * F.col("nf") * F.col("np")
    den = F.lit(D_DEN) * F.col("c1") * F.col("B")
    out = scored.select(
        "w1",
        "w2",
        "c12",
        "c1",
        "nf",
        "np",
        pinned_round(num.cast("double") / den.cast("double"), 8).alias("p_kn"),
    )
    return out.orderBy(F.desc("c12"), "w1", "w2").limit(top)
