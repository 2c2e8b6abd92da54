"""Training-batch assembly: sequence packing and domain-mix weights.

Two operators a pretraining data pipeline runs after cleaning
(the reference stops at per-article storage —
``/root/reference/src/scrapers/base_scraper.py`` hands cleaned articles
to the DB; batching for a trainer is out of its scope, so these are
public-knowledge additions, not ports):

* ``pack_sequences`` — the standard concat-then-chunk packing used by
  GPT-style pretraining loaders: within each shard (here: ``source``),
  documents are laid end-to-end in a deterministic order and the token
  stream is cut into fixed-size blocks; a document belongs to the block
  its first token lands in.  Expressed as an exclusive running sum over
  a ``partitionBy(shard)`` window — every shard packs independently and
  in parallel, so there is NO global sort: at 100 TB the window sort is
  per-shard (the same unit a real loader shuffles), AQE-splittable, and
  the output aggregate reuses the window's partitioning.

* ``domain_mix`` — temperature-flattened domain sampling weights
  (the multinomial ``p^alpha`` smoothing of Xue et al. 2021, mT5
  §3.1, with alpha=0.5): up-weights tail domains, down-weights head
  domains.  All cross-engine-visible arithmetic is pinned: token
  counts are integers, and the smoothed share normalizer is the
  *integer* sum of per-domain ``floor(sqrt(p)·1e9)`` — an order-free
  reduction, unlike a raw double sum whose low bits depend on
  aggregation order (the events/orders lesson in the entry-module
  header).  Plan shape: ONE corpus reduction (groupBy domain), then
  whole-frame windows over the per-domain table for the two corpus
  scalars — the window's single partition holds #domains rows, never
  corpus rows, and nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round
from newscrawler_spark.functions.text import ws_token_count

PACK_BLOCK_TOKENS = 2048
MIX_ALPHA_SCALE = 1_000_000_000  # floor(sqrt(p) * 1e9) smoothing grid


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    shard_col: str = "source",
    order_col: str = "doc_id",
    block_tokens: int = PACK_BLOCK_TOKENS,
) -> DataFrame:
    """Concat-then-chunk packing per shard.  Output one row per
    (shard, block): n_docs (documents starting in the block),
    n_tokens (their summed whitespace tokens), first/last doc id."""
    toks = ws_token_count(F.col(text_col))
    w = Window.partitionBy("shard").orderBy("doc")
    laid = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(order_col).alias("doc"),
        toks.alias("toks"),
    ).withColumn("start", F.sum("toks").over(w) - F.col("toks"))
    return (
        laid.withColumn("block_id", F.floor(F.col("start") / block_tokens))
        .groupBy("shard", "block_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
            F.min("doc").alias("first_doc"),
            F.max("doc").alias("last_doc"),
        )
    )


def domain_mix(
    docs: DataFrame, text_col: str = "text", domain_col: str = "source"
) -> DataFrame:
    """Per-domain sampling weights for a temperature-flattened training
    mix (alpha = 0.5).  Output one row per domain:
      n_tokens      — integer whitespace-token mass,
      p             — its fraction of the corpus (6dp),
      share         — smoothed target fraction ∝ sqrt(p) (6dp),
      weight        — share / p, the per-document sampling multiplier
                      a loader applies to hit the target mix (4dp).
    """
    per = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(ws_token_count(F.col(text_col))).cast("long").alias("n_tokens")
    )
    # The corpus-reduction runs ONCE; total and the smoothing normalizer
    # are whole-frame windows over the small per-domain table (a naive
    # agg-and-join-back form planned 4 independent corpus scans —
    # Catalyst does not reuse the identical aggregate subtrees).  The
    # single-partition window holds #domains rows, not corpus rows.
    # whole-frame window; WindowExec's all-to-one-partition warning is
    # expected and benign here — the input is the per-domain aggregate
    # (#domains rows), not the corpus (a foldable partition key is
    # pruned by Catalyst, so lit(0) cannot suppress the warning)
    wall = Window.partitionBy(F.lit(0))
    scaled = per.withColumn(
        "total", F.sum("n_tokens").over(wall).cast("long")
    ).withColumn(
        "q",
        F.floor(
            F.sqrt(F.col("n_tokens") / F.col("total")) * F.lit(float(MIX_ALPHA_SCALE))
        ).cast("long"),
    )
    p = F.col("n_tokens") / F.col("total")
    share = F.col("q") / F.sum("q").over(wall).cast("long")
    return scaled.select(
        "domain",
        "n_tokens",
        pinned_round(p, 6).alias("p"),
        pinned_round(share, 6).alias("share"),
        pinned_round(share / p, 4).alias("weight"),
    )


SHUFFLE_SHARDS = 64


def shuffle_assign(
    docs: DataFrame,
    salt: str = "epoch0",
    n_shards: int = SHUFFLE_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for one training epoch: every doc
    gets a shard and a position inside it, from the salted md5 grid the
    stratified sampler uses (60-bit int of the first 15 hex chars) —
    reproducible under any partitioning, engine, or corpus subset, and
    a new ``salt`` (epoch) is an entirely fresh permutation.

    This is the loader-facing step BEFORE :func:`pack_sequences`
    (feed it ``shard_col="shard", order_col="pos"``): concat-then-chunk
    packing over a shuffled order is exactly the GPT-style epoch
    pipeline.

    Scale shape: one hash shuffle on ``shard``, then a per-shard sort
    for ``row_number`` — ``n_shards`` grows with the corpus so each
    sort stays executor-sized; there is no global sort and no driver
    involvement.  Output: (doc_id, shard, sort_key, pos).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (h % n_shards).cast("int").alias("shard"),
        h.alias("sort_key"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return base.select(
        "doc_id", "shard", "sort_key", F.row_number().over(w).cast("long").alias("pos")
    )


def mix_budget(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Token-budget allocation for a temperature-flattened training
    mix — the planning step after :func:`domain_mix`: given a global
    training budget, how many tokens to draw from each domain and how
    many epochs of that domain's data that implies (epochs > 1 = the
    deliberate data repetition temperature flattening causes on small
    domains, the quantity scaling-law work budgets for).

    All allocation arithmetic is INTEGER: alloc = budget·q div Σq over
    the same floor(sqrt(p)·1e9) smoothing grid as ``domain_mix``, and
    epochs are basis points ``alloc·10⁴ div n_tokens`` — so the plan is
    engine-exact and the gate hashes it.  Same two-stage shape as
    domain_mix: ONE corpus reduction, then whole-frame windows over the
    #domains-row table.  Output ``(domain, n_tokens, alloc_tokens,
    epochs_bp)``."""
    per = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(ws_token_count(F.col(text_col))).cast("long").alias("n_tokens")
    )
    wall = Window.partitionBy(F.lit(0))
    scaled = per.withColumn(
        "total", F.sum("n_tokens").over(wall).cast("long")
    ).withColumn(
        "q",
        F.floor(
            F.sqrt(F.col("n_tokens") / F.col("total")) * F.lit(float(MIX_ALPHA_SCALE))
        ).cast("long"),
    )
    z = F.sum("q").over(wall).cast("long")
    alloc = F.expr(f"CAST({budget_tokens} AS BIGINT) * q div z")
    return (
        scaled.withColumn("z", z)
        .withColumn("alloc_tokens", alloc.cast("long"))
        .withColumn("epochs_bp", F.expr("alloc_tokens * 10000 div n_tokens"))
        .select("domain", "n_tokens", "alloc_tokens", "epochs_bp")
    )
