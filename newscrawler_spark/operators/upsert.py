"""CDC merge-upsert compaction (lakehouse MERGE INTO semantics).

The reference mutates articles in place through SQLAlchemy sessions —
update-if-changed on recrawl, delete on takedown, insert on first
fetch (src/database/session.py, src/scrapers/batch_processor.py's
upsert path).  A Spark-native engine replaces row-at-a-time mutation
with snapshot compaction: a base snapshot plus an ordered change log
(op in {'U','D'}, monotonically increasing seq per key) folds into the
next snapshot — exactly Delta/Iceberg ``MERGE INTO`` with last-writer-
wins, expressed as two hash-partitioned passes:

  1. last-wins per key: one window over the change log keyed on the
     merge key (row_number over seq DESC);
  2. full-outer join base vs latest-change on the same key — the
     window's hash partitioning is reused by the join (subset rule),
     so the change log shuffles ONCE and the base shuffles once.

Semantics: 'D' drops the key; 'U' replaces the payload (insert when
the key is absent from base); untouched base rows pass through with
version 0; applied rows carry version = winning seq.

Scale: both shuffles are key-hash — no broadcast of anything
row-scaled, no driver state; at 100 TB the base side can additionally
be bucketed on the key to make compaction exchange-free on that side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame, key: str = "key", seq: str = "seq"
) -> DataFrame:
    """Last-writer-wins per key.  ``seq`` must be a total order per key
    (ties would be nondeterministic — callers assign unique seqs)."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload: list[str],
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Fold an ordered change log into a base snapshot (MERGE INTO).

    ``changes`` columns: key, seq, op ('U' upsert / 'D' delete), and
    every payload column (full-row upserts).  Returns the new snapshot:
    key, payload..., version (0 = untouched base row, else winning seq).
    """
    last = latest_changes(changes, key=key, seq=seq)
    b = base.select(key, *payload)
    c = last.select(
        F.col(key).alias("__ck"),
        F.col(seq).alias("__seq"),
        F.col(op).alias("__op"),
        *[F.col(p).alias(f"__c_{p}") for p in payload],
    )
    j = b.join(c, b[key] == c["__ck"], "full_outer")
    applied = F.col("__ck").isNotNull()
    out = j.where(~(applied & (F.col("__op") == "D"))).select(
        F.coalesce(F.col(key), F.col("__ck")).alias(key),
        *[
            F.when(applied, F.col(f"__c_{p}")).otherwise(F.col(p)).alias(p)
            for p in payload
        ],
        F.when(applied, F.col("__seq")).otherwise(F.lit(0)).cast("long").alias(
            "version"
        ),
    )
    return out


def incremental_group_stats(
    base_stats: DataFrame,
    changes: DataFrame,
    before: DataFrame,
    key: str = "doc_id",
    group: str = "source",
    measure: str = "toks",
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Incremental materialized-view maintenance for per-group
    (count, sum) aggregates — apply a CDC change log to stored
    aggregates WITHOUT recomputing over the snapshot (the delta-table
    half of Delta/Iceberg MERGE + downstream MV refresh; the reference
    recomputes its dashboard counts from scratch every request,
    src/api/routers/metrics.py).

    Inputs: ``base_stats`` = the stored MV ``(group, n_rows, total)``;
    ``changes`` = the log ``(key, seq, op, group, <measure> = the
    AFTER-image measure, null for 'D')``; ``before`` = before-images
    for keys present in the base ``(key, group, <measure>)`` — in a
    real CDC stream both images ride the same record (Debezium-style),
    here the caller supplies them.

    Algorithm: last-writer-wins per key over the log (one key window),
    left-join before-images on the key (log-sized, NOT snapshot-sized),
    per-row delta — insert (+1, +after), delete (−1, −before), update
    (0, after−before) — aggregated per group and added to the MV with
    a full-outer group join.  Cost scales with the CHANGE LOG, never
    the 100 TB snapshot; all arithmetic is exact BIGINT so the result
    is hash-identical to a full recompute (which is exactly what the
    DuckDB oracle does).  Output ``(group, n_rows, total)``."""
    last = latest_changes(changes, key=key, seq=seq)
    old = before.select(
        F.col(key).alias("__bk"),
        F.col(group).alias("__bg"),
        F.col(measure).cast("long").alias("__bm"),
    )
    j = last.join(old, last[key] == old["__bk"], "left")
    existed = F.col("__bk").isNotNull()
    is_del = F.col(op) == "D"
    dn = (
        F.when(is_del & existed, -1)
        .when(~is_del & ~existed, 1)
        .otherwise(0)
        .cast("long")
    )
    after_m = F.coalesce(F.col(measure).cast("long"), F.lit(0))
    before_m = F.coalesce(F.col("__bm"), F.lit(0))
    dm = F.when(is_del, -before_m).otherwise(after_m - before_m)
    delta = (
        j.select(
            F.coalesce(F.col("__bg"), F.col(group)).alias(group),
            dn.alias("__dn"),
            dm.cast("long").alias("__dm"),
        )
        .groupBy(group)
        .agg(
            F.sum("__dn").cast("long").alias("__dn"),
            F.sum("__dm").cast("long").alias("__dm"),
        )
    )
    b = base_stats.select(
        F.col(group).alias("__g"),
        F.col("n_rows").cast("long").alias("__n"),
        F.col("total").cast("long").alias("__t"),
    )
    out = b.join(delta, b["__g"] == delta[group], "full_outer")
    merged = out.select(
        F.coalesce(F.col("__g"), F.col(group)).alias(group),
        (F.coalesce(F.col("__n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0)))
        .cast("long")
        .alias("n_rows"),
        (F.coalesce(F.col("__t"), F.lit(0)) + F.coalesce(F.col("__dm"), F.lit(0)))
        .cast("long")
        .alias("total"),
    )
    # A group whose count reaches 0 is RETRACTED (the MV row deleted),
    # matching full-recompute semantics where GROUP BY emits no row for
    # an empty group — the classic incremental-view edge case.
    return merged.where(F.col("n_rows") != 0)
