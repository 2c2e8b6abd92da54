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
