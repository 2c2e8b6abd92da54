"""Shuffle-skew diagnostics — the measurement behind every salting
decision in this repo.

A key whose row count exceeds a few fair shares of the target
partitioning turns any groupBy/join on that key into one straggler
task (the politeness queue's hot-domain problem — SURVEY §2 W2 — is
exactly this, solved there with n_salts).  Before picking a salt
factor you have to MEASURE: this operator reports every heavy key with
its share and the smallest salt factor that brings its largest salted
slice back under the fair share.

Scale shape: the per-key count is one map-side-combined shuffle — the
combine means each mapper emits at most its distinct-key count, so the
diagnostic itself survives the skew it measures (the hot key arrives
at its reducer as ~n_mappers partial counts, not raw rows).  The
output is bounded by the heavy-key count (≤ P keys can exceed a fair
share), so the report is always tiny.

All arithmetic is integer (basis points, ceiling division) — identical
in DuckDB, hence gate-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    target_partitions: int = 32,
    heavy_shares: int = 2,
) -> DataFrame:
    """Keys holding more than ``heavy_shares`` fair shares of a
    ``target_partitions``-way shuffle.  For each: the row count, its
    share in basis points, and the smallest salt factor restoring the
    fair share (``ceil(cnt · P / total)`` — salting the key into that
    many sub-keys caps the largest slice at ~total/P rows).  Output
    ``(key, cnt, share_bp, salt)``."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    j = counts.join(F.broadcast(total))
    p = F.lit(target_partitions)
    heavy = j.where(F.col("cnt") * p > heavy_shares * F.col("total"))
    share_bp = F.expr("(cnt * 10000) div total")
    salt = F.expr(f"(cnt * {target_partitions} + total - 1) div total")
    return heavy.select(
        "key",
        "cnt",
        share_bp.cast("long").alias("share_bp"),
        salt.cast("long").alias("salt"),
    )
