"""Z-order (Morton-curve) data layout — the lakehouse clustering
primitive (Delta ``OPTIMIZE ZORDER BY``, Iceberg sort orders).

Multi-dimensional scan pruning needs rows that are close in BOTH key
dimensions to land in the same file, so per-file min/max statistics cut
the scan for predicates on either key.  A linear sort clusters only its
leading column; interleaving the key bits (the Morton / Z-value) gives
every dimension locality.  At 100 TB this is the difference between
"time-range query scans everything" and "scans 1/256 of the files" —
the assignment itself is a projection over one broadcast 1-row stats
dim (no row-scaled shuffle), and the physical write is one
``repartitionByRange(z)``.

The reference stores articles in flat per-domain tables with no layout
control (``/root/reference/src/database/``); this operator is the
engine-side upgrade its scale story needs.

Cross-engine contract: each dimension is range-normalised to an 8-bit
bucket with pure integer arithmetic — ``(x − min)·256 div span`` (floor
division of non-negatives, identical in Spark ``div`` and DuckDB
``//``) — then bit-spread with the classic mask-shift magic numbers:
``& | <<`` on values < 2¹⁶, so the sign bit is never touched (the
sketch_bloom lesson: DuckDB errors on shifting into bit 63).  Exact
min/max replaces Delta's sampling-based range binning: deterministic,
hence oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def _spread8(c: Column) -> Column:
    """Spread the low 8 bits of `c` to the even bit positions of a
    16-bit value (Morton interleave half)."""
    x = c
    for shift, mask in ((4, 0x0F0F), (2, 0x3333), (1, 0x5555)):
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _bucket8(col: str, lo: str, hi: str) -> Column:
    """Range-normalise ``col`` into [0, 255] over the inclusive
    [lo, hi] span — integer floor division, exact in both engines."""
    return F.expr(f"CAST(({col} - {lo}) * 256 div ({hi} - {lo} + 1) AS BIGINT)")


def zorder_values(events: DataFrame) -> DataFrame:
    """Per-event Morton code over (user, day): both keys range-bucketed
    to 8 bits against the table's exact min/max (a broadcast 1-row
    stats dim), bit-interleaved to a 16-bit z-value, and assigned to
    one of 256 layout files by the top 8 z bits.  Output
    ``(event_id, user_id, day, z, file_id)``."""
    e = events.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}")
        .cast("long")
        .alias("day"),
    )
    stats = e.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("day").alias("d_lo"),
        F.max("day").alias("d_hi"),
    )
    j = e.join(F.broadcast(stats))
    ub = _bucket8("user_id", "u_lo", "u_hi")
    db = _bucket8("day", "d_lo", "d_hi")
    z = _spread8(ub).bitwiseOR(F.shiftleft(_spread8(db), 1)).cast("long")
    return j.select("event_id", "user_id", "day", z.alias("z")).withColumn(
        "file_id", F.expr("CAST(z div 256 AS BIGINT)")
    )


def compaction_plan(events: DataFrame, target_rows: int = 300) -> DataFrame:
    """Small-file compaction planner (Delta ``OPTIMIZE`` bin-packing,
    Iceberg ``rewrite_data_files``) over the z-layout: walk the 256
    layout files in z order and greedily pack z-ADJACENT files into
    jobs of ~``target_rows`` — adjacency preserves the Morton
    clustering that pruning depends on (a size-sorted bin-pack, what
    Delta does by default, would interleave distant z ranges and
    destroy both dimensions' per-file min/max tightness).

    Each file lands in job ``cum_rows_before div target`` — the
    fixed-capacity sequential pack, one integer expression, identical
    in DuckDB.  The plan runs on the FILE-STATS table (metadata scale:
    ~1 row per 100 MB file, so ~10⁶ rows at 100 TB), so the single
    unpartitioned ordering window costs nothing next to the data it
    plans for; the row-scaled work is only ``zorder_file_stats``'s own
    aggregate.  Output ``(job_id, n_files, total_rows, file_lo,
    file_hi)`` — contiguous file ranges, the mv-list a rewrite job
    executes.
    """
    from pyspark.sql import Window

    stats = zorder_file_stats(events).select("file_id", "n_rows")
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum("n_rows").over(w), F.lit(0)).cast("long")
    jobs = stats.withColumn("rows_before", before).withColumn(
        "job_id", F.expr(f"rows_before div {target_rows}")
    )
    return (
        jobs.groupBy("job_id")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.min("file_id").cast("long").alias("file_lo"),
            F.max("file_id").cast("long").alias("file_hi"),
        )
    )


def zorder_file_stats(events: DataFrame) -> DataFrame:
    """Per-layout-file pruning statistics — the observable value of the
    z-ordering: for each z-range file, the row count and the min/max of
    BOTH clustering dimensions.  Tight per-file ranges in both columns
    are what lets a min/max-pruning scan skip files for predicates on
    either key.  Output ``(file_id, n_rows, u_min, u_max, d_min,
    d_max)``."""
    return (
        zorder_values(events)
        .groupBy("file_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("user_id").cast("long").alias("u_min"),
            F.max("user_id").cast("long").alias("u_max"),
            F.min("day").cast("long").alias("d_min"),
            F.max("day").cast("long").alias("d_max"),
        )
    )
