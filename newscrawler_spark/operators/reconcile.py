"""Table reconciliation fingerprints — cross-replica / cross-engine
data diffing at 100 TB.

Two snapshots of a replicated table (a migrated copy, a DR replica,
the output of a rewritten pipeline) cannot be compared row-by-row at
scale: the join itself would be a 100 TB shuffle.  The standard answer
(e.g. per-region Merkle trees in Dynamo-style anti-entropy, published
in the Dynamo SOSP'07 paper) is a bucketed fingerprint: hash every row
to a 60-bit value, XOR the hashes per key-bucket, and compare the tiny
per-bucket summary table — equal buckets are proven-in-expectation
equal, unequal buckets narrow the diff to 1/buckets of the data for a
targeted second pass.

XOR is the right combiner: commutative and associative (so the
aggregate is partition-order-independent and map-side partial), never
overflows, and any single-row difference flips the bucket fingerprint.
The row hash is the frozen md5→60-bit-int contract used by the crawl
url hashes, so DuckDB reproduces it bit-for-bit.

The reference has no reconciliation story (recrawls mutate rows in
place, src/database/session.py); this is the operator a lakehouse
deployment of the same data needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_checksum(docs: DataFrame, buckets: int = 64) -> DataFrame:
    """Per-bucket table fingerprint over ``documents``: bucket =
    doc_id mod `buckets`; per bucket the row count, XOR of the 60-bit
    row hashes (md5 over doc_id + content md5), and the doc_id range.
    One map-side-combined shuffle of `buckets` groups — the scan is
    the only row-scaled work.  Output ``(bucket, n_rows, xor_hash,
    id_lo, id_hi)``."""
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.md5(F.coalesce(F.col("text"), F.lit(""))),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            F.pmod(F.col("doc_id"), F.lit(buckets)).cast("long").alias("bucket"),
            row_h.alias("h"),
            "doc_id",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
            F.min("doc_id").cast("long").alias("id_lo"),
            F.max("doc_id").cast("long").alias("id_hi"),
        )
    )


def table_diff(
    snap_a: DataFrame, snap_b: DataFrame, buckets: int = 64
) -> DataFrame:
    """The targeted second pass ``table_checksum`` promises: given two
    snapshots, compare the per-bucket fingerprints, then row-diff ONLY
    the buckets whose fingerprints differ — rows present on one side
    but not the other (by doc_id + content md5), tagged with their
    side.

    Scale shape: the first pass is two checksum aggregates (scan-only,
    64-row outputs); the row diff filters both sides to the changed
    buckets BEFORE the anti-joins, so with doc_id-bucketed storage the
    second pass reads changed-buckets/``buckets`` of each table —
    partition pruning turns a 100 TB diff into a scan of just the
    disagreeing slices.  The anti-joins key on (doc_id, content_md5):
    hash-partitioned, no broadcast of anything row-scaled (the changed
    bucket list itself is ≤ 64 values, broadcast as an IN filter).
    Output ``(bucket, doc_id, side)`` — 'a' = only in A (deleted or
    old content), 'b' = only in B (inserted or new content).
    """
    fa = table_checksum(snap_a, buckets).select(
        "bucket", F.col("xor_hash").alias("ha"), F.col("n_rows").alias("na")
    )
    fb = table_checksum(snap_b, buckets).select(
        "bucket", F.col("xor_hash").alias("hb"), F.col("n_rows").alias("nb")
    )
    changed = (
        fa.join(fb, "bucket", "full_outer")
        .where(
            (F.col("ha").isNull())
            | (F.col("hb").isNull())
            | (F.col("ha") != F.col("hb"))
            | (F.col("na") != F.col("nb"))
        )
        .select("bucket")
    )

    def _keyed(df: DataFrame) -> DataFrame:
        return df.select(
            F.pmod(F.col("doc_id"), F.lit(buckets)).cast("long").alias("bucket"),
            "doc_id",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("cmd5"),
        ).join(F.broadcast(changed), "bucket")

    ka, kb = _keyed(snap_a), _keyed(snap_b)
    only_a = ka.join(kb, ["doc_id", "cmd5"], "left_anti").select(
        "bucket", "doc_id", F.lit("a").alias("side")
    )
    only_b = kb.join(ka, ["doc_id", "cmd5"], "left_anti").select(
        "bucket", "doc_id", F.lit("b").alias("side")
    )
    return only_a.unionByName(only_b)
