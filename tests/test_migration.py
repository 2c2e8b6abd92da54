"""Schema-evolution migration over the round-dir store (plans/
migration.py — the alembic add-column+backfill analog, reference
create_topic_migration.py:1-26): versioned rewrite with atomic
markers, resume across a crash mid-migration, idempotent re-run,
mid-migration read consistency, and v1 time travel."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.plans.migration import (
    committed_rounds,
    migrate_table,
    migrated_rounds,
    read_rounds_at,
    table_version,
)
from newscrawler_spark.plans.storage import RoundStore


def _add_len(df):
    return df.withColumn("x_len", F.length("t").cast("long"))


def _build_store(spark, root, n_rounds=3, rows_per=20):
    store = RoundStore(str(root))
    for r in range(n_rounds):
        df = spark.range(r * rows_per, (r + 1) * rows_per).select(
            F.col("id").alias("k"),
            F.concat(F.lit("row-"), F.col("id").cast("string")).alias("t"),
        )
        store.write_round("docs", r, df, partitions=2)
        store.commit_round(r, {"n": rows_per})
    return store


def test_migrate_full_pass_and_version_flip(spark, tmp_path):
    store = _build_store(spark, tmp_path)
    assert table_version(store, "docs") == 1
    audit = migrate_table(store, spark, "docs", 2, _add_len)
    assert audit == {0: 20, 1: 20, 2: 20}
    assert table_version(store, "docs") == 2
    assert migrated_rounds(store, "docs", 2) == {0, 1, 2}
    got = read_rounds_at(store, spark, "docs", 2)
    assert got.count() == 60
    assert set(got.columns) == {"k", "t", "x_len"}
    # migrated values come from the rewritten FILES and equal the recompute
    bad = got.where(F.col("x_len") != F.length("t")).count()
    assert bad == 0


def test_migration_resumes_after_crash(spark, tmp_path):
    """Crash after round 0: marker committed for 0 only; round 1's data
    dir half-written without a marker.  Re-run skips 0, overwrites 1,
    completes 2 — and only then flips the schema manifest."""
    store = _build_store(spark, tmp_path)
    migrate_table(store, spark, "docs", 2, _add_len, rounds=[0])
    assert migrated_rounds(store, "docs", 2) == {0}
    assert table_version(store, "docs") == 1  # not flipped yet
    # simulate a crash mid-round-1 rewrite: junk data, no marker
    d = os.path.join(str(tmp_path), "docs@v2", "round=1")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-junk.parquet"), "w") as f:
        f.write("corrupt")

    audit = migrate_table(store, spark, "docs", 2, _add_len)
    assert audit == {1: 20, 2: 20}  # 0 skipped (already committed)
    assert table_version(store, "docs") == 2
    assert read_rounds_at(store, spark, "docs", 2).count() == 60


def test_migration_idempotent(spark, tmp_path):
    store = _build_store(spark, tmp_path)
    migrate_table(store, spark, "docs", 2, _add_len)
    audit2 = migrate_table(store, spark, "docs", 2, _add_len)
    assert audit2 == {}  # nothing re-rewritten
    assert read_rounds_at(store, spark, "docs", 2).count() == 60


def test_mid_migration_read_consistency(spark, tmp_path):
    """A reader at v2 while only round 0 has migrated sees one schema:
    migrated rounds from the v2 files, the rest via on-read backfill —
    value-identical to the post-migration read."""
    store = _build_store(spark, tmp_path)
    migrate_table(store, spark, "docs", 2, _add_len, rounds=[0])
    mid = read_rounds_at(store, spark, "docs", 2, backfill=_add_len)
    mid_rows = {r["k"]: r["x_len"] for r in mid.collect()}
    migrate_table(store, spark, "docs", 2, _add_len)
    post = read_rounds_at(store, spark, "docs", 2)
    post_rows = {r["k"]: r["x_len"] for r in post.collect()}
    assert mid_rows == post_rows
    # without a backfill, reading unmigrated rounds at v2 is a loud error
    store2 = _build_store(spark, tmp_path / "s2")
    migrate_table(store2, spark, "docs", 2, _add_len, rounds=[0])
    with pytest.raises(ValueError, match="not yet migrated"):
        read_rounds_at(store2, spark, "docs", 2).count()


def test_v1_time_travel_untouched(spark, tmp_path):
    store = _build_store(spark, tmp_path)
    v1_before = {
        tuple(sorted(r.asDict().items()))
        for r in read_rounds_at(store, spark, "docs", 1).collect()
    }
    migrate_table(store, spark, "docs", 2, _add_len)
    v1_after_df = read_rounds_at(store, spark, "docs", 1)
    assert set(v1_after_df.columns) == {"k", "t"}  # original schema
    v1_after = {
        tuple(sorted(r.asDict().items())) for r in v1_after_df.collect()
    }
    assert v1_before == v1_after
    assert committed_rounds(store, "docs") == [0, 1, 2]


def test_expire_rounds_retention(spark, tmp_path):
    """expire_rounds drops old rounds' data + manifests (including
    migration rewrites and markers), preserves newer rounds, resume
    position, and the reserved round -1; idempotent."""
    store = _build_store(spark, tmp_path)
    migrate_table(store, spark, "docs", 2, _add_len)
    # a frontier-style reserved init round must survive any expiry
    df = spark.range(3).selectExpr("id AS k", "CAST(id AS STRING) AS t")
    store.write_round("frontier", -1, df, partitions=1)

    removed = store.expire_rounds(before=2)
    assert ("docs", 0) in removed and ("docs", 1) in removed
    assert all(r < 2 for _, r in removed)
    assert store.last_committed_round() == 2
    assert store.read_rounds(spark, "docs").count() == 20  # round 2 only
    assert read_rounds_at(store, spark, "docs", 2).count() == 20
    assert store.read_round(spark, "frontier", -1).count() == 3
    assert migrated_rounds(store, "docs", 2) == {2}  # old markers gone
    import os as _os

    assert not _os.path.isdir(_os.path.join(str(tmp_path), "docs", "round=0"))
    assert not _os.path.isdir(_os.path.join(str(tmp_path), "docs@v2", "round=1"))
    assert store.expire_rounds(before=2) == []  # idempotent


def test_expire_clamps_to_newest_committed(spark, tmp_path):
    """An over-eager cutoff must never delete the latest snapshot —
    retention keeps resume semantics intact (before is clamped)."""
    store = _build_store(spark, tmp_path)
    removed = store.expire_rounds(before=99)
    assert set(removed) == {("docs", 0), ("docs", 1)}
    assert store.last_committed_round() == 2
    assert store.read_rounds(spark, "docs").count() == 20


def test_migrate_empty_table_does_not_flip(spark, tmp_path):
    """A table with no committed rounds must not vacuously commit the
    version flip (empty ⊆ anything)."""
    store = RoundStore(str(tmp_path))
    audit = migrate_table(store, spark, "docs", 2, _add_len)
    assert audit == {}
    assert table_version(store, "docs") == 1


def test_multi_hop_fallback_reads_best_committed_version(spark, tmp_path):
    """Mid-v3 migration, unmigrated rounds must be served from their
    committed v2 rewrite (v2 shape + v2→v3 backfill), never from v1 —
    the v3 backfill references a v2 column absent at v1."""
    store = _build_store(spark, tmp_path)
    migrate_table(store, spark, "docs", 2, _add_len)  # full v2

    def _v3(df):  # v2 → v3: derives from the v2 column
        return df.withColumn("x2", (F.col("x_len") * 2).cast("long"))

    migrate_table(store, spark, "docs", 3, lambda df: _v3(df), rounds=[0])
    mid = read_rounds_at(store, spark, "docs", 3, backfill=_v3)
    rows = {r["k"]: (r["x_len"], r["x2"]) for r in mid.collect()}
    assert len(rows) == 60
    assert all(x2 == 2 * xl for xl, x2 in rows.values())
    # completing v3 gives the identical view
    migrate_table(store, spark, "docs", 3, lambda df: _v3(df))
    post = {
        r["k"]: (r["x_len"], r["x2"])
        for r in read_rounds_at(store, spark, "docs", 3).collect()
    }
    assert post == rows
    assert table_version(store, "docs") == 3
