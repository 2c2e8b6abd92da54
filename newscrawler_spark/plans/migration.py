"""Versioned schema migration over the round-dir storage seam.

The reference manages schema evolution with alembic migrations
(``/root/reference/alembic/``, ``create_migration.py``,
``create_topic_migration.py:1-26``): a revision ADDs COLUMNs (topics /
entities / relevance) to the articles table and a backfill populates
them for existing rows.  The rebuild's durable storage is the
round-partitioned parquet store (``plans/storage.RoundStore``), so the
lakehouse-shaped equivalent is an *Iceberg-style* add-column migration:

  * a migration to version ``v`` REWRITES each committed round dir into
    ``{root}/{table}@v{v}/round={r}`` with the new columns materialized
    (the backfill), committing a per-round marker manifest via atomic
    rename — the same tmp-file + ``os.rename`` protocol as round
    commits;
  * the ORIGINAL v1 round dirs are never touched — old snapshots stay
    readable at their original schema (time travel across the schema
    boundary), exactly like an Iceberg schema change that only adds
    metadata and new files;
  * the migration is RESUMABLE and idempotent: a crash mid-round leaves
    a v2 data dir without its marker, which the next run overwrites
    (``mode="overwrite"``) before re-committing; rounds whose marker
    exists are skipped entirely;
  * readers during/after the migration use ``read_rounds_at``: rounds
    with a committed v2 marker are served from the migrated files,
    unmigrated rounds are served from v1 with the backfill expression
    applied ON READ — because the backfill is a deterministic
    column expression, the merged view is value-identical at every
    point of the migration (mid-migration reads are consistent).  On a
    real backfill that runs an expensive model, the on-read branch
    would instead surface NULLs-with-version so callers can
    distinguish; here the deterministic expression doubles as the
    strongest correctness check (migrated-read ≡ recompute, which is
    what the DuckDB oracle asserts).

At 100 TB the per-round rewrite is the right shape: rounds migrate
independently (embarrassingly parallel across the cluster, one task
set per round dir, no shuffle — the transform is a narrow projection),
markers bound driver state to one manifest per round, and readers
never block on the migration's progress.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .storage import RoundStore


def _vdir(store: RoundStore, table: str, version: int) -> str:
    if version <= 1:
        return os.path.join(store.root, table)
    return os.path.join(store.root, f"{table}@v{version}")


def _vpath(store: RoundStore, table: str, version: int, round_id: int) -> str:
    return os.path.join(_vdir(store, table, version), f"round={round_id}")


def _marker_path(store: RoundStore, table: str, version: int, round_id: int) -> str:
    return os.path.join(
        store.root, "_manifests", f"mig-{table}-v{version}-round-{round_id}.json"
    )


def _schema_manifest_path(store: RoundStore, table: str) -> str:
    return os.path.join(store.root, "_manifests", f"schema-{table}.json")


def table_version(store: RoundStore, table: str) -> int:
    """Current committed schema version of ``table`` (1 = original)."""
    p = _schema_manifest_path(store, table)
    if not os.path.exists(p):
        return 1
    with open(p) as f:
        return int(json.load(f)["version"])


def migrated_rounds(store: RoundStore, table: str, version: int) -> set[int]:
    """Rounds whose v{version} rewrite has a committed marker."""
    man_dir = os.path.join(store.root, "_manifests")
    prefix = f"mig-{table}-v{version}-round-"
    out = set()
    for n in os.listdir(man_dir):
        if n.startswith(prefix) and n.endswith(".json"):
            out.add(int(n[len(prefix) : -len(".json")]))
    return out


def committed_rounds(store: RoundStore, table: str) -> list[int]:
    """Rounds of ``table`` visible at v1 (committed manifest + data dir)."""
    upto = store.last_committed_round()
    return [
        r
        for r in range(-1, upto + 1)
        if os.path.isdir(_vpath(store, table, 1, r))
    ]


def _best_source_version(store: RoundStore, table: str, version: int, r: int) -> int:
    """Highest committed rewrite version < ``version`` for round ``r``
    (1 = the original base).  Both the migrator and the reader source
    each round from here: a v(n) transform is written against the
    v(n-1) shape, so feeding it the v1 base when a committed v2
    rewrite exists would either fail (missing column) or silently
    recompute values the committed bytes already pinned."""
    for v in range(version - 1, 1, -1):
        if r in migrated_rounds(store, table, v) and os.path.isdir(
            _vpath(store, table, v, r)
        ):
            return v
    return 1


def migrate_table(
    store: RoundStore,
    spark: SparkSession,
    table: str,
    version: int,
    transform: Callable[[DataFrame], DataFrame],
    rounds: list[int] | None = None,
) -> dict:
    """ADD-COLUMN + backfill migration of ``table`` to ``version``.

    ``transform`` maps a v(old) round DataFrame to its v(new) shape
    (typically ``withColumn`` backfills — a narrow projection, no
    shuffle).  Each round is rewritten into the versioned dir and
    committed with an atomic marker; rounds already bearing a marker
    are skipped, so re-running after a crash (or calling twice)
    completes / no-ops.  ``rounds`` restricts the pass (tests use it to
    simulate a crash mid-migration).  Returns an audit dict
    {round_id: rows_backfilled} for the rounds processed this call.
    """
    todo = committed_rounds(store, table) if rounds is None else rounds
    done = migrated_rounds(store, table, version)
    audit: dict[int, int] = {}
    for r in todo:
        if r in done:
            continue
        src_v = _best_source_version(store, table, version, r)
        src_path = _vpath(store, table, src_v, r)
        src = (
            spark.read.parquet(src_path) if os.path.isdir(src_path) else None
        )
        if src is None:
            continue
        dst = _vpath(store, table, version, r)
        transform(src).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        tmp = _marker_path(store, table, version, r) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"table": table, "version": version, "round_id": r, "rows": n}, f)
        os.rename(tmp, _marker_path(store, table, version, r))
        audit[r] = n
    # Flip the table's schema manifest only once every committed round
    # has a marker — the version flip is the migration's commit point.
    # A table with NO committed rounds must not flip (the empty set is
    # a subset of anything — a vacuous flip would record the migration
    # "complete" before a single round was rewritten, and rounds
    # written afterwards would read at the new version unmigrated).
    committed = committed_rounds(store, table)
    if committed and set(committed) <= migrated_rounds(store, table, version):
        tmp = _schema_manifest_path(store, table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"table": table, "version": version}, f)
        os.rename(tmp, _schema_manifest_path(store, table))
    return audit


def read_rounds_at(
    store: RoundStore,
    spark: SparkSession,
    table: str,
    version: int,
    backfill: Callable[[DataFrame], DataFrame] | None = None,
    upto: int | None = None,
) -> DataFrame | None:
    """Union of committed rounds at schema ``version``.

    Rounds with a committed v{version} marker read the migrated files;
    unmigrated rounds read v1 and apply ``backfill`` on the fly — so a
    reader sees one consistent schema at every point of the migration.
    ``version=1`` always reads the original snapshot (time travel
    across the schema boundary).
    """
    if upto is None:
        upto = store.last_committed_round()
    if version <= 1:
        return store.read_rounds(spark, table, upto=upto)
    done = migrated_rounds(store, table, version)
    new_paths = [
        _vpath(store, table, version, r)
        for r in range(-1, upto + 1)
        if r in done and os.path.isdir(_vpath(store, table, version, r))
    ]
    # For rounds without a v{version} marker, fall back to each round's
    # BEST committed earlier rewrite (highest marker version < version,
    # else the v1 base) — reading v1 under a v3 migration when the
    # round holds a committed v2 rewrite would hand the backfill a
    # shape it was not written for (and silently recompute v2 values
    # the committed bytes already pinned).  The backfill receives the
    # source-version shape; fallback groups are per source version so
    # schemas never mix inside one read.
    fallback: dict[int, list[int]] = {}
    for r in range(-1, upto + 1):
        if r in done:
            continue
        src_v = _best_source_version(store, table, version, r)
        if os.path.isdir(_vpath(store, table, src_v, r)):
            fallback.setdefault(src_v, []).append(r)
    parts: list[DataFrame] = []
    if new_paths:
        parts.append(spark.read.parquet(*new_paths))
    for src_v, rounds_v in sorted(fallback.items()):
        old = spark.read.parquet(
            *[_vpath(store, table, src_v, r) for r in rounds_v]
        )
        if backfill is None:
            raise ValueError(
                f"rounds {rounds_v} not yet migrated to v{version} and no "
                "on-read backfill provided"
            )
        parts.append(backfill(old))
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df
