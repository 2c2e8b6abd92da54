"""Per-host politeness budget + deterministic priority ordering.

The reference schedules with a ``heapq`` on ``(priority, created_at)``
(``src/scrapers/scheduler.py:44-56,344-356``) and throttles per-domain
with a token bucket (``src/scrapers/rate_limiter.py:87-134``).  The
batched-round translation: each round a host may fetch at most

    budget(host) = max(1, round_budget // crawl_delay(host))

URLs (the token bucket discretized to the round), and the admitted set
is ordered by the frozen total order

    (priority ASC, discovered_round ASC, url_hash ASC, canon_url ASC)

— ``priority``/``discovered_round`` mirror the heap key (created_at
becomes the round a URL entered the frontier, which is the batch
analog of enqueue time), and ``url_hash`` + the URL string make the
order total so no nondeterminism leaks in (the hash is never sole
identity — hash collisions fall back to the lexicographic URL order).  Rows beyond a host's budget are *deferred*:
they stay in the frontier for the next round.

Skew: a hot host owning 30%+ of the frontier would serialize a naive
``Window.partitionBy(host)`` into one straggler task.  Admission is
therefore two-phase:

  phase 1 (salted pre-rank): rank within ``(host, salt)`` where
      ``salt = pmod(url_hash, n_salts)`` — parallelism n_salts per hot
      host; keep the top ``budget`` of each salted group.  The per-host
      top-``budget`` rows are necessarily inside the union of per-salt
      top-``budget`` rows, so no admissible row is lost.
  phase 2 (exact re-rank): re-rank the ≤ n_salts×budget survivors per
      host and keep the true top ``budget``.  This group is tiny by
      construction, so the unsalted window is cheap.

Deferral must come from the *exact* decision: deferred = frontier minus
admitted (left_anti on url_hash+url), not phase-1 leftovers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# canon_url is the FINAL tie-break so the total order never rests on the
# 60-bit hash alone: two distinct URLs colliding at equal priority/round
# would otherwise make row_number nondeterministic (and diverge from the
# Python oracle, which breaks ties on the URL string).
ORDER_COLS = ("priority", "discovered_round", "url_hash", "canon_url")


def order_key():
    return [F.col(c).asc() for c in ORDER_COLS]


def admit_per_host(
    frontier: DataFrame,
    budget_col: str = "host_budget",
    n_salts: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (admitted, deferred) under per-host budgets.

    ``frontier`` must carry: canon_url, url_hash, host, priority,
    discovered_round, and ``budget_col`` (int, per-row constant per
    host).  Returns admitted rows with ``host_rank`` (1-based rank in
    the frozen order within host) and the deferred remainder.
    """
    salted = frontier.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(n_salts)))
    w1 = Window.partitionBy("host", "_salt").orderBy(*order_key())
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col(budget_col))
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order_key())
    admitted = (
        phase1.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.col(budget_col))
    )
    deferred = frontier.join(
        admitted.select("url_hash", "canon_url"),
        on=["url_hash", "canon_url"],
        how="left_anti",
    )
    return admitted, deferred


def global_fetch_order(admitted: DataFrame, seq_offset: int = 0) -> DataFrame:
    """Assign the global, deterministic fetch sequence within a round.

    The admitted set is bounded by Σ_host budget(host) — politeness
    caps it at (hosts × budget) rows per round regardless of frontier
    size — so a single-partition window here is NOT a scale hazard for
    budget-bounded rounds.  For bulk rounds (budget ≈ ∞, admitted in the
    millions) use :func:`global_fetch_order_scalable` instead.
    """
    w = Window.orderBy(*order_key())
    return admitted.withColumn(
        "fetch_seq", (F.row_number().over(w) + F.lit(seq_offset)).cast("long")
    )


def scalable_row_number(
    df: DataFrame,
    keys: list,
    out_col: str,
    offset: int = 0,
    partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """1-based global ``row_number`` by ``keys``, computed without a
    single-partition sort: range-partition on the key, sort within
    partitions, count per partition (one small job on the persisted
    set), then assign ``offset[pid] + local_index`` entirely JVM-side —
    ``monotonically_increasing_id`` encodes (partition id, local row
    index) as ``pid·2³³ + idx`` over the sorted partitions, and a
    literal map turns pid into its global offset.  The classic two-pass
    zipWithIndex with no Python round-trip of the rows.  The keys must
    be a total order (no ties) for a deterministic result — every
    caller closes with a unique id column.  The per-partition count
    collect is bounded by the shuffle width (≤ p rows), never
    row-scaled."""
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(p, *keys).sortWithinPartitions(*keys).persist()
    # the internal cache must be releasable by the caller (a crawl round
    # leaks one admitted-set-sized cache per round otherwise — CLAUDE.md
    # round-cache rule: drop all round caches together at round end)
    if cache_registry is not None:
        cache_registry.append(ranged)
    counts = {
        r["pid"]: r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets = {}
    acc = offset
    for pid in range(p):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    # literal pid → offset map (≤ p entries, p ~ shuffle width: tiny plan)
    off_map = F.create_map(
        *[F.lit(x) for pid in range(p) for x in (pid, offsets[pid])]
    )
    mid = F.monotonically_increasing_id()
    pid_expr = F.shiftrightunsigned(mid, 33).cast("int")
    local_expr = mid.bitwiseAND(F.lit((1 << 33) - 1))
    return ranged.withColumn(
        out_col,
        (off_map[pid_expr] + local_expr + F.lit(1)).cast("long"),
    )


def global_fetch_order_scalable(
    admitted: DataFrame,
    seq_offset: int = 0,
    partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Same total order as :func:`global_fetch_order`, computed without a
    single-partition sort — :func:`scalable_row_number` on the frozen
    order key.  Equality with the window version is asserted in
    tests/test_politeness.py."""
    return scalable_row_number(
        admitted,
        list(order_key()),
        "fetch_seq",
        offset=seq_offset,
        partitions=partitions,
        cache_registry=cache_registry,
    )
