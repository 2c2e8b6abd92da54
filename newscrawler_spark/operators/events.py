"""Event-stream operators: sessionization and as-of (last-known-state)
joins.

The reference logs crawl/scrape events with timestamps
(``/root/reference/src/utils/metrics.py``, the crawl_logs lineage) but
has no read-path over them beyond counters; gap sessionization and
as-of joins are the two standard time-keyed operators an analytics
engine adds over such a stream (both are SQL-92-expressible only
painfully; DuckDB grew a native ASOF JOIN and Flink/Kafka-Streams ship
session windows as primitives).

Spark-first shapes:

* ``sessionize`` — the classic gaps-and-islands plan: one shuffle
  hash-partitioned on the session key, a per-key window computing the
  lag-gap break flag and its running sum (the session index), then a
  rollup that reuses the window's partitioning (no second exchange on
  the key).  Per-key window sorts are the unit a session assignment
  inherently needs; keys are users, so cardinality is high and skew is
  bounded by per-user activity.

* ``asof_join`` — the union-tag plan, NOT a range join: tag state rows
  0 and event rows 1, union, and take ``last(state, ignorenulls)``
  over a per-key window ordered by (time, tag) with rows unbounded
  preceding.  One shuffle on the key, zero row expansion — the
  band-join form (events × states with a BETWEEN predicate) explodes
  quadratically per key and is never the right plan.  Ties at equal
  time resolve state-before-event (tag order), i.e. an event sees a
  state written at its own timestamp — exactly DuckDB's
  ``ASOF JOIN ... ON l.t >= r.t`` semantics, which the oracle uses.

All window arithmetic is exact integer microseconds
(``unix_micros`` ↔ DuckDB ``epoch_us`` — the T4 lesson: epoch-seconds
forms silently truncate sub-second timestamps in Spark only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _us(ts_col: str = "ts"):
    # ts is TIMESTAMP_NTZ in the parquet; the cast is shift-free under
    # the session's pinned UTC zone (session.py)
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Gap sessionization: a new session starts when the time since the
    key's previous event exceeds `gap_us`.  Output one row per session:
    (key, session_idx 1-based, n_events, start_ts, end_ts, duration_us,
    n_errors)."""
    w = Window.partitionBy(key).orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    e = events.select(
        key, "event_id", "event_type", _us(ts_col).alias("us")
    ).withColumn("prev", F.lag("us").over(w))
    brk = F.when(
        F.col("prev").isNull() | (F.col("us") - F.col("prev") > gap_us), 1
    ).otherwise(0)
    s = e.withColumn("sid", F.sum(brk).over(run))
    return s.groupBy(key, "sid").agg(
        F.count("*").cast("long").alias("n_events"),
        F.timestamp_micros(F.min("us")).alias("start_ts"),
        F.timestamp_micros(F.max("us")).alias("end_ts"),
        (F.max("us") - F.min("us")).cast("long").alias("duration_us"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    ).withColumnRenamed("sid", "session_idx")


def asof_join(
    events: DataFrame,
    states: DataFrame,
    key: str = "user_id",
    time_col: str = "us",
    state_cols: tuple[str, ...] = ("state_event_id",),
) -> DataFrame:
    """Left as-of join: attach to every event row the `state_cols` of
    the key's latest state row with state.time <= event.time (NULL when
    none).  `events` and `states` must both carry `key` and an integer
    `time_col`; `states` must be unique per (key, time) — ties there
    are the caller's tie-break to resolve.
    """
    ev = events.withColumn("_tag", F.lit(1))
    for c in state_cols:
        ev = ev.withColumn(c, F.lit(None).cast(states.schema[c].dataType))
    st = states.select(
        key, time_col, F.lit(0).alias("_tag"), *state_cols
    )
    for c in ev.columns:
        if c not in st.columns:
            st = st.withColumn(c, F.lit(None).cast(ev.schema[c].dataType))
    u = ev.unionByName(st.select(ev.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(time_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in state_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("_tag") == 1).drop("_tag")


def last_error_asof(events: DataFrame) -> DataFrame:
    """The concrete read-path over the events table: every non-error
    event annotated with the user's most recent error event at or
    before it — (event_id, user_id, event_type, state_event_id,
    age_us), NULLs when the user has no prior error."""
    base = events.select("event_id", "user_id", "event_type", _us().alias("us"))
    errors = (
        base.where(F.col("event_type") == "error")
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("state_event_id"))
        .withColumn("state_us", F.col("us"))
    )
    ev = base.where(F.col("event_type") != "error")
    joined = asof_join(
        ev, errors, state_cols=("state_event_id", "state_us")
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        "state_event_id",
        (F.col("us") - F.col("state_us")).cast("long").alias("age_us"),
    )


#: frozen funnel step sequence over the synthetic event stream.
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
) -> DataFrame:
    """Ordered funnel per user — the product-analytics primitive
    (Amplitude/Mixpanel-style): step i is the EARLIEST event of type
    ``steps[i]`` strictly after the user's step i-1 (step 0 = earliest
    occurrence overall).  Output one row per user who completed step 0:
    ``(user_id, t1_us, t2_us, …)`` with integer-microsecond times and
    NULL from the first uncompleted step on.

    Spark-first shape: the steps chain as `len(steps)` window selects
    over the SAME ``partitionBy(user)`` — Catalyst reuses the exchange
    and sorts once per frame (subset rule, PLANS.md sessionize lesson),
    so the whole funnel costs ONE user-keyed shuffle regardless of step
    count.  No join-back per step (the agg-and-join-back shape plans a
    scan per step — the documented anti-pattern), no row expansion.

    Strictly-after semantics (``us > prev``) are pinned identically in
    the SQL twin; integer microseconds avoid the double-seconds
    truncation divergence (the T4 lesson).
    """
    w = Window.partitionBy(user_col)
    d = events.select(
        F.col(user_col).alias("user_id"),
        F.col("event_type"),
        _us().alias("us"),
    )
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("us") > F.col(prev))
        d = d.withColumn(f"t{i}_us", F.min(F.when(cond, F.col("us"))).over(w))
        prev = f"t{i}_us"
    return (
        d.select("user_id", *[f"t{i}_us" for i in range(1, len(steps) + 1)])
        .where(F.col("t1_us").isNotNull())
        .distinct()
    )


#: integer day index: microseconds div one day (exact, UTC-pinned).
_DAY_US = 86_400_000_000


def retention_cohorts(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Cohort retention matrix — the product-analytics companion of
    :func:`funnel`: users grouped by the day of their FIRST event
    (cohort), counted distinct on each later activity day, keyed by the
    day offset.  Output ``(cohort_day, day_offset, n_users)`` with
    integer epoch-day indexes (``epoch_us div 86400e6`` — exact in any
    engine; date types and their timezone edges never enter the
    contract).

    Plan: the cohort day is a min window over the SAME user partition
    the distinct-count aggregate then groups under — Spark's two-stage
    distinct rewrite keys its first aggregate on (cohort, offset, user),
    a superset of the window's user partitioning, so the matrix costs
    the user shuffle plus one aggregate-sized exchange; nothing is
    joined back.
    """
    w = Window.partitionBy(user_col)
    d = events.select(
        F.col(user_col).alias("user_id"), _us().alias("us")
    ).select(
        "user_id", F.expr(f"us div {_DAY_US}").cast("long").alias("day")
    )
    d = d.withColumn("cohort", F.min("day").over(w))
    return (
        d.groupBy(
            F.col("cohort").alias("cohort_day"),
            (F.col("day") - F.col("cohort")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )
