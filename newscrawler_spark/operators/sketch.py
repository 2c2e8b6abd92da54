"""Deterministic cardinality sketches (HyperLogLog) — exact in any engine.

At 10^10-URL frontier scale, "how many distinct URLs / hosts / users"
is a sketch question, not a COUNT(DISTINCT) question: exact distinct
shuffles every key, an HLL register table is m integers per group and
merges with MAX.  Spark's built-in ``approx_count_distinct`` is an HLL
too, but its register layout is engine-private — useless for a
cross-engine gate and unmergeable outside Spark.  This one is frozen
arithmetic on the repo's 60-bit md5 hash contract
(functions/canonical.py:30, ``int(md5(key)[:15], 16)``), so DuckDB (or
anything else) replays it bit-exactly, and the register table itself is
a first-class mergeable artifact (MAX per register — the streaming /
multi-shard merge is a groupBy, the same property Flajolet's paper
sells).

Frozen spec (p = 8, m = 256 registers):

    h     = 60-bit md5 hash of the key string
    idx   = h % 256                      (register)
    w     = h // 256                     (52 remaining bits)
    rho   = tz(w | 2^52) + 1             (tz = trailing zeros via
                                          bit_count((x & -x) - 1);
                                          the OR caps rho at 53)
    R_j   = max rho per (group, idx)
    V     = 256 - #set registers         (empties)
    S     = sum(2^(30 - least(R_j, 30))) + V * 2^30     (scaled by 2^30
            so the harmonic sum is EXACT int64 — never a double sum)
    est   = (7182 * 256 * 256 * 2^30) div (10000 * S)   (alpha_256 =
            0.7182 as the rational 7182/10000; raw HLL estimate, no
            small/large-range correction — corrections need ln(), whose
            last-ulp varies across engines; the clamp at rho 30 and the
            missing linear-counting branch are part of the frozen spec,
            identical everywhere)

Reference parity: the reference counts distincts exactly in SQL
(src/api/routers/stats.py GROUP BY counts); this is the scale path for
the same questions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8
HLL_M = 1 << HLL_P  # 256
_ALPHA_NUM = 7182  # alpha_256 ≈ 0.7213/(1 + 1.079/256), 4 decimals
_ALPHA_DEN = 10_000
_RHO_CAP = 30  # keeps 2^(cap) * m and the alpha numerator inside int64


def _hash60(key: Column) -> Column:
    """The repo-wide frozen 60-bit hash (canonical.py contract)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hll_registers(df: DataFrame, key: str, group: str) -> DataFrame:
    """(group, register, rho) — max trailing-zero rank per register.

    One groupBy on (group, register): the shuffle carries at most
    m rows per group whatever the input size, and two register tables
    merge with the same MAX — the mergeability that makes the sketch
    usable across shards / days / streaming micro-batches.
    """
    # hash once per row (Catalyst does NOT CSE duplicate md5 trees in
    # one Project — CLAUDE.md), then pure bit arithmetic on the column
    staged = df.select(
        F.col(group).alias("grp"), _hash60(F.col(key).cast("string")).alias("h60")
    ).select(
        "grp",
        (F.col("h60") % F.lit(HLL_M)).cast("int").alias("register"),
        F.expr(f"(h60 div {HLL_M}) | {1 << 52}").alias("x"),
    )
    # rho = trailing zeros of x, +1, via bit_count((x & -x) - 1)
    rho = (
        F.bit_count(F.col("x").bitwiseAND(-F.col("x")) - F.lit(1)) + F.lit(1)
    ).cast("int")
    return (
        staged.select("grp", "register", rho.alias("rho"))
        .groupBy("grp", "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(df: DataFrame, key: str, group: str) -> DataFrame:
    """(grp, registers_set, s_scaled, hll_est) — integer-exact estimate.

    ``s_scaled`` is the harmonic denominator scaled by 2^30 (empty
    registers contribute 2^30 each), so the whole estimator is int64
    arithmetic — the gate hashes it bit-exactly against any engine.
    """
    regs = hll_registers(df, key, group)
    num = _ALPHA_NUM * HLL_M * HLL_M * (1 << _RHO_CAP)
    return (
        regs.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("int").alias("registers_set"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {_RHO_CAP} - least(rho, {_RHO_CAP}))"
                )
            ).alias("s_set"),
        )
        .select(
            "grp",
            "registers_set",
            (
                F.col("s_set")
                + (F.lit(HLL_M) - F.col("registers_set")).cast("long")
                * F.lit(1 << _RHO_CAP)
            ).cast("bigint").alias("s_scaled"),
        )
        .select(
            "grp",
            "registers_set",
            "s_scaled",
            F.expr(f"CAST({num} div ({_ALPHA_DEN} * s_scaled) AS BIGINT)").alias(
                "hll_est"
            ),
        )
    )


def hll_sql(table_expr: str, key_sql: str, group_sql: str) -> str:
    """DuckDB twin of :func:`hll_estimate` — same frozen arithmetic."""
    num = _ALPHA_NUM * HLL_M * HLL_M * (1 << _RHO_CAP)
    return f"""
WITH h AS (
  SELECT {group_sql} AS grp,
         CAST(('0x' || substring(md5(CAST({key_sql} AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
  FROM {table_expr}
),
b AS (
  SELECT grp, CAST(h60 % {HLL_M} AS INT) AS register,
         ((h60 // {HLL_M}) | {1 << 52}) AS x
  FROM h
),
regs AS (
  SELECT grp, register,
         MAX(CAST(bit_count(CAST((x & -x) - 1 AS BIGINT)) + 1 AS INT)) AS rho
  FROM b GROUP BY grp, register
),
agg AS (
  SELECT grp, CAST(count(*) AS INT) AS registers_set,
         CAST(sum(CAST(1 AS BIGINT) << ({_RHO_CAP} - least(rho, {_RHO_CAP})))
              + ({HLL_M} - count(*)) * {1 << _RHO_CAP} AS BIGINT) AS s_scaled
  FROM regs GROUP BY grp
)
SELECT grp, registers_set, s_scaled,
       CAST({num} // ({_ALPHA_DEN} * s_scaled) AS BIGINT) AS hll_est
FROM agg
"""


# --- count-min sketch ----------------------------------------------------

CM_D = 4  # hash rows
CM_W = 512  # counters per row


def _cm_col(key: Column, row: int) -> Column:
    """Counter index for one salted hash row: 60-bit md5 of 'row:key',
    mod w.  Salting with the row index gives d independent hashes from
    the single frozen hash contract."""
    return (
        _hash60(F.concat(F.lit(f"{row}:"), key)) % F.lit(CM_W)
    ).cast("int")


def cm_sketch(df: DataFrame, key: str) -> DataFrame:
    """(row, col, n) count-min table — d×w integer counters.

    The sketch is ONE map-side-combined groupBy over d·w ≤ 2048 cells
    regardless of key cardinality (heavy-hitter frequency at 10^10
    distinct URLs where an exact per-key groupBy shuffles every key),
    and two sketches merge by cell-wise SUM — the same shard/stream
    mergeability as the HLL register table.
    """
    k = F.col(key).cast("string")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cm_col(k, r).alias("col")
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.row", "cell.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def cm_query(df: DataFrame, key: str, probes: DataFrame, probe_key: str) -> DataFrame:
    """Estimated frequency of each probe key: min over the d counters.

    Returns (key, cm_est).  The estimate never undercounts
    (cm_est >= true count) and overcounts by at most 2·N/w with
    probability 1 - 2^-d (Cormode & Muthukrishnan 2005).  The probe
    side is a broadcast of the sketch (≤ d·w rows) into the probes —
    no shuffle of the big relation at query time.
    """
    sk = cm_sketch(df, key)
    k = F.col(probe_key).cast("string")
    probed = probes.select(
        F.col(probe_key).alias("key"),
        *[_cm_col(k, r).alias(f"c{r}") for r in range(CM_D)],
    )
    est = probed
    for r in range(CM_D):
        row_r = sk.filter(F.col("row") == r).select(
            F.col("col").alias(f"c{r}"), F.col("n").alias(f"n{r}")
        )
        est = est.join(F.broadcast(row_r), f"c{r}", "left")
    return est.select(
        "key",
        F.least(
            *[F.coalesce(F.col(f"n{r}"), F.lit(0)) for r in range(CM_D)]
        ).alias("cm_est"),
    )


def cm_sql(table_expr: str, key_sql: str, probe_table: str, probe_key_sql: str) -> str:
    """DuckDB twin of sketch + probe: same salted hashes, same min."""
    def col_expr(key: str, r: int) -> str:
        return (
            f"CAST(CAST(('0x' || substring(md5('{r}:' || CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
            f" % {CM_W} AS INT)"
        )

    rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {col_expr(key_sql, r)} AS col FROM {table_expr}"
        for r in range(CM_D)
    )
    joins = "\n".join(
        f"LEFT JOIN (SELECT col, n FROM sk WHERE row = {r}) s{r} ON p.c{r} = s{r}.col"
        for r in range(CM_D)
    )
    least = ", ".join(f"COALESCE(s{r}.n, 0)" for r in range(CM_D))
    probe_cols = ", ".join(
        f"{col_expr(probe_key_sql, r)} AS c{r}" for r in range(CM_D)
    )
    return f"""
WITH cells AS ({rows}),
sk AS (SELECT row, col, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY row, col),
p AS (SELECT {probe_key_sql} AS key, {probe_cols} FROM {probe_table})
SELECT p.key, LEAST({least}) AS cm_est
FROM p
{joins}
"""


# --- bloom filter (SQL-expressible kernel) --------------------------------

BLOOM_M = 4096  # bits
BLOOM_K = 4  # probes
_BLOOM_WORD = 32  # bits per word: keeps 1 << bit positive in any int64 engine
_H2_MASK = (1 << 50) - 1  # bounds h1 + i*h2 well inside int64


def _bloom_probe(key: Column, i: int) -> Column:
    """Probe bit position i via Kirsch-Mitzenmacher double hashing on
    two salt-separated frozen-md5 hashes: p_i = (h1 + i*h2) % m, h2
    odd.  The production seen-set bloom (operators/seen.py NumpyBloom)
    uses the same construction with a uint64 multiplicative mix; this
    kernel derives h2 from a second salted md5 instead so every step
    stays inside signed-int64 SQL (uint64 wraparound is an error, not a
    wrap, in ANSI engines)."""
    h1 = _hash60(F.concat(F.lit("b1:"), key))
    h2 = _hash60(F.concat(F.lit("b2:"), key)).bitwiseAND(F.lit(_H2_MASK)).bitwiseOR(
        F.lit(1)
    )
    return ((h1 + F.lit(i) * h2) % F.lit(BLOOM_M)).cast("int")


def bloom_build(df: DataFrame, key: str) -> DataFrame:
    """(word, bits) — the bloom bitset as a ≤ m/32-row word table.

    bit_or is a map-side-combinable aggregate, so the build is one
    shuffle of at most m/32 rows per partition whatever the input size,
    and two blooms merge with the same bit_or — the partitioned
    seen-bloom design (SURVEY §7.3) with the bitset living in a
    DataFrame instead of a numpy blob."""
    k = F.col(key).cast("string")
    pos = df.select(
        F.explode(F.array(*[_bloom_probe(k, i) for i in range(BLOOM_K)])).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / F.lit(_BLOOM_WORD)).cast("int").alias("word"),
            (F.col("p") % F.lit(_BLOOM_WORD)).alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits")
        )
    )


def bloom_probe(bloom: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """(key, maybe) — membership test: all k probe bits set.

    The word table broadcasts (≤ m/32 rows); the probe side never
    shuffles — the exact shape of the crawler's bloom prefilter in
    front of the exact seen anti-join."""
    k = F.col(key).cast("string")
    est = probes.select(
        F.col(key).alias("key"),
        *[
            (_bloom_probe(k, i) / F.lit(_BLOOM_WORD)).cast("int").alias(f"w{i}")
            for i in range(BLOOM_K)
        ],
        *[
            (_bloom_probe(k, i) % F.lit(_BLOOM_WORD)).alias(f"b{i}")
            for i in range(BLOOM_K)
        ],
    )
    cond = F.lit(True)
    for i in range(BLOOM_K):
        wt = bloom.select(F.col("word").alias(f"w{i}"), F.col("bits").alias(f"v{i}"))
        est = est.join(F.broadcast(wt), f"w{i}", "left")
        cond = cond & (
            F.expr(f"(coalesce(v{i}, CAST(0 AS BIGINT)) >> b{i}) & 1") == 1
        )
    return est.select("key", cond.alias("maybe"))


def bloom_sql(table_expr: str, key_sql: str, probe_table: str, probe_key_sql: str) -> str:
    """DuckDB twin of build + probe — same salted hashes, same words."""
    def h(key: str, salt: str) -> str:
        return (
            f"CAST(('0x' || substring(md5('{salt}:' || CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
        )

    def probe(key: str, i: int) -> str:
        return (
            f"(({h(key, 'b1')} + {i} * (({h(key, 'b2')} & {_H2_MASK}) | 1)) % {BLOOM_M})"
        )

    pos_rows = " UNION ALL ".join(
        f"SELECT {probe(key_sql, i)} AS p FROM {table_expr}" for i in range(BLOOM_K)
    )
    probe_cols = ", ".join(
        f"CAST({probe(probe_key_sql, i)} // {_BLOOM_WORD} AS INT) AS w{i}, "
        f"CAST({probe(probe_key_sql, i)} % {_BLOOM_WORD} AS INT) AS b{i}"
        for i in range(BLOOM_K)
    )
    joins = "\n".join(
        f"LEFT JOIN bloom s{i} ON p.w{i} = s{i}.word" for i in range(BLOOM_K)
    )
    cond = " AND ".join(
        f"((COALESCE(s{i}.bits, CAST(0 AS BIGINT)) >> b{i}) & 1) = 1"
        for i in range(BLOOM_K)
    )
    return f"""
WITH pos AS ({pos_rows}),
bloom AS (
  SELECT CAST(p // {_BLOOM_WORD} AS INT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % {_BLOOM_WORD} AS INT)) AS bits
  FROM pos GROUP BY 1
),
p AS (SELECT {probe_key_sql} AS key, {probe_cols} FROM {probe_table})
SELECT p.key, ({cond}) AS maybe
FROM p
{joins}
"""


def hdr_bucket_lb(v: Column, sub_bits: int = 4) -> Column:
    """HDR-histogram bucket lower bound of a non-negative BIGINT: zero
    all but the top ``sub_bits``+1 significant bits — ``(v >> s) << s``
    with ``s = max(bit_length(v) - 1 - sub_bits, 0)``.  bit_length
    comes from ``length(bin(v))`` (a string op, identical in Spark and
    DuckDB — no float log2, whose boundary values differ in the last
    ulp between engines).  Relative bucket width ≤ 2^-sub_bits, so any
    quantile read off the histogram has ≤ 1/16 relative error at
    sub_bits=4 — the HdrHistogram guarantee."""
    e = F.length(F.bin(v)) - 1
    s = F.greatest(e - sub_bits, F.lit(0))
    # F.shiftright/shiftleft take only literal ints in the Python API;
    # the SQL functions accept a column shift amount
    return F.call_function("shiftleft", F.call_function("shiftright", v, s), s)


def hdr_histogram(df: DataFrame, value: Column) -> DataFrame:
    """Mergeable integer histogram: ``(lb, cnt)`` per occupied HDR
    bucket.  One map-side-combined shuffle of ≤ bucket-count rows
    (64 · 16 possible buckets over the full int64 range), O(buckets)
    memory per partition — the percentile shape that actually scales:
    exact per-key percentiles need a per-key SORT of the data
    (a4_percentiles documents that trade), approx_percentile/t-digest
    are engine-specific float sketches that can't be hash-gated.
    Merging shards/windows = summing counts."""
    return (
        df.select(hdr_bucket_lb(value).alias("lb"))
        .groupBy("lb")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hdr_quantiles(df: DataFrame, value: Column, pcts: list[int]) -> DataFrame:
    """Percentile-disc read off the HDR histogram: for each pct the
    smallest bucket lower bound whose cumulative count crosses
    pct·n/100.  The CDF window runs over the HISTOGRAM (≤ ~10³ rows at
    any data size), never the data.  Output ``(pct, est, n_rows)``."""
    from pyspark.sql import Window

    h = hdr_histogram(df, value)
    w = Window.orderBy("lb").rowsBetween(Window.unboundedPreceding, 0)
    cdf = h.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    # one plan for all pcts (per-pct branches would each re-scan the
    # data — Catalyst CSEs neither exchanges nor aggregate subtrees)
    fanned = cdf.withColumn(
        "pct", F.explode(F.array(*[F.lit(int(p)) for p in pcts]))
    )
    return (
        fanned.where(100 * F.col("cum") >= F.col("pct") * F.col("n"))
        .groupBy(F.col("pct").cast("long").alias("pct"))
        .agg(
            F.min("lb").cast("long").alias("est"),
            F.max("n").cast("long").alias("n_rows"),
        )
    )
