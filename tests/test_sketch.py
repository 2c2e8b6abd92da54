"""Deterministic HLL sketch (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from newscrawler_spark.operators.sketch import HLL_M, hll_estimate, hll_registers


def _rows(n, grp, offset=0):
    return [Row(k=f"key-{offset + i}", g=grp) for i in range(n)]


def test_hll_estimate_within_expected_error(spark):
    # m=256 -> stderr ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma plus the
    # raw-estimator bias at low fill (no linear-counting branch)
    for n in (500, 2000, 8000):
        df = spark.createDataFrame(_rows(n, "g"), "k string, g string")
        est = hll_estimate(df, "k", "g").collect()[0]["hll_est"]
        assert abs(est - n) / n < 0.25, (n, est)


def test_hll_duplicates_do_not_move_the_estimate(spark):
    base = _rows(3000, "g")
    df1 = spark.createDataFrame(base, "k string, g string")
    df3 = spark.createDataFrame(base * 3, "k string, g string")
    e1 = hll_estimate(df1, "k", "g").collect()[0]["hll_est"]
    e3 = hll_estimate(df3, "k", "g").collect()[0]["hll_est"]
    assert e1 == e3


def test_hll_registers_merge_with_max(spark):
    # sketch(A ∪ B) == max-merge(sketch(A), sketch(B)) per register —
    # the property that makes the register table a shardable artifact
    a = spark.createDataFrame(_rows(1500, "g"), "k string, g string")
    b = spark.createDataFrame(_rows(1500, "g", offset=1000), "k string, g string")
    union = a.unionByName(b)
    direct = {
        (r["register"],): r["rho"] for r in hll_registers(union, "k", "g").collect()
    }
    merged = {
        (r["register"],): r["rho"]
        for r in (
            hll_registers(a, "k", "g")
            .unionByName(hll_registers(b, "k", "g"))
            .groupBy("grp", "register")
            .agg(F.max("rho").alias("rho"))
            .collect()
        )
    }
    assert direct == merged
    assert len(direct) <= HLL_M


def test_hll_groups_are_independent(spark):
    df = spark.createDataFrame(
        _rows(2000, "a") + _rows(100, "b"), "k string, g string"
    )
    got = {r["grp"]: r["hll_est"] for r in hll_estimate(df, "k", "g").collect()}
    only_a = spark.createDataFrame(_rows(2000, "a"), "k string, g string")
    assert got["a"] == hll_estimate(only_a, "k", "g").collect()[0]["hll_est"]
    assert got["b"] < got["a"]


# --- count-min -----------------------------------------------------------


def test_cm_never_undercounts_and_is_tight_on_heavy_keys(spark):
    from newscrawler_spark.operators.sketch import CM_W, cm_query

    # 20 heavy keys (100 each) + 2000 singleton keys of noise
    rows = [Row(k=f"hot-{i % 20}") for i in range(2000)] + [
        Row(k=f"cold-{i}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string")
    probes = spark.createDataFrame([Row(k=f"hot-{i}") for i in range(20)], "k string")
    got = {r["key"]: r["cm_est"] for r in cm_query(df, "k", probes, "k").collect()}
    n_total = len(rows)
    for i in range(20):
        est = got[f"hot-{i}"]
        assert est >= 100  # the one-sided guarantee
        assert est <= 100 + 2 * n_total // CM_W + 64, (i, est)


def test_cm_sketch_merges_by_cellwise_sum(spark):
    from newscrawler_spark.operators.sketch import cm_sketch

    a = spark.createDataFrame([Row(k=f"x-{i % 7}") for i in range(300)], "k string")
    b = spark.createDataFrame([Row(k=f"y-{i % 5}") for i in range(200)], "k string")
    direct = {
        (r["row"], r["col"]): r["n"] for r in cm_sketch(a.unionByName(b), "k").collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cm_sketch(part, "k").collect():
            merged[(r["row"], r["col"])] = merged.get((r["row"], r["col"]), 0) + r["n"]
    assert direct == merged


# --- bloom kernel ----------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp(spark):
    from newscrawler_spark.operators.sketch import BLOOM_M, bloom_build, bloom_probe

    members = spark.createDataFrame([Row(k=f"m-{i}") for i in range(300)], "k string")
    others = spark.createDataFrame([Row(k=f"o-{i}") for i in range(1000)], "k string")
    bloom = bloom_build(members, "k")
    hit = {r["key"]: r["maybe"] for r in bloom_probe(bloom, members, "k").collect()}
    assert all(hit.values())  # no false negatives, ever
    fp = [r["maybe"] for r in bloom_probe(bloom, others, "k").collect()]
    # 300 keys * 4 probes into 4096 bits -> fill ~25%, fp ~ 0.25^4 ≈ 0.4%
    assert sum(fp) / len(fp) < 0.05
    assert bloom.count() <= BLOOM_M // 32


def test_bloom_merges_by_bit_or(spark):
    from newscrawler_spark.operators.sketch import bloom_build

    a = spark.createDataFrame([Row(k=f"a-{i}") for i in range(100)], "k string")
    b = spark.createDataFrame([Row(k=f"b-{i}") for i in range(100)], "k string")
    direct = {r["word"]: r["bits"] for r in bloom_build(a.unionByName(b), "k").collect()}
    merged: dict = {}
    for part in (a, b):
        for r in bloom_build(part, "k").collect():
            merged[r["word"]] = merged.get(r["word"], 0) | r["bits"]
    assert direct == merged


def test_hdr_quantiles_error_bound_and_mergeability(spark, sf_dir):
    """HDR estimates are within the 1/16 relative-error bound of the
    exact percentile-disc values, and the histogram of a union equals
    the summed histograms of the parts (mergeability)."""
    import os

    from pyspark.sql import functions as F

    from newscrawler_spark.operators.sketch import (
        hdr_histogram,
        hdr_quantiles,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cents_expr = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    cents = F.expr(cents_expr)

    got = {r["pct"]: r["est"] for r in hdr_quantiles(ev, cents, [50, 90, 99]).collect()}
    vals = sorted(r["c"] for r in ev.selectExpr(f"{cents_expr} AS c").collect())
    n = len(vals)
    for pct, est in got.items():
        exact = next(v for i, v in enumerate(vals, 1) if 100 * i >= pct * n)
        assert est <= exact  # bucket lower bound never overshoots
        assert exact <= est + max(est // 16, 1) + 1  # within one bucket width

    # mergeability: histogram(a ∪ b) == histogram(a) + histogram(b)
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = {r["lb"]: r["cnt"] for r in hdr_histogram(ev, cents).collect()}
    ha = {r["lb"]: r["cnt"] for r in hdr_histogram(a, cents).collect()}
    hb = {r["lb"]: r["cnt"] for r in hdr_histogram(b, cents).collect()}
    merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    assert merged == whole
