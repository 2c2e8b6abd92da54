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
