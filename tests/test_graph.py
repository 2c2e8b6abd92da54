"""Connected components over near-dup pair graphs (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from newscrawler_spark.operators.graph import connected_components


def _cc(spark, pairs, nodes=None):
    edges = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs], "doc_a long, doc_b long"
    )
    n = None
    if nodes is not None:
        n = spark.createDataFrame([Row(id=i) for i in nodes], "id long")
    out = connected_components(edges, nodes=n)
    return {r["id"]: r["comp"] for r in out.collect()}


def test_cc_chain_transitivity(spark):
    # 0-1, 1-2, 2-3: a pure chain — (0,3) never appears as a pair
    assert _cc(spark, [(0, 1), (1, 2), (2, 3)]) == {0: 0, 1: 0, 2: 0, 3: 0}


def test_cc_two_components_and_isolated(spark):
    got = _cc(spark, [(1, 2), (5, 6), (6, 7)], nodes=[1, 2, 3, 5, 6, 7])
    assert got == {1: 1, 2: 1, 3: 3, 5: 5, 6: 5, 7: 5}


def test_cc_long_path_converges_in_log_rounds(spark):
    # a 33-node path stresses pointer jumping: plain propagation needs
    # 32 rounds, jumping needs ~log2(32)+2 — max_iter=8 must suffice
    pairs = [(i, i + 1) for i in range(32)]
    got = _cc_with_cap(spark, pairs, 8)
    assert set(got.values()) == {0}


def _cc_with_cap(spark, pairs, cap):
    edges = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs], "doc_a long, doc_b long"
    )
    out = connected_components(edges, max_iter=cap)
    return {r["id"]: r["comp"] for r in out.collect()}


def test_cc_raises_without_fixpoint_budget(spark):
    pairs = [(i, i + 1) for i in range(32)]
    with pytest.raises(RuntimeError):
        _cc_with_cap(spark, pairs, 2)
