"""Exact Lloyd's k-means (operators/cluster.py)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from newscrawler_spark.operators.cluster import QUANT, kmeans_lloyd


def _pure_python_kmeans(vecs: dict[int, list[float]], k: int, iterations: int):
    """Independent third implementation of the pinned spec."""

    def quant(v):
        return [math.floor(float(x) * QUANT + 0.5) for x in v]

    q = {i: quant(v) for i, v in vecs.items()}
    cents = {}
    for i in sorted(q):
        cents.setdefault(i % k, q[i])

    def assign(cs):
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
                for cid, c in sorted(cs.items())
            )
            out[i] = best
        return out

    for _ in range(iterations):
        a = assign(cents)
        new = {}
        for cid in cents:
            members = [q[i] for i, (_, c) in a.items() if c == cid]
            if not members:
                new[cid] = cents[cid]  # pinned empty-cluster rule
                continue
            n = len(members)
            new[cid] = [
                math.floor(sum(col) / n + 0.5) for col in zip(*members)
            ]
        cents = new
    return {i: (c, d) for i, (d, c) in assign(cents).items()}


def test_kmeans_matches_pure_python(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {r["vec_id"]: (r["cid"], r["d2"]) for r in kmeans_lloyd(emb).collect()}
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    assert got == _pure_python_kmeans(vecs, k=8, iterations=3)
    assert len({c for c, _ in got.values()}) > 1  # actually partitions the data


def test_kmeans_separated_clusters_and_ties(spark):
    # two tight blobs around (0,0) and (10,10); k=2 stride init puts
    # one seed in each blob by construction (ids alternate blobs)
    rows = [
        Row(vec_id=i, embedding=[float(10 * (i % 2)) + 0.01 * i, float(10 * (i % 2))])
        for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cid"] for r in kmeans_lloyd(emb, k=2, iterations=3).collect()}
    assert {got[i] for i in range(0, 20, 2)} == {0}
    assert {got[i] for i in range(1, 20, 2)} == {1}


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over 3 identical points: after one step every point lands in
    # cid 0 (smallest-cid tie), clusters 1 and 2 empty out — the run
    # must not error and must keep returning a full assignment
    rows = [Row(vec_id=i, embedding=[1.0, 1.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans_lloyd(emb, k=3, iterations=2).collect()
    assert {r["cid"] for r in got} == {0} and all(r["d2"] == 0 for r in got)
