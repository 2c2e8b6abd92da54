"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exactness baseline (J6/W4 analog of the
reference's pgvector ``<=>`` search, ``src/api/routers/search.py:
159-218``), plus a random-hyperplane LSH-bucketed ANN as the scale
path.

Scale design:
  * the query vector is a broadcast literal — top-k is one scan +
    ``TakeOrderedAndProject``, no shuffle of the embedding table;
  * dot products run in a single codegen'd ``aggregate`` higher-order
    expression over the array (JVM-side, no Python);
  * the LSH path buckets vectors by sign-pattern against H deterministic
    hyperplanes (md5-seeded, reproducible anywhere), so queries touch
    only their bucket — the brute-force oracle bounds its recall in
    tests;
  * exact near-dup pairs use norm-band blocking: |cos| ≥ t forces the
    norm ratio into a band only when vectors are normalized — for raw
    vectors we block on the LSH key and verify, keeping shuffles
    key-sized.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(vec_col: str, qlit: str) -> str:
    """SQL expr: Σ vec[i]*q[i] in double, sequential left fold."""
    return (
        f"aggregate(zip_with({vec_col}, {qlit}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm_expr(vec_col: str) -> str:
    return (
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * cast(x as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v))"
    )


def _array_lit(q: list[float]) -> str:
    return "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in q) + ")"


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: scan + codegen'd dot product + TakeOrdered.

    Similarity is rounded to 4dp and tie-broken on id so the result is
    a deterministic set, comparable across engines.
    """
    qlit = _array_lit(query)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    sim = F.expr(_dot_expr(vec_col, qlit)) / (F.expr(_norm_expr(vec_col)) * F.lit(qnorm))
    return (
        embeddings.select(F.col(id_col), F.round(sim, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# --- LSH-bucketed ANN (scale path) ---------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 bytes — no RNG
    state, reproducible in any language/engine."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            for i in range(0, 16, 2):
                v = int.from_bytes(h[i : i + 2], "big")
                vals.append((v / 65535.0) * 2.0 - 1.0)
            ctr += 1
        out[p] = vals[:dim]
    return out


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """mapInPandas body computing the sign-pattern bucket (int) for each
    embedding row — one numpy matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    def body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(mat) == 0:
                pdf["bucket"] = pd.Series([], dtype="int64")
                yield pdf
                continue
            signs = (mat @ planes.T) > 0
            bucket = np.zeros(len(mat), dtype=np.int64)
            for p in range(n_planes):
                bucket |= signs[:, p].astype(np.int64) << p
            pdf = pdf.copy()
            pdf["bucket"] = bucket
            yield pdf

    return body


def multi_table_bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """mapInPandas body emitting (row ⊗ table) with the row's bucket in
    each of the L independent hash tables — the standard multi-table
    LSH layout (tables OR-ed at query time to trade space for recall)."""
    all_planes = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    def body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            frames = []
            for t, planes in enumerate(all_planes):
                out = pdf.copy()
                out["table_id"] = t
                if len(mat):
                    signs = (mat @ planes.T) > 0
                    bucket = np.zeros(len(mat), dtype=np.int64)
                    for p in range(n_planes):
                        bucket |= signs[:, p].astype(np.int64) << p
                    out["bucket"] = bucket
                else:
                    out["bucket"] = pd.Series([], dtype="int64")
                frames.append(out)
            yield pd.concat(frames)

    return body


def ann_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via multi-table random-hyperplane LSH: a row is a
    candidate if it shares the query's bucket in ANY of the L tables;
    candidates are ranked exactly.

    At scale the table is written pre-bucketed (L× storage, partitioned
    by (table_id, bucket)); a query reads ~L·n/2^planes rows instead of
    n.  Recall follows 1-(1-p^planes)^L with p = 1-θ/π, so L buys
    recall without touching latency-critical bucket size — the recall
    floor is asserted against brute force in tests, not assumed.
    """
    from pyspark.sql import types as T

    dim = len(query)
    q = np.array(query, dtype=np.float64)
    probes = []  # (table_id, bucket) the query lands in
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        b = 0
        for p in range(n_planes):
            if float(q @ planes[p]) > 0:
                b |= 1 << p
        probes.append((t, b))

    schema = T.StructType(
        list(embeddings.schema.fields)
        + [T.StructField("table_id", T.IntegerType()), T.StructField("bucket", T.LongType())]
    )
    bucketed = embeddings.mapInPandas(
        multi_table_bucket_udf(dim, n_planes, n_tables, seed), schema=schema
    )
    probe_df = embeddings.sparkSession.createDataFrame(
        probes, "table_id int, bucket long"
    )
    candidates = (
        bucketed.join(F.broadcast(probe_df), ["table_id", "bucket"])
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
    )
    return cosine_topk(candidates, query, k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    exact=False (scale path): LSH-bucket blocking + in-bucket verify —
    only same-bucket pairs are compared, equi-join shuffles only.
    exact=True (oracle baseline): full pairwise — used by tests to bound
    the LSH path's recall, and by the DuckDB oracle at small SF.
    """
    # Pre-normalize once per vector (norms are O(n), not O(n²) — computing
    # them inside the pair join costs 2 array folds per PAIR).
    e = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        F.expr(_norm_expr("embedding")).alias("nrm"),
    )
    if exact:
        a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
        b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        from pyspark.sql import types as T

        emb = embeddings.select("vec_id", "embedding")
        dim = len(emb.first()["embedding"])
        schema = T.StructType(
            list(emb.schema.fields) + [T.StructField("bucket", T.LongType())]
        )
        bucketed = emb.mapInPandas(lsh_bucket_udf(dim, n_planes, seed), schema=schema).join(
            e, "vec_id"
        )
        a = bucketed.select(
            F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket"
        )
        b = bucketed.select(
            F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "bucket"
        )
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")
    return (
        pairs.withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
