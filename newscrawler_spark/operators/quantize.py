"""Int8 scalar quantization of embedding columns + integer ADC top-k.

The reference stores full float32 vectors in pgvector and scans them
for cosine search (src/vector/db.py, src/vector/processor.py).  At
10^10 vectors x 64 dims that is ~2.5 TB of float payload per replica;
the standard storage answer (FAISS SQ8, Milvus/pgvector halfvec+SQ) is
per-vector max-abs int8 quantization: 4x smaller scan, SIMD integer
dot products, and the float vectors become cold storage touched only
by an optional exact-rerank stage.

Everything here is pinned cross-engine arithmetic so the whole read
path (codes, scales, integer dots, the final scaled score) is
hash-gateable against DuckDB:

  code_i      = floor((double(x_i) / maxabs) * 127.0 + 0.5)   # int8 range
  scale_micro = floor(maxabs * 1e6 + 0.5)                     # BIGINT
  dot_int     = sum_i code_i * qcode_i                        # exact BIGINT
  rank_key    = dot_int * scale_micro                         # exact BIGINT
  approx_dot  = double(rank_key) * qconst                     # one IEEE multiply

``rank_key`` drops the query-side scale (a positive constant across
rows — ranking-invariant), so ordering is a pure BIGINT compare with a
``vec_id`` tiebreak: no float comparisons anywhere in the ordering.

Plan shape: encode is a zero-shuffle projection (whole-stage codegen);
top-k is scan -> project -> TakeOrderedAndProject (per-partition local
top-k, only k rows cross the wire).  At 100 TB the scan reads the
(codes, scale) columns only — never the float vectors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round

Q_LEVELS = 127
SCALE_MICRO = 1_000_000


def _maxabs_expr(vec_col: str) -> str:
    """Max |x_i| as a sequential double fold (exact: greatest of exact
    float->double widenings — no summation order concerns)."""
    return (
        f"aggregate(transform({vec_col}, x -> abs(cast(x as double))), "
        f"cast(0.0 as double), (acc, v) -> greatest(acc, v))"
    )


def sq_encode(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Encode float vectors to (codes: array<int> in [-127,127],
    scale_micro: bigint).  Zero vectors encode as all-zero codes with
    scale_micro 0 (the division guard).  Pure column expressions."""
    codes = (
        f"transform({vec_col}, x -> "
        f"cast(floor((cast(x as double) / ma) * {Q_LEVELS}.0 + 0.5) as int))"
    )
    return emb.withColumn("ma", F.expr(_maxabs_expr(vec_col))).select(
        id_col,
        F.expr(
            f"case when ma = 0.0 then transform({vec_col}, x -> 0) "
            f"else {codes} end"
        ).alias("codes"),
        F.expr(f"cast(floor(ma * {SCALE_MICRO}.0 + 0.5) as bigint)").alias(
            "scale_micro"
        ),
    )


def sq_query_codes(query: list[float]) -> tuple[list[int], int]:
    """The query-side encode, in Python, with the SAME pinned IEEE ops
    as the SQL form (double division, *127.0, +0.5, floor) — Python
    floats ARE binary64, so every intermediate is bit-identical."""
    ma = 0.0
    for x in query:
        ma = max(ma, abs(float(x)))
    if ma == 0.0:
        return [0] * len(query), 0
    codes = [int(math.floor((float(x) / ma) * 127.0 + 0.5)) for x in query]
    return codes, int(math.floor(ma * 1000000.0 + 0.5))


def sq_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate inner-product top-k over int8 codes.

    ``approx_dot`` reconstructs the real-valued dot estimate:
    rank_key * (q_scale/1e6) * (1e6 denominator of scale_micro) /
    127^2 — folded into ONE double constant ``qconst`` computed with a
    pinned division chain (see the SQL twin in __spark_entry__)."""
    qcodes, qsm = sq_query_codes(query)
    qlit = "array(" + ", ".join(str(c) for c in qcodes) + ")"
    dot = (
        f"aggregate(zip_with(codes, {qlit}, (a, b) -> cast(a as bigint) * b), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )
    # Pinned chain: double(qsm) / 1e12 / 16129.0 (matches the SQL twin
    # operation-for-operation; 1e12 is exactly representable).
    qconst = float(qsm) / 1.0e12 / float(Q_LEVELS * Q_LEVELS)
    enc = sq_encode(emb, vec_col=vec_col, id_col=id_col)
    scored = (
        enc.select(id_col, F.expr(dot).alias("dot_int"), "scale_micro")
        .withColumn("rank_key", F.col("dot_int") * F.col("scale_micro"))
        .withColumn(
            "approx_dot",
            pinned_round(F.col("rank_key").cast("double") * F.lit(qconst), 6),
        )
    )
    return (
        scored.orderBy(F.desc("rank_key"), id_col)
        .limit(k)
        .select(id_col, "dot_int", "scale_micro", "approx_dot")
    )
