"""Embedding chunking — the reference splits article text into
1000-char chunks with 200-char overlap before embedding
(``src/vector/processor.py:46-55``, RecursiveCharacterTextSplitter).

Frozen batch analog (SQL-mirrorable, no library dependence): chunk i
starts at ``i · (size - overlap)`` and spans ``size`` chars; starts run
while ``start <= len - overlap - 1`` (plus chunk 0 always), i.e.

    starts = sequence(0, greatest(len - overlap - 1, 0), size - overlap)

so consecutive chunks share exactly ``overlap`` chars and no chunk is
wholly contained in its predecessor.  The explode is Spark's
``posexplode`` over a ``sequence`` column — pure codegen, the chunk
table shuffles nothing (narrow op), and at 100 TB the chunk rows land
in the same partitions as their documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round

CHUNK_SIZE = 1000
CHUNK_OVERLAP = 200
# chunk_id domain for the composite (doc_id·span + chunk_id) ride-through
# in chunked_embeddings: 10^4 chunks × 800-char stride = 8M chars/doc max
_CHUNK_ID_SPAN = 10_000


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """(doc_id, chunk_id, chunk_start, chunk) — one row per chunk."""
    stride = size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.expr(f"substring({text_col}, chunk_start + 1, {size})").alias("chunk"),
    )


def chunk_stats(df: DataFrame, **kw) -> DataFrame:
    """Oracle-checkable chunk surface: per-chunk length + content hash."""
    ch = chunk_text(df, **kw)
    return ch.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.length("chunk").alias("chunk_len"),
        F.md5("chunk").alias("chunk_hash"),
    )


def chunked_embeddings(df: DataFrame, **kw) -> DataFrame:
    """(doc_id, chunk_id, embedding) — the chunk table pushed through
    the hashing-trick embedder (functions/embed.py), Arrow-batched."""
    from ..functions.embed import embed_map_in_pandas

    ch = chunk_text(df, **kw).select(
        "doc_id", "chunk_id", F.col("chunk").alias("text")
    )
    # embed_map_in_pandas contract: (doc_id, text) → (doc_id, embedding);
    # ride chunk_id through a composite id and split it back out.
    # _CHUNK_ID_SPAN bounds chunk_id (a doc longer than span×stride chars
    # would alias into the next doc_id — fail loudly, don't mis-attribute
    # embeddings); decode uses integer `div`, never double division
    # (composite > 2^53 would round the decoded doc_id).
    span = _CHUNK_ID_SPAN
    composite = ch.select(
        (
            F.col("doc_id") * span
            + F.when(F.col("chunk_id") < span, F.col("chunk_id")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"chunk_id >= {span} for doc_id "),
                        F.col("doc_id").cast("string"),
                        F.lit(" — raise _CHUNK_ID_SPAN or chunk coarser"),
                    )
                ).cast("int")
            )
        ).alias("doc_id"),
        "text",
    )
    from ..functions.embed import EMBED_SCHEMA

    emb = composite.mapInPandas(embed_map_in_pandas, schema=EMBED_SCHEMA)
    return emb.select(
        F.expr(f"doc_id div {span}").alias("doc_id"),
        F.pmod("doc_id", F.lit(span)).cast("int").alias("chunk_id"),
        "embedding",
    )


def chunk_scores_kernel(
    docs: DataFrame, query: list[float], dim: int = 64
) -> DataFrame:
    """Per-chunk cosine against ``query`` with a CROSS-ENGINE-EXACT
    integer kernel — the shared scoring core of :func:`doc_topk_kernel`
    and :func:`operators.rag.assemble_context_kernel`.

    The hashing-trick embedder's pre-normalization vector is an integer
    bucket-count vector (md5 → bucket, ±1 sign — the same kernel the
    float UDF in functions/embed.py applies), and cosine is
    scale-invariant, so scoring chunks directly on the INTEGER raw
    vectors gives the identical ranking to the normalized-float path
    while every dot product stays exact int64 arithmetic: the query is
    quantized ``floor(x·1e4 + 0.5)`` (the sim_ann_lsh convention), dots
    and chunk norms are integer sums, and the only float ops are one
    division and one sqrt per chunk — bit-identical in any engine.
    Whole pipeline pure codegen (no UDF): posexplode chunks → split/md5
    tokens → two partial-agg groupBys.

    Returns (doc_id, chunk_id, chunk_len, cosine_raw) for chunks with a
    nonzero bucket vector; ``chunk_len`` rides through the groupBys as a
    functionally-dependent key so no re-join against the chunk table is
    needed.

    At 100 TB: narrow until the per-(doc,chunk,bucket) combine — the
    token explode never shuffles raw text, only (ids, bucket, sign)
    rows with map-side partial aggregation.
    """
    import math

    if len(query) != dim:
        # element_at past len(query) yields NULL and F.sum would silently
        # skip it — a truncated dot product, not an error
        raise ValueError(f"query has {len(query)} dims, kernel dim is {dim}")
    qint = [int(math.floor(float(x) * 10000 + 0.5)) for x in query]
    qq = float(sum(v * v for v in qint))
    qlit = "array(" + ",".join(f"{v}L" for v in qint) + ")"
    ch = chunk_text(docs)
    tok = ch.select(
        "doc_id",
        "chunk_id",
        F.length("chunk").alias("chunk_len"),
        F.explode(F.split(F.lower("chunk"), r"[ \t\n\r\f\x0b]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = tok.select(
        "doc_id",
        "chunk_id",
        "chunk_len",
        F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"), F.lit(dim)
        ).alias("bucket"),
        F.when(
            F.pmod(F.conv(F.substring(F.md5("tok"), 9, 2), 16, 10).cast("long"), F.lit(2)) == 1,
            1,
        )
        .otherwise(-1)
        .alias("sign"),
    )
    pb = h.groupBy("doc_id", "chunk_id", "chunk_len", "bucket").agg(
        F.sum("sign").alias("cnt")
    )
    scored = pb.groupBy("doc_id", "chunk_id", "chunk_len").agg(
        F.sum(
            F.col("cnt") * F.expr(f"element_at({qlit}, cast(bucket + 1 as int))")
        ).alias("dot"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("nn"),
    )
    cos = F.col("dot") / F.sqrt(F.col("nn").cast("double") * F.lit(qq))
    return scored.filter(F.col("nn") > 0).select(
        "doc_id", "chunk_id", "chunk_len", cos.alias("cosine_raw")
    )


def doc_topk_kernel(
    docs: DataFrame, query: list[float], k: int = 10, dim: int = 64
) -> DataFrame:
    """Chunk → embed → doc-level max-pool top-k with the cross-engine-
    exact integer kernel (:func:`chunk_scores_kernel`) — the oracled
    twin of :func:`doc_topk_from_chunks`.  Top-k is TakeOrdered, not a
    global sort."""
    scored = chunk_scores_kernel(docs, query, dim)
    return (
        scored.select("doc_id", F.col("cosine_raw").alias("c"))
        .groupBy("doc_id")
        .agg(pinned_round(F.max("c"), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(k)
    )


def doc_topk_from_chunks(
    chunk_emb: DataFrame, query: list[float], k: int = 10
) -> DataFrame:
    """Doc-level ANN over chunked embeddings: score each chunk, max-pool
    per document (the standard chunk→doc aggregation), top-k docs."""
    from .similarity import _array_lit, _dot_expr, _norm_expr

    import math

    qlit = _array_lit(query)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    cos = F.expr(_dot_expr("embedding", qlit)) / (
        F.expr(_norm_expr("embedding")) * F.lit(qnorm)
    )
    return (
        chunk_emb.select("doc_id", cos.alias("chunk_cos"))
        .groupBy("doc_id")
        .agg(pinned_round(F.max("chunk_cos"), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(k)
    )
