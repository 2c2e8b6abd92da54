"""Search read-paths: substring search and hybrid semantic+keyword.

The reference's flagship read path (``src/api/routers/search.py``):
  * text search (``:76-105``) — case-insensitive LIKE over
    title/content, equality filters, total count + page slice ordered
    by recency;
  * hybrid search (``:247-296``) — ``semantic_weight * (1 - pgvector
    cosine distance) + (1 - semantic_weight) * ts_rank/10`` over rows
    that HAVE an embedding and MATCH the text query, with optional
    topic / relevance filters, top-k by blended score.

Spark-first shape: everything is codegen'd column arithmetic — the
keyword score is a regex hit count (the deterministic, SQL-mirrorable
stand-in for ts_rank), the cosine is the same single-fold ``aggregate``
expression the similarity operators use, and the top-k is a
``TakeOrderedAndProject``.  No UDF, no shuffle beyond the
doc ⋈ embedding equi-join (co-partitioned / bucketed by id at scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.relevance import relevance_score
from ..functions.text import topics
from .similarity import _array_lit, _dot_expr, _norm_expr

# Title surrogate: the documents table has no title column; the frozen
# contract is "first 60 chars of the text" on both engines.
TITLE_LEN = 60


def title_expr(text_col: str = "text"):
    return F.substring(F.col(text_col), 1, TITLE_LEN)


def keyword_hits(terms: list[str], *cols: str):
    """Σ over terms of whole-word hit counts across the given columns —
    the ts_rank stand-in (monotone in term frequency, deterministic,
    identical in DuckDB).

    Terms are regex-ESCAPED (a raw "c++" is a PatternSyntaxException,
    "a.b" would match 'aXb') and lowercased to match the lowercased
    haystack (an unlowered "Spark" would never hit)."""
    import re

    total = F.lit(0)
    for c in cols:
        for t in terms:
            pat = rf"\b{re.escape(t.lower())}\b"
            total = total + F.size(
                F.regexp_extract_all(F.lower(F.col(c)), F.lit(pat), F.lit(0))
            )
    return total


def text_search(
    docs: DataFrame,
    term: str,
    source: str | None = None,
    lang: str | None = None,
    page: int = 1,
    size: int = 20,
) -> DataFrame:
    """ILIKE search + filters + count + page (search.py:76-105).

    Returns the page slice ordered by recency (doc_id DESC — the
    recency surrogate of this table) with the pre-slice total_count on
    every row, exactly the paginated-response shape of the reference.
    """
    hay = F.lower(F.concat_ws(" ", title_expr(), F.col("text")))
    hit = docs.filter(hay.contains(term.lower()))
    if source is not None:
        hit = hit.filter(F.col("source") == source)
    if lang is not None:
        hit = hit.filter(F.col("lang") == lang)
    total = hit.count()
    return (
        hit.orderBy(F.desc("doc_id"))
        .offset((page - 1) * size)
        .limit(size)
        .select(
            "doc_id",
            title_expr().alias("title"),
            "source",
            "lang",
            F.lit(total).cast("long").alias("total_count"),
        )
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    terms: list[str],
    semantic_weight: float = 0.6,
    topic: str | None = None,
    min_relevance: float | None = None,
    k: int = 20,
) -> DataFrame:
    """Blended semantic+keyword top-k (search.py:247-296).

    score = w·cosine(embedding, q) + (1-w)·least(kw_hits/10, 1), over
    rows that have an embedding (inner join — the reference's
    ``vector_embedding IS NOT NULL``) and at least one keyword hit (the
    ``@@ to_tsquery`` gate).  Optional filters: ``topics @> [topic]``
    (array_contains) and ``relevance_score >= min_relevance``.
    """
    qlit = _array_lit(query_vec)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    joined = docs.join(
        embeddings.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    kw = keyword_hits(terms, "text")
    cos = F.expr(_dot_expr("embedding", qlit)) / (
        F.expr(_norm_expr("embedding")) * F.lit(qnorm)
    )
    score = F.round(
        F.lit(semantic_weight) * cos
        + F.lit(1.0 - semantic_weight) * F.least(kw / 10.0, F.lit(1.0)),
        4,
    )
    out = joined.filter(kw > 0)
    if topic is not None:
        out = out.filter(F.array_contains(topics(F.col("text")), topic))
    if min_relevance is not None:
        out = out.filter(relevance_score(F.col("text")) >= min_relevance)
    return (
        out.select(
            "doc_id",
            title_expr().alias("title"),
            kw.alias("kw_hits"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
