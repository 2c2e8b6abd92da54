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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round

from ..functions.relevance import relevance_score
from ..functions.text import topics, ws_token_count
from .similarity import _array_lit, _dot_expr, _norm_expr

# Title surrogate: the documents table has no title column; the frozen
# contract is "first 60 chars of the text" on both engines.
TITLE_LEN = 60


def title_expr(text_col: str = "text"):
    return F.substring(F.col(text_col), 1, TITLE_LEN)


def term_pattern(term: str) -> str:
    """The frozen whole-word regex for one search term, shared by the
    engine and any SQL oracle.

    Terms are regex-ESCAPED (a raw "c++" is a PatternSyntaxException,
    "a.b" would match 'aXb') and lowercased to match the lowercased
    haystack.  ``\\b`` is attached PER EDGE, only where the term's edge
    character is a word character: an unconditional ``\\b...\\b`` makes
    any term that starts or ends with a non-word char (e.g. "c++")
    unmatchable — ``\\b`` after '+' demands a word char where the next
    char is a space.  Conditional boundaries keep "c++" matchable while
    "ai" still refuses to hit inside "chair"; both Java and RE2 (the
    DuckDB engine) support ``\\b``, so the pattern is oracle-portable
    (lookarounds are not — RE2 has none)."""
    import re

    t = term.lower()
    left = r"\b" if (t[:1].isalnum() or t[:1] == "_") else ""
    right = r"\b" if (t[-1:].isalnum() or t[-1:] == "_") else ""
    return f"{left}{re.escape(t)}{right}"


def keyword_hits(terms: list[str], *cols: str):
    """Σ over terms of whole-word hit counts across the given columns —
    the ts_rank stand-in (monotone in term frequency, deterministic,
    identical in DuckDB via :func:`term_pattern`)."""
    total = F.lit(0)
    for c in cols:
        for t in terms:
            total = total + F.size(
                F.regexp_extract_all(
                    F.lower(F.col(c)), F.lit(term_pattern(t)), F.lit(0)
                )
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
    # title OR content, matched SEPARATELY (the reference's `title ILIKE
    # OR content ILIKE`): a single concatenated haystack would invent
    # matches spanning the concat seam for multi-word terms.  Since the
    # title surrogate is a PREFIX of text, title-only hits cannot exist
    # and the text side alone is the exact disjunction.
    hit = docs.filter(F.lower(F.col("text")).contains(term.lower()))
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
    if qnorm == 0.0:
        # a zero query vector would NULL every cosine (0-division) and
        # silently rank all rows by doc_id; fail loudly at plan time
        raise ValueError("hybrid_search: query_vec has zero norm")
    joined = docs.join(
        embeddings.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    # materialize kw_hits ONCE: Catalyst does not eliminate common
    # subexpressions across the Filter/Project boundary, so inlining the
    # expression tree in the filter, the projection AND the score would
    # run every per-term regex scan up to 3× per row
    joined = joined.withColumn("kw_hits", keyword_hits(terms, "text"))
    enorm = F.expr(_norm_expr("embedding"))
    # zero-norm stored embeddings score 0 on the semantic leg instead of
    # emitting NULL (which would sort last with no signal)
    cos = F.when(
        enorm != 0.0, F.expr(_dot_expr("embedding", qlit)) / (enorm * F.lit(qnorm))
    ).otherwise(F.lit(0.0))
    score = pinned_round(
        F.lit(semantic_weight) * cos
        + F.lit(1.0 - semantic_weight) * F.least(F.col("kw_hits") / 10.0, F.lit(1.0)),
        4,
    )
    out = joined.filter(F.col("kw_hits") > 0)
    if topic is not None:
        out = out.filter(F.array_contains(topics(F.col("text")), topic))
    if min_relevance is not None:
        out = out.filter(relevance_score(F.col("text")) >= min_relevance)
    return (
        out.select(
            "doc_id",
            title_expr().alias("title"),
            "kw_hits",
            score.alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


# --- BM25 ----------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    k: int = 20,
) -> DataFrame:
    """Okapi BM25 top-k over whitespace-tokenized documents — the
    standard keyword ranker the reference's ts_rank path approximates
    (``src/api/routers/search.py:247-296`` blends ts_rank/10; BM25 is
    its public-knowledge upgrade with documented constants k1=1.2,
    b=0.75 and the Lucene idf form ln(1 + (N - df + 0.5)/(df + 0.5))).

    Plan shape (fit-then-score, two deliberate corpus scans like
    selection.dsir_weights): per-document term frequencies and length
    are pure codegen regex/split projections (terms are a fixed literal
    list — no explode, no token shuffle); the corpus statistics
    (N, Σdl, per-term df) reduce to ONE broadcast row, and scoring is a
    broadcast cross join + TakeOrderedAndProject — at 100 TB nothing
    shuffles except the single-row stats dim and the k survivors.

    All score arithmetic is written in the identical operation order as
    the SQL oracle (same Python float literals interpolated into both),
    ordered (score DESC, doc_id) with doc_id as the deterministic tie
    break; the emitted score is pinned to 4dp.
    """
    dl = ws_token_count(F.col(text_col))
    tf_cols = [
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(term_pattern(t)), F.lit(0)
            )
        ).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    perdoc = docs.select("doc_id", dl.alias("dl"), *tf_cols)
    stats = perdoc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = perdoc.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = F.lit(0.0)
    n_hits = F.lit(0)
    for i in range(len(terms)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)))
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
        score = score + idf * (tf * F.lit(k1 + 1.0)) / denom
        n_hits = n_hits + tf
    return (
        scored.select(
            "doc_id",
            n_hits.cast("long").alias("n_hits"),
            score.alias("_s"),
        )
        .where(F.col("n_hits") > 0)
        .orderBy(F.desc("_s"), "doc_id")
        .limit(k)
        .select("doc_id", "n_hits", pinned_round(F.col("_s"), 4).alias("score_bm25"))
    )


# Explicit ASCII whitespace (the tri-engine collapse_ws pin).
_WS_CLASS = r"[ \t\n\r\f\x0b]+"


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted index over the corpus: one row per
    (term, document) with term frequency, the sorted 1-based position
    list, and the term's document frequency — the index-build half of
    the search read-paths above (a Lucene/Elasticsearch segment's
    posting layout, flattened to rows).

    Scale shape (PLANS.md "ratio of a group to the total"): positions
    come from ``posexplode`` over the ALREADY-FILTERED token array (no
    per-doc window, no corpus re-numbering job); the (term, doc)
    aggregate partial-combines map-side before its key shuffle, and
    ``df`` is a window over that AGGREGATE (second, distinct-pair-sized
    exchange) — never a corpus-scale groupBy(term) twin that Catalyst
    would not share, and never a single posting-list row per term (a
    ``collect_list`` per term concentrates every hot-term posting in
    one task — the stopword-skew shape ``max_df`` exists to kill).
    """
    from pyspark.sql import Window

    arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS_CLASS),
        lambda x: x != "",
    )
    tok = docs.select(F.col(id_col), F.posexplode(arr).alias("pos", "w"))
    agg = tok.groupBy(F.col("w").alias("term"), id_col).agg(
        F.count("*").cast("long").alias("tf"),
        F.sort_array(
            F.collect_list((F.col("pos") + 1).cast("long"))
        ).alias("positions"),
    )
    return agg.select(
        "term",
        id_col,
        "tf",
        "positions",
        F.count("*").over(Window.partitionBy("term")).cast("long").alias("df"),
    )


def tfidf_topk(
    docs: DataFrame,
    query_doc: int = 0,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse tf-idf cosine top-k against one document — the
    inverted-index complement of the dense ANN operators (the
    "more-like-this" read path every search engine ships).

    Built ON the posting relation (:func:`build_postings`): weights are
    ``tf · ln(N/df)``; per-doc norms are a window over the postings
    PARTITIONED BY doc, and the dot products reuse that exact hash
    partitioning for their groupBy (subset rule, PLANS.md sessionize
    lesson) — so scoring adds ONE corpus-scale exchange on top of the
    index build, plus a broadcast of the query document's (bounded)
    term vector.  ``N`` is a bounded scalar collect (one count of the
    aggregate).  Similarity is pinned at 4dp with doc_id tiebreaks —
    the DuckDB oracle replays ranking decision-for-decision.
    """
    from pyspark.sql import Window

    post = build_postings(docs, text_col=text_col, id_col=id_col).select(
        "term", id_col, "tf", "df"
    )
    n_docs = post.select(id_col).distinct().count()
    w = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    wp = post.select("term", id_col, w.alias("w"))
    wp = wp.withColumn(
        "norm2", F.sum(F.col("w") * F.col("w")).over(Window.partitionBy(id_col))
    )
    q = (
        wp.where(F.col(id_col) == query_doc)
        .select(
            F.col("term"),
            F.col("w").alias("qw"),
            F.col("norm2").alias("qnorm2"),
        )
    )
    sim = pinned_round(
        F.col("dot") / (F.sqrt(F.col("norm2")) * F.sqrt(F.col("qnorm2"))), 4
    )
    return (
        wp.join(F.broadcast(q), "term")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("w") * F.col("qw")).alias("dot"),
            F.max("norm2").alias("norm2"),
            F.max("qnorm2").alias("qnorm2"),
        )
        .select(id_col, sim.alias("sim_tfidf"))
        .orderBy(F.desc("sim_tfidf"), id_col)
        .limit(k)
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase query over the positional inverted index — the
    read path the positions in :func:`build_postings` exist for (a
    Lucene ``PhraseQuery`` with slop 0; the reference's LIKE search,
    src/api/routers/search.py:76-105, matches substrings but cannot do
    token-exact phrases).

    Algorithm (classic adjacency intersection): join the postings of
    the phrase's terms (broadcast — the phrase is bounded), collect the
    per-doc (offset, positions) pairs, then fold adjacency left to
    right: candidate positions of term i = ``intersect(prev + 1,
    positions_i)`` — array expressions only, no UDF.  The fold's final
    array holds the positions where the LAST term ends a full match.

    Scale shape: the postings of the queried terms are a term-selective
    index probe (at scale the postings relation is written partitioned
    by term, so the scan prunes to m partitions); one groupBy(doc) over
    those rows — aggregate size bounded by the phrase's df, never the
    corpus.  A stopword-heavy phrase costs its posting lists, exactly
    like Lucene.

    Output: (doc_id, n_matches, first_pos) for matching docs,
    n_matches = phrase occurrences, first_pos = 1-based position of the
    first occurrence's FIRST term.  All-integer — hash-gate exact.
    """
    terms = [t for t in _re_split_ws(phrase) if t != ""]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    m = len(terms)
    spark = docs.sparkSession
    pt = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, off int"
    )
    post = build_postings(docs, text_col=text_col, id_col=id_col).select(
        "term", id_col, "positions"
    )
    j = post.join(F.broadcast(pt), "term").select(id_col, "off", "positions")
    agg = (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.sort_array(F.collect_list(F.struct("off", "positions"))).alias("ps"),
        )
        .where(F.col("nt") == m)
    )
    if m == 1:
        ends = F.col("ps")[0]["positions"]
    else:
        ends = F.aggregate(
            F.slice("ps", 2, m - 1),
            F.col("ps")[0]["positions"],
            lambda acc, s: F.array_intersect(
                F.transform(acc, lambda x: x + F.lit(1).cast("long")),
                s["positions"],
            ),
        )
    return (
        agg.select(
            id_col,
            F.size(ends).cast("long").alias("n_matches"),
            (F.array_min(ends) - F.lit(m - 1)).cast("long").alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
        .orderBy(F.desc("n_matches"), id_col)
    )


def _re_split_ws(s: str) -> list[str]:
    """Frozen explicit-ASCII whitespace split (never str.split/\\s —
    the tri-engine contract, CLAUDE.md)."""
    import re

    return re.split(r"[ \t\n\r\f\x0b]+", s)


def keywords_tfidf(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tf-idf keyword extraction — top-``top_k`` terms per
    doc by ``tf · ln(N/df)`` (the reference stores extracted keywords
    per article, src/database/models.py keywords column; this derives
    them from corpus statistics instead of the HTML meta tags).

    Built on :func:`build_postings`; the rank window partitions by doc
    — the SAME key the postings aggregate already hash-partitioned on,
    so Catalyst plans zero additional exchanges for the ranking (subset
    rule).  ``N`` is one bounded scalar.  Weight pinned at 4dp, ties →
    lexicographic term — decision-for-decision replayable (same ln
    discipline as tfidf_topk / DSIR).
    """
    from pyspark.sql import Window

    post = build_postings(docs, text_col=text_col, id_col=id_col).select(
        "term", id_col, "tf", "df"
    )
    n_docs = post.select(id_col).distinct().count()
    w = pinned_round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
    )
    ranked = post.select(id_col, "term", w.alias("w_tfidf")).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.desc("w_tfidf"), "term")
        ),
    )
    return ranked.where(F.col("rnk") <= top_k).select(
        id_col, "term", "w_tfidf", F.col("rnk").cast("int").alias("rnk")
    )


def rrf_fuse(
    docs: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    terms: list[str],
    k: int = 20,
    kw_pool: int = 25,
    sem_pool: int = 20,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) of
    the BM25 keyword ranking and the exact cosine semantic ranking —
    the score-free alternative to ``hybrid_search``'s weighted blend:
    rrf = Σ 1/(60 + rank_i) over the lists that retrieved the doc,
    immune to the two scores living on different scales.

    Scale shape: both input rankings are already top-pool reductions
    (TakeOrderedAndProject), so the fusion operates on ≤ kw_pool +
    sem_pool rows — the ranks, the full-outer merge, and the final
    top-k cost nothing at any corpus size; the corpus-scaled work is
    the two rankers' own documented scans.

    Determinism contract: ranks are assigned over each ranker's PINNED
    emitted score with doc_id tiebreak (both engines see identical
    4dp values), and the 1/(60+r) arithmetic is the same IEEE754
    expression tree in the DuckDB oracle.  Output
    ``(doc_id, r_kw, r_sem, rrf)`` — null rank = not retrieved by
    that list."""
    from pyspark.sql import Window

    from .similarity import cosine_topk

    kw = bm25_rank(docs, terms, k=kw_pool)
    wk = Window.orderBy(F.desc("score_bm25"), "doc_id")
    kw_r = kw.select("doc_id", F.row_number().over(wk).alias("r_kw"))
    sem = cosine_topk(embeddings, query_vec, k=sem_pool)
    ws = Window.orderBy(F.desc("cosine"), "vec_id")
    sem_r = sem.select(
        F.col("vec_id").alias("doc_id"), F.row_number().over(ws).alias("r_sem")
    )
    j = kw_r.join(sem_r, "doc_id", "full_outer")

    def _contrib(col: str):
        return F.when(
            F.col(col).isNotNull(),
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(col)),
        ).otherwise(F.lit(0.0))

    rrf = _contrib("r_kw") + _contrib("r_sem")
    return (
        j.select(
            "doc_id",
            F.col("r_kw").cast("long").alias("r_kw"),
            F.col("r_sem").cast("long").alias("r_sem"),
            rrf.alias("_rrf"),
        )
        .orderBy(F.desc("_rrf"), "doc_id")
        .limit(k)
        .select(
            "doc_id", "r_kw", "r_sem", pinned_round(F.col("_rrf"), 4).alias("rrf")
        )
    )


BM25F_W_TITLE = 2.0
BM25F_W_BODY = 1.0
BM25F_B_TITLE = 0.5
BM25F_B_BODY = 0.75


def bm25f_rank(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = BM25_K1,
    k: int = 20,
) -> DataFrame:
    """BM25F — field-weighted BM25 (Zaragoza et al. CIKM'04, the
    ranker behind structured-document search everywhere Lucene's
    per-field boosts are used): the title field (the reference UI's
    headline match, weight 2.0, gentle length normalisation b=0.5)
    and the body (weight 1.0, b=0.75) combine at the TERM-FREQUENCY
    level — tf_c = Σ_f w_f·tf_f/B_f with B_f the per-field length
    norm — then saturate once: idf · tf_c/(k1 + tf_c).  Combining
    before saturation is the point of BM25F (a per-field BM25 sum
    over-rewards matching the same term in both fields).

    Fields are deterministic char splits of ``text`` (title =
    first TITLE_LEN chars — the frozen title_expr contract — body =
    the rest), so the DuckDB oracle reproduces them byte-for-byte.
    Same plan shape as :func:`bm25_rank`: codegen per-field tf/len
    projections, ONE broadcast stats row, TakeOrderedAndProject —
    nothing corpus-scaled shuffles."""
    lt_col = F.lower(F.substring(F.col(text_col), 1, TITLE_LEN))
    lb_col = F.lower(F.substring(F.col(text_col), TITLE_LEN + 1, 2_000_000_000))

    def _tf(field: Column, t: str):
        return F.size(
            F.regexp_extract_all(field, F.lit(term_pattern(t)), F.lit(0))
        )

    perdoc = docs.select(
        "doc_id",
        ws_token_count(lt_col).alias("lt"),
        ws_token_count(lb_col).alias("lb"),
        *[_tf(lt_col, t).alias(f"tt_{i}") for i, t in enumerate(terms)],
        *[_tf(lb_col, t).alias(f"tb_{i}") for i, t in enumerate(terms)],
    )
    stats = perdoc.agg(
        F.count("*").alias("n_docs"),
        F.sum("lt").alias("sum_lt"),
        F.sum("lb").alias("sum_lb"),
        *[
            F.sum(((F.col(f"tt_{i}") + F.col(f"tb_{i}")) > 0).cast("int")).alias(
                f"df_{i}"
            )
            for i in range(len(terms))
        ],
    )
    scored = perdoc.crossJoin(F.broadcast(stats))
    avg_lt = F.col("sum_lt").cast("double") / F.col("n_docs")
    avg_lb = F.col("sum_lb").cast("double") / F.col("n_docs")
    bt_norm = F.lit(1.0 - BM25F_B_TITLE) + F.lit(BM25F_B_TITLE) * (
        F.col("lt") / avg_lt
    )
    bb_norm = F.lit(1.0 - BM25F_B_BODY) + F.lit(BM25F_B_BODY) * (
        F.col("lb") / avg_lb
    )
    score = F.lit(0.0)
    n_hits = F.lit(0)
    for i in range(len(terms)):
        tt, tb, df = F.col(f"tt_{i}"), F.col(f"tb_{i}"), F.col(f"df_{i}")
        tfc = F.lit(BM25F_W_TITLE) * (tt / bt_norm) + F.lit(BM25F_W_BODY) * (
            tb / bb_norm
        )
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        score = score + idf * tfc / (F.lit(k1) + tfc)
        n_hits = n_hits + tt + tb
    return (
        scored.select("doc_id", n_hits.cast("long").alias("n_hits"), score.alias("_s"))
        .where(F.col("n_hits") > 0)
        .orderBy(F.desc("_s"), "doc_id")
        .limit(k)
        .select(
            "doc_id", "n_hits", pinned_round(F.col("_s"), 4).alias("score_bm25f")
        )
    )
