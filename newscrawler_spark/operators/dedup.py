"""Deduplication family for web-scale training corpora.

Exact (hash-groupBy), n-gram Jaccard via an inverted shingle index,
MinHash+LSH banding, and SimHash — the standard near-dup arsenal over a
``documents(doc_id, text, ...)`` table.

Scale design:
  * nothing here ever cross-joins the corpus: candidates come from
    equi-joins on shingles / LSH band keys, so the shuffle is
    (doc, shingle)-sized, not O(n²);
  * all hashing is md5-based column expressions (JVM codegen, and
    identically computable in DuckDB for the correctness oracle);
  * the verify step (true Jaccard) runs only on candidate pairs.

At 100 TB the (doc, shingle) explode is the dominant shuffle; it is
hash-partitioned on shingle which is near-uniform.  Stopword-ish
mega-shingles (posting lists of millions of docs) would skew the
self-join — the standard mitigation, dropping shingles with document
frequency above a cap, is ``max_df`` below (also cuts the join cost
quadratically in the hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.rounding import pinned_round

# --- shingling ---------------------------------------------------------


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs: distinct word n-grams of the lowercased,
    whitespace-split text. Pure SQL higher-order functions.

    Rows are unique by construction (``array_distinct`` before the
    explode), so no post-explode distinct shuffle is needed.  The token
    split is projected ONCE and shingles index it with O(1)
    ``element_at`` — inlining the split into the lambda (evaluated per
    shingle) plus per-shingle ``slice`` copies was measured 7× slower
    on article-sized text.
    """
    grams = ", ".join(f"element_at(_tk, i + {k})" for k in range(n))
    # Index domain via filter, not sequence(1, size-n+1): for docs with
    # fewer than n tokens Spark's sequence(1, 0) DESCENDS ([1, 0]) and
    # element_at(_tk, i+n-1) then throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    # — the filter yields the empty index set instead (zero shingles,
    # matching the DuckDB oracle's empty range()).
    shingles = F.array_distinct(
        F.expr(
            f"transform(filter(sequence(1, size(_tk)), i -> i <= size(_tk) - {n - 1}), "
            f"i -> concat_ws(' ', {grams}))"
        )
    )
    return df.select(
        "doc_id", F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f\x0b]+").alias("_tk")
    ).select("doc_id", F.explode(shingles).alias("shingle"))


# --- exact dedup --------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: keeper = min doc_id.
    Returns (content_hash, keeper_id, n_dups). The reference's analog is
    the insert-if-absent URL gate (src/cli.py:72-77) applied to content."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_dups"))
    )


# --- n-gram Jaccard near-dup (inverted index, no cross join) ------------


def jaccard_candidates(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs with n-gram Jaccard ≥ threshold.

    Uncapped (max_df=None): shingle explode → self equi-join on shingle
    → count shared → |A∪B| = |A|+|B|−shared → filter.  Shuffles are
    keyed on shingle then (doc_a, doc_b); no O(n²) stage — but the
    co-shingled PAIR count is quadratic in each shingle's document
    frequency, so a hot shingle (boilerplate n-gram shared by d docs)
    contributes C(d,2) join rows: the 2×-input probe measured 3.36×
    wall for 2× docs through this path (op_scaling.json, r5).

    Capped (max_df=k): the self-join runs on the df-capped inverted
    index only (hot shingles excluded from pair generation), giving
    each pair its KEPT-shingle shared count.  Exact jaccard then comes
    from a bound: a dropped (df>k) shingle contributes to a pair only
    if it is in BOTH docs, so true_shared ∈ [shared_kept, shared_kept +
    min(dropped_a, dropped_b)].  Pairs whose upper-bound jaccard misses
    the threshold are pruned; pairs with min(dropped)=0 are already
    exact; ONLY the residual band (both docs carry dropped shingles
    and the bound straddles the threshold surface) pays a candidate-
    first verify over the full shingle sets (the minhash_near_dups
    shape).  On a corpus with no over-cap shingles the band is empty
    and the cost is the uncapped plan plus two tiny per-doc aggregates;
    at 100 TB the hot-shingle C(df,2) pair blowup is structurally
    excluded.  Jaccard values are exact everywhere; only candidate
    RECALL is capped (a pair is missed only if every shared shingle
    has df>k — at threshold 0.5 a near-dup shares ≥⅓ of its shingles).
    capped ≡ uncapped on the gate corpora (max df 25 at sf0.1 < 100)
    is asserted in tests/test_dedup_similarity.py; the DuckDB oracle
    replays an equivalent (simpler two-phase) plan — same values.
    """
    def jmax(s):
        return pinned_round(s / (F.col("na") + F.col("nb") - s), 4)

    shared, sizes = _pair_shared_counts(df, text_col, n, max_df, jmax, threshold)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jmax(F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "na", "nb", "jaccard")
    )


def _pair_shared_counts(df, text_col, n, max_df, score_expr, threshold):
    """Exact shared-shingle counts per doc pair, hot-shingle safe.

    Returns (shared_df(doc_a, doc_b, shared), sizes(doc_id, n_sh)).
    ``score_expr(s_col) -> Column`` builds the pinned similarity score
    from a shared-count column given na/nb columns in scope; it must be
    monotone INCREASING in s so the dropped-shingle upper bound
    s_max = shared_kept + min(drop_a, drop_b) yields a sound prune.
    With max_df=None the classic single-phase self-join runs; with a
    cap, pairs are generated on the df≤cap index only (hot shingles'
    C(df,2) blowup excluded), decided exactly when either side has no
    dropped shingles, and verified candidate-first otherwise.  Shared
    by jaccard_candidates and containment_pairs."""
    sh = with_shingles(df, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_df is None:
        a = sh.alias("a")
        b = sh.alias("b")
        shared = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("shared"))
        )
        return shared, sizes
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") <= max_df)
        .select("shingle")
    )
    idx = sh.join(keep, "shingle")
    kept_sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_kept"))
    drops = sizes.join(kept_sizes, "doc_id", "left").select(
        "doc_id",
        (F.col("n_sh") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_drop"),
    )
    ia = idx.alias("ia")
    ib = idx.alias("ib")
    pairs = (
        ia.join(ib, "shingle")
        .filter(F.col("ia.doc_id") < F.col("ib.doc_id"))
        .groupBy(F.col("ia.doc_id").alias("doc_a"), F.col("ib.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared_kept"))
    )
    da = drops.select(F.col("doc_id").alias("doc_a"), F.col("n_drop").alias("drop_a"))
    db = drops.select(F.col("doc_id").alias("doc_b"), F.col("n_drop").alias("drop_b"))
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    s_max = F.col("shared_kept") + F.least(F.col("drop_a"), F.col("drop_b"))
    bounded = (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn("score_ub", score_expr(s_max))
        .filter(F.col("score_ub") >= threshold)
    )
    exact = bounded.filter(
        F.least(F.col("drop_a"), F.col("drop_b")) == 0
    ).select("doc_a", "doc_b", F.col("shared_kept").alias("shared"))
    band = bounded.filter(
        F.least(F.col("drop_a"), F.col("drop_b")) > 0
    ).select("doc_a", "doc_b")
    xa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    xb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    verified = (
        band.join(xa, "doc_a")
        .join(xb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return exact.unionByName(verified), sizes


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 100,
) -> DataFrame:
    """Near-dup pairs by n-gram CONTAINMENT — max-side asymmetric
    Jaccard, C(a,b) = shared / min(|A|, |B|) (Broder 1997's containment,
    symmetrized by the smaller set).  Catches what Jaccard misses:
    syndicated excerpts, quote inclusions, and sub-document copies
    where a short doc sits inside a long one (jaccard dilutes by the
    union; containment does not).  Same hot-shingle-safe machinery as
    jaccard_candidates (_pair_shared_counts: df-capped pair
    generation, exact bound-prune, banded verify); containment is
    monotone increasing in shared, so the same s_max bound is sound.

    Returns (doc_a, doc_b, shared, na, nb, containment ≥ threshold),
    containment pinned at 4dp."""

    def cmax(s):
        return pinned_round(s / F.least(F.col("na"), F.col("nb")), 4)

    shared, sizes = _pair_shared_counts(df, text_col, n, max_df, cmax, threshold)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("containment", cmax(F.col("shared")))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "shared", "na", "nb", "containment")
    )


# --- MinHash + LSH banding ----------------------------------------------


_MINHASH_P = 1_000_000_007


def _minhash_wide(
    df: DataFrame, text_col: str = "text", n: int = 3, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, m0..m{k-1}) — minhash_s(doc) = min over shingles of
    g_s(shingle), one column per seed.

    Hash family: ONE md5 per shingle split into two 52-bit halves
    (h1, h2), then g_s = (h1 + s·h2) mod 1e9+7 — the Kirsch–
    Mitzenmacher double-hashing construction, so the k seeds cost k
    integer mults, not k md5s (16 md5s/shingle were ~70% of the
    signature stage).  52-bit halves keep h1 + 15·h2 < 2^56: no
    overflow in either engine, and the whole family is reproduced
    bit-exactly by the DuckDB oracle via ('0x'||substring(md5,…))::
    BIGINT.

    All k mins are aggregates of ONE groupBy(doc_id), so the seed
    dimension never inflates the shuffle: the k values per shingle are
    computed map-side and partial-aggregated to one row per (doc,
    partition) before any exchange.  (The previous shape — explode ×
    broadcast-seeds join → groupBy(doc, seed) — shuffled k× the
    shingle count and then needed a SECOND shuffle to regroup bands
    per doc; measured ~2× slower end-to-end at sf0.1.)
    """
    sh = with_shingles(df, text_col, n)
    d = F.md5("shingle")
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(d, 1, 13), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(d, 17, 13), 16, 10).cast("long").alias("_h2"),
    )
    aggs = [
        F.min(
            F.pmod(F.col("_h1") + F.lit(s) * F.col("_h2"), F.lit(_MINHASH_P))
        ).alias(f"m{s}")
        for s in range(n_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n: int = 3, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, seed, minhash) — long view of :func:`_minhash_wide`
    (stack is a free row-local pivot); see there for the md5 double-
    hashing family, codegen'd exprs bit-identical in the DuckDB
    oracle."""
    wide = _minhash_wide(df, text_col, n, n_hashes)
    stack_args = ", ".join(f"{s}, m{s}" for s in range(n_hashes))
    return wide.select(
        "doc_id",
        F.expr(f"stack({n_hashes}, {stack_args}) AS (seed, minhash)"),
    ).select("doc_id", F.col("seed").cast("int").alias("seed"), "minhash")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """LSH banding: band_key = md5 of the band's 'seed=minhash' strings,
    lexicographically sorted; docs sharing any (band_id, band_key) are
    candidates.  Band keys come straight off the wide signature row —
    no per-(doc, band) regrouping shuffle."""
    bands = _lsh_bands(df, text_col, n, n_hashes, band_size)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _lsh_bands(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """(doc_id, band_id, band_key) — the banded signature relation
    shared by the self-join (:func:`lsh_candidate_pairs`) and the
    incremental batch-vs-corpus probe (:func:`incremental_dedup`)."""
    wide = _minhash_wide(df, text_col, n, n_hashes)
    n_bands = (n_hashes + band_size - 1) // band_size
    band_structs = []
    for bid in range(n_bands):
        members = F.array(
            *[
                F.concat_ws("=", F.lit(s), F.col(f"m{s}"))
                for s in range(bid * band_size, min((bid + 1) * band_size, n_hashes))
            ]
        )
        band_structs.append(
            F.struct(
                F.lit(bid).alias("band_id"),
                F.md5(F.concat_ws("|", F.array_sort(members))).alias("band_key"),
            )
        )
    return (
        wide.select("doc_id", F.explode(F.array(*band_structs)).alias("b"))
        .select("doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key"))
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidates verified with true Jaccard, computed ONLY
    for the candidate pairs.

    The shared-shingle count is driven off the candidate list — the
    shingle index is joined pair-first (cands ⋈ shingles(a) ⋈
    shingles(b)) — so the verify cost is Σ_candidates |shingles(a)|,
    not the all-co-shingled-pairs cost of the plain inverted-index
    self-join.  That difference is the whole point of LSH: at 100 TB
    the candidate set is ~duplicates-sized while the co-shingled pair
    set is corpus-quadratic in the hot shingles.
    """
    cands = lsh_candidate_pairs(df, text_col, n, n_hashes, band_size)
    sh = with_shingles(df, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            pinned_round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- SimHash -------------------------------------------------------------


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash over word tokens.

    Token hash = first 4 hex chars of md5(token) as an int; bit b of the
    simhash is 1 iff Σ_tokens (±1 by token-hash bit b) > 0.  16 bits keeps
    every intermediate in plain int arithmetic that DuckDB reproduces
    exactly; widening to 64 bits is the same expression with conv on 16
    hex chars (unsigned-overflow care needed, hence 16 here).
    """
    tok = df.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f\x0b]+")).alias("token"),
    ).filter(F.col("token") != "")
    h16 = F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("int")
    tok = tok.withColumn("h", h16)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("int").alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text", max_hamming: int = 1) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation blocks on the two 8-bit halves: by pigeonhole a
    pair within Hamming distance ≤ 1 agrees exactly on at least one
    half, so blocking on both halves is EXACT for max_hamming=1 (the
    default) with only equi-join shuffles.  For larger radii r, split
    into r+1 bands (same code shape); never a cross join.
    """
    s = simhash16(df, text_col)
    lo = s.withColumn("blk", F.col("simhash").bitwiseAND(0xFF))
    hi = s.withColumn("blk", F.shiftright("simhash", 8).bitwiseAND(0xFF) + 256)
    blocks = lo.unionByName(hi)
    a = blocks.alias("a")
    b = blocks.alias("b")
    pairs = (
        a.join(b, "blk")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- paragraph-level boilerplate dedup ---------------------------------


def paragraph_dedup(
    docs: DataFrame, text_col: str = "text", min_docs: int = 5
) -> DataFrame:
    """CCNet-style cross-corpus paragraph dedup: drop every paragraph
    (``\\n\\n``-separated span) whose hash appears in >= `min_docs`
    distinct documents — the classic boilerplate signature (nav bars,
    subscribe footers, licence blurbs).  Returns one row per document:
    (doc_id, n_paras, n_dropped, kept_chars, cleaned_md5) where
    cleaned_md5 hashes the surviving paragraphs re-joined with
    ``\\n\\n`` in original order.

    Scale shape (the CCNet plan): one shuffle keyed on the paragraph
    hash builds the document-frequency table with map-side combine; the
    boilerplate set (only hashes crossing `min_docs`) is tiny by
    construction — a web corpus has few paragraphs repeated across many
    documents relative to distinct paragraphs — so it broadcasts, and
    the corpus streams through a map-side hash anti-probe.  The rebuild
    is a single groupBy(doc_id) whose payload is the document itself
    (same volume as the scan).  No driver-side state.
    """
    paras = (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col(text_col), r"\n\n")).alias("pos", "para")
        )
        .where(F.trim("para") != "")
        .withColumn("h", F.md5(F.trim(F.col("para"))))
    )
    boiler = (
        paras.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("h", F.lit(True).alias("is_boiler"))
    )
    marked = paras.join(F.broadcast(boiler), "h", "left")
    keep = F.col("is_boiler").isNull()
    kept_struct = F.when(keep, F.struct("pos", "para"))
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias("n_dropped"),
        F.coalesce(F.sum(F.when(keep, F.length("para"))), F.lit(0))
        .cast("long")
        .alias("kept_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    # collect_list skips the NULLs the when() leaves for
                    # dropped paragraphs; array_sort on (pos, para)
                    # restores document order post-shuffle
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["para"],
                ),
                "\n\n",
            )
        ).alias("cleaned_md5"),
    )


# --- duplicated-substring fraction --------------------------------------

SUBSTR_DUP_N = 8
SUBSTR_DUP_MAX_FRAC = 0.2


def substring_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    n: int = SUBSTR_DUP_N,
    min_docs: int = 2,
    max_frac: float = SUBSTR_DUP_MAX_FRAC,
) -> DataFrame:
    """Per-document duplicated-substring exposure (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", the
    NearDup complement to their suffix-array ExactSubstr): the fraction
    of a document's word `n`-gram POSITIONS whose gram also appears in
    >= `min_docs` distinct documents.  Output one row per document with
    >= n words: (doc_id, n_grams, dup_grams, dup_frac 4dp, keep =
    frac <= max_frac).

    Scale shape (two deliberate passes, like paragraph_dedup): pass 1
    reduces the gram-position stream to the cross-document gram set —
    (doc_id, gram) occurrence counts partial-aggregate map-side (every
    position of a gram within one document is in the same input row),
    then a gram-keyed count; only grams crossing `min_docs` survive,
    which is the boilerplate set — small by construction — so it
    broadcasts.  Pass 2 streams the corpus through the broadcast hash
    probe and rolls up per document.  No driver-side state; both
    shuffles are hash-partitioned on high-cardinality keys.
    """
    grams_expr = ", ".join(f"element_at(_tk, i + {k})" for k in range(n))
    positions = F.expr(
        f"transform(filter(sequence(1, size(_tk)), i -> i <= size(_tk) - {n - 1}), "
        f"i -> concat_ws(' ', {grams_expr}))"
    )
    pos = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f\x0b]+").alias("_tk"),
    ).select("doc_id", F.explode(positions).alias("g"))
    per_dg = pos.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    dup = (
        per_dg.groupBy("g")
        .agg(F.count("*").alias("nd"))  # per_dg is distinct per doc
        .where(F.col("nd") >= min_docs)
        .select("g", F.lit(True).alias("is_dup"))
    )
    marked = per_dg.join(F.broadcast(dup), "g", "left")
    total = F.sum("c")
    dup_c = F.coalesce(F.sum(F.when(F.col("is_dup"), F.col("c"))), F.lit(0))
    frac = dup_c / total.cast("double")
    from newscrawler_spark.functions.rounding import pinned_round

    return marked.groupBy("doc_id").agg(
        total.cast("long").alias("n_grams"),
        dup_c.cast("long").alias("dup_grams"),
        pinned_round(frac, 4).alias("dup_frac"),
        (frac <= max_frac).alias("keep"),
    )


# --- Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03) ----

#: frozen explicit ASCII whitespace (the tri-engine contract).
_WS_CLASS = r"[ \t\n\r\f\x0b]+"


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints — the MOSS local fingerprinting
    scheme (Schleimer et al., SIGMOD 2003): hash every token k-gram,
    slide a w-hash window, keep the minimum hash of each window
    (rightmost position on ties — the paper's robust-winnowing rule,
    pinned here as max position among equal minima).  Guarantees every
    shared substring of ≥ k+w-1 tokens yields at least one shared
    fingerprint — the positional contamination/plagiarism detector that
    whole-doc simhash/minhash cannot provide.

    Engine-exact contracts: the frozen ASCII tokenizer, the 60-bit md5
    gram hash (functions/canonical.HASH60_SQL — the url-hash contract
    reused verbatim), and the two-pass tie rule (min hash, then max
    position with that hash) that avoids struct-ordering parity
    assumptions.  A doc with fewer than w grams contributes ONE window
    covering all its grams; a doc with no grams contributes nothing.

    Scale shape: zero shuffle — grams, windows, and selection are all
    array expressions over each document row (whole-stage codegen);
    only the final per-doc DISTINCT of selected (pos, fp) pairs touches
    other rows, and it is doc-local (array_distinct, still no shuffle).
    Expected fingerprint density is 2/(w+1) grams — the output relation
    is a bounded fraction of the token count at any corpus size.

    Output: (doc_id, pos, fp) — pos is the 1-based gram (= token)
    start position of the selected k-gram, fp its 60-bit hash.
    """
    from newscrawler_spark.functions.canonical import url_hash_expr

    arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS_CLASS),
        lambda x: x != "",
    )
    n = F.size(arr)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: url_hash_expr(
                F.array_join(F.slice(arr, i, k), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    d = docs.select(F.col(id_col).alias("doc_id"), grams.alias("g"))
    m = F.size(F.col("g"))

    # Catalyst does not CSE duplicate expression subtrees (CLAUDE.md),
    # and a lambda body is re-evaluated per element — referencing
    # array_min(slice(...)) inside the position filter would recompute
    # the window minimum for every candidate position (O(w²) per
    # window).  Spark has no let-binding, so bind it once per window
    # via a single-element transform: the lambda variable v IS the
    # bound minimum (computed once), and the filter scan is O(w).
    def one_window(j):
        mn = F.array_min(F.slice(F.col("g"), j + 1, w))
        return F.element_at(
            F.transform(
                F.array(mn),
                lambda v: F.struct(
                    F.array_max(
                        F.filter(
                            F.sequence(j + 1, F.least(j + w, m)),
                            lambda p: F.element_at(F.col("g"), p) == v,
                        )
                    ).alias("pos"),
                    v.alias("fp"),
                ),
            ),
            1,
        )

    sel = F.when(
        m > 0,
        F.transform(F.sequence(F.lit(0), F.greatest(m - w, F.lit(0))), one_window),
    ).otherwise(F.array().cast("array<struct<pos:int,fp:bigint>>"))
    return d.select(
        "doc_id", F.explode(F.array_distinct(sel)).alias("s")
    ).select(
        "doc_id",
        F.col("s.pos").cast("long").alias("pos"),
        F.col("s.fp").alias("fp"),
    )


def winnow_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    k: int = 4,
    w: int = 5,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    the contamination/plagiarism candidate report over the fingerprint
    index.  Same sub-quadratic shape as jaccard_candidates: distinct
    (doc, fp) → df cap at ``max_df`` (a boilerplate fingerprint shared
    by everything carries no signal and concentrates one reducer) →
    self equi-join on fp → pair count.  Shuffles key on fp then the
    pair — never O(n²)."""
    # the fingerprint subtree feeds the df cap AND both join sides —
    # Catalyst re-executes unreferenced identical subtrees (CLAUDE.md),
    # so materialize it once (small: ~2/(w+1) of the token count);
    # localCheckpoint blocks are GC-cleaned with the frame
    fps = (
        winnow_fingerprints(docs, k, w, text_col, id_col)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    keep = fps.groupBy("fp").count().filter(F.col("count") <= max_df)
    fps = fps.join(keep.select("fp"), "fp")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def incremental_dedup(
    batch: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental ingestion dedup: admit only batch documents that are
    neither EXACT nor NEAR duplicates of the already-ingested corpus —
    the continuous-pipeline twin of the whole-corpus dedup operators
    (and the dedup analog of embed_missing's anti-join pattern): a
    100 TB pipeline never re-deduplicates the world per batch, it
    probes the new slice against the standing index.

    * exact: md5(text) probed against the existing corpus's DISTINCT
      hash set (at scale: the persisted hash index) — an equi-join on
      the hash, batch-sized build side;
    * near: the batch's LSH bands probed against the EXISTING bands
      (no batch×batch or existing×existing pairs are ever formed),
      candidates verified with true Jaccard computed only for the
      candidate pairs, exactly minhash_near_dups' verify discipline.

    Scale shape: existing-side bands/shingles are corpus-scale but
    shuffle only on their keys (band, shingle); the candidate and
    verify relations are batch-bounded.  At steady state the existing
    bands/hash relations are precomputed tables and each batch costs
    its own size, not the corpus's.

    Output: one row per batch doc — (doc_id, exact_dup, n_near, keep)
    with keep = NOT exact_dup AND n_near = 0.
    """
    b = batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    e = existing.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    eh = e.select(F.md5("text").alias("_h")).distinct().withColumn("_e", F.lit(1))
    exact = (
        b.select("doc_id", F.md5("text").alias("_h"))
        .join(eh, "_h", "left")
        .select("doc_id", F.col("_e").isNotNull().alias("exact_dup"))
    )
    bb = _lsh_bands(b, "text", n, n_hashes, band_size)
    eb = _lsh_bands(e, "text", n, n_hashes, band_size).select(
        F.col("doc_id").alias("exist_id"), "band_id", "band_key"
    )
    cands = bb.join(eb, ["band_id", "band_key"]).select("doc_id", "exist_id").distinct()
    shb = with_shingles(b, "text", n)
    she = with_shingles(e, "text", n).select(
        F.col("doc_id").alias("exist_id"), "shingle"
    )
    sb = shb.groupBy("doc_id").agg(F.count("*").alias("nb"))
    se = she.groupBy("exist_id").agg(F.count("*").alias("ne"))
    shared = (
        cands.join(shb, "doc_id")
        .join(she, ["exist_id", "shingle"])
        .groupBy("doc_id", "exist_id")
        .agg(F.count("*").alias("shared"))
    )
    near = (
        shared.join(sb, "doc_id")
        .join(se, "exist_id")
        .where(
            pinned_round(
                F.col("shared") / (F.col("nb") + F.col("ne") - F.col("shared")), 4
            )
            >= threshold
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_near"))
    )
    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
            (~F.col("exact_dup") & (F.coalesce("n_near", F.lit(0)) == 0)).alias("keep"),
        )
    )


def fuzzy_title_pairs(
    df: DataFrame,
    text_col: str = "text",
    title_len: int = 64,
    max_dist: int = 8,
) -> DataFrame:
    """Record linkage by edit distance — the classic blocked
    fuzzy-match: normalise a "title" (first `title_len` chars of the
    whitespace-collapsed text — the pinned ASCII class, never ``\\s``),
    block on ``(lang, 4-char prefix)``, and keep same-block pairs with
    ``levenshtein(title_a, title_b) <= max_dist``.  Output
    ``(doc_id_a, doc_id_b, dist)`` with ``doc_id_a < doc_id_b``.

    The reference resolves near-identical article titles during
    re-scrape reconciliation (``/root/reference/src/scraper/
    base_scraper.py`` title fallback chain); this is the set-level twin.

    Spark-first shape: the pair generation is an equi self-join on the
    block key — one hash shuffle, no O(n²) stage; the quadratic cost is
    confined within a block (prefix blocking bounds block size the way
    ``max_df`` bounds posting lists).  A necessary-condition length
    filter (``|len_a − len_b| <= max_dist``) prunes before the DP
    distance runs.  ``levenshtein`` is the textbook DP edit distance in
    both engines (JVM codegen in Spark, native in DuckDB) — integer,
    exact, no float in the contract.  The Spark side passes the
    ``threshold`` argument (3.5+): the DP is bounded with early exit,
    returning -1 past ``max_dist``; only pairs ≤ max_dist survive
    either way, so the kept rows and distances are identical to the
    full DP the DuckDB oracle computes, at a fraction of the cost
    (the dominant term of this operator's runtime).
    """
    title = F.regexp_replace(
        F.col(text_col), _WS_CLASS, " "
    ).substr(1, title_len)
    t = df.select(
        F.col("doc_id"),
        F.col("lang"),
        title.alias("title"),
        F.length(title).alias("tlen"),
        title.substr(1, 4).alias("blk"),
    )
    a = t.alias("a")
    b = t.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).where(
        F.abs(F.col("a.tlen") - F.col("b.tlen")) <= max_dist
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.levenshtein(F.col("a.title"), F.col("b.title"), max_dist)
        .cast("long")
        .alias("dist"),
    ).where(F.col("dist") >= 0)
