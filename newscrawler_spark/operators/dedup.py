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

# --- shingling ---------------------------------------------------------


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs: distinct word n-grams of the lowercased,
    whitespace-split text. Pure SQL higher-order functions."""
    shingles = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(split(lower(trim({text_col})), '\\\\s+')) - {n - 1}, 0)), "
            f"i -> concat_ws(' ', slice(split(lower(trim({text_col})), '\\\\s+'), i, {n})))"
        )
    )
    return df.select("doc_id", F.explode(shingles).alias("shingle")).distinct()


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

    shingle explode → (optional df cap) → self equi-join on shingle →
    count shared → |A∪B| = |A|+|B|−shared → filter.  Shuffles are keyed
    on shingle then (doc_a, doc_b); no O(n²) stage.
    """
    sh = with_shingles(df, text_col, n)
    if max_df is not None:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
        sh = sh.join(keep.select("shingle"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "na", "nb", "jaccard")
    )


# --- MinHash + LSH banding ----------------------------------------------


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n: int = 3, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, seed, minhash) — minhash_h(doc) = min over shingles of
    md5(h || ':' || shingle).  md5-as-hash-family keeps the whole
    signature computation in codegen'd exprs AND bit-identical in the
    DuckDB oracle (no engine-specific hash needed)."""
    sh = with_shingles(df, text_col, n)
    seeds = df.sparkSession.range(n_hashes).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.join(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle")))).alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """LSH banding: band_key = md5(concat of the band's minhashes in
    seed order); docs sharing any (band_id, band_key) are candidates."""
    sig = minhash_signatures(df, text_col, n, n_hashes)
    bands = (
        sig.withColumn("band_id", (F.col("seed") / band_size).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.md5(
                F.concat_ws(
                    "|", F.array_sort(F.collect_list(F.concat_ws("=", "seed", "minhash")))
                )
            ).alias("band_key")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
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
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4),
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
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
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
