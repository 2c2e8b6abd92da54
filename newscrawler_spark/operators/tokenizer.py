"""Tokenizer-fitting statistics: the BPE merge-candidate count.

Training a BPE tokenizer (Sennrich et al. 2016) over a 100 TB corpus
starts with exactly one distributed job: count adjacent symbol pairs
across the word-frequency table and take the most frequent pair (the
first merge).  Every subsequent merge re-runs the same count over a
vocabulary that is already reduced to distinct words, so the expensive
corpus pass happens ONCE — the shape implemented here:

* pass 1: explode words, groupBy(word) count — the only corpus-scale
  shuffle, hash-partitioned on the word with map-side combine (the
  classic word-count reduction, AQE-splittable if a stopword dominates);
* pass 2: per DISTINCT word, explode its adjacent character pairs
  (plus the terminal ``</w>`` end-of-word symbol) weighted by the word
  count, and aggregate — this shuffle is vocabulary-sized (millions of
  rows), not corpus-sized, regardless of input scale;
* top-k by (count, pair) with a full deterministic tiebreak — planned
  as TakeOrderedAndProject, no global sort.

Reference parity: the reference has no tokenizer job; this is part of
the LLM-training-pipeline surface (brief: "operations a large-scale
training-data pipeline would need").  Whitespace is the frozen explicit
ASCII class (see functions/extract.py) — never ``\\s``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"[ \t\n\r\f\x0b]+"

#: end-of-word marker appended to every word's symbol stream, so that
#: merges can distinguish word-final from word-internal contexts.
BPE_EOW = "</w>"
BPE_TOPK = 50

# Adjacent symbol pairs of one word as a struct array: for i in
# 1..len(w), pair (char_i, char_{i+1}), with the last right side the
# end-of-word marker.  substring() is character-based in both Spark and
# DuckDB, so the oracle mirrors this expression verbatim.
_PAIRS_EXPR = (
    "transform(sequence(1, length(w)), i -> struct("
    "substring(w, i, 1) AS a, "
    f"CASE WHEN i = length(w) THEN '{BPE_EOW}' ELSE substring(w, i + 1, 1) END AS b))"
)


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", topk: int = BPE_TOPK
) -> DataFrame:
    """Top-``topk`` adjacent symbol-pair counts over the corpus — the
    BPE merge-candidate table (the argmax row is merge #1).

    Output: (left_sym, right_sym, pair_count), ordered by count desc
    then pair, deterministically tie-broken.
    """
    words = docs.select(
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _WS)
        ).alias("w")
    ).where(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count("*").cast("long").alias("cnt"))
    pairs = wc.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "cnt")
    return (
        pairs.groupBy(
            F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
        )
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(topk)
    )
