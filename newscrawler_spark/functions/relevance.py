"""Relevance scorer — the reference's weighted topic/entity/content
score (``src/topics/relevance.py:40-56`` config, ``:96-175`` formula):

    score = 0.1                                   (base_score)
          + min(n_topics · 0.1, 0.4)              (topic_weight cap)
          + min( min(countries·0.05, 0.15)
               + min(orgs·0.02, 0.10)
               + min(people·0.01, 0.05), 0.3 )    (entity_weight cap)
          + 0.2 · ( 0.4·min(len/1000, 1)
                  + 0.3·min(paras/3, 1)
                  + 0.3·min(sents/10, 1) )        (content_weight)
    capped at 1.0;  is_relevant = score >= 0.3    (min_threshold)

Weights, caps and threshold are the reference's defaults verbatim.
The entity inputs are deterministic, codegen-expressible proxies for
the spaCy counts (same stand-in philosophy as lang_id/topics — the
model-backed extractor lives in functions/entities.py, but the scorer
must stay on the JVM fast path at 100 TB and be DuckDB-mirrorable):

  countries = distinct hits from a country-name bank
  people    = distinct "Xxxx Yyyy" two-word capitalized spans
  orgs      = distinct single capitalized words

Everything is pure column arithmetic; the SQL templates below render
the identical formula for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COUNTRY_BANK = (
    "America", "Germany", "France", "Spain", "China",
    "India", "Japan", "Brazil", "Canada", "Russia",
)
_COUNTRY_RE = r"\b(" + "|".join(COUNTRY_BANK) + r")\b"
_PERSON_RE = r"[A-Z][a-z]+ [A-Z][a-z]+"
_ORG_RE = r"\b[A-Z][a-z]+\b"
_SENT_RE = r"[.!?]+"

MIN_THRESHOLD = 0.3


def _n_distinct(text: Column, pattern: str) -> Column:
    return F.size(F.array_distinct(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))))


def relevance_score(text: Column, n_topics: Column | None = None) -> Column:
    """Relevance in [0, 1], rounded to 4dp (cross-engine stable)."""
    if n_topics is None:
        from .text import topics

        n_topics = F.size(topics(text))
    topic_score = F.least(n_topics * F.lit(0.1), F.lit(0.4))
    countries = _n_distinct(text, _COUNTRY_RE)
    people = _n_distinct(text, _PERSON_RE)
    orgs = _n_distinct(text, _ORG_RE)
    entity_score = F.least(
        F.least(countries * F.lit(0.05), F.lit(0.15))
        + F.least(orgs * F.lit(0.02), F.lit(0.10))
        + F.least(people * F.lit(0.01), F.lit(0.05)),
        F.lit(0.3),
    )
    n_chars = F.length(text)
    paras = F.size(F.split(text, r"\n\n"))
    sents = F.size(F.regexp_extract_all(text, F.lit(_SENT_RE), F.lit(0)))
    content_score = F.lit(0.2) * (
        F.lit(0.4) * F.least(n_chars / F.lit(1000.0), F.lit(1.0))
        + F.lit(0.3) * F.least(paras / F.lit(3.0), F.lit(1.0))
        + F.lit(0.3) * F.least(sents / F.lit(10.0), F.lit(1.0))
    )
    from .rounding import pinned_round

    return pinned_round(
        F.least(F.lit(0.1) + topic_score + entity_score + content_score, F.lit(1.0)), 4
    )


def is_relevant(text: Column, n_topics: Column | None = None) -> Column:
    return relevance_score(text, n_topics) >= F.lit(MIN_THRESHOLD)


# --- DuckDB mirror -------------------------------------------------------
# {col} = the text column; {topics} = an expression for n_topics.

RELEVANCE_SQL = (
    "floor((least(0.1"
    " + least({topics} * 0.1, 0.4)"
    " + least("
    f"     least(len(list_distinct(regexp_extract_all({{col}}, '{_COUNTRY_RE}'))) * 0.05, 0.15)"
    f"   + least(len(list_distinct(regexp_extract_all({{col}}, '{_ORG_RE}'))) * 0.02, 0.10)"
    f"   + least(len(list_distinct(regexp_extract_all({{col}}, '{_PERSON_RE}'))) * 0.01, 0.05)"
    "   , 0.3)"
    " + 0.2 * (0.4 * least(length({col}) / 1000.0, 1.0)"
    "        + 0.3 * least(len(regexp_split_to_array({col}, '\\n\\n')) / 3.0, 1.0)"
    f"       + 0.3 * least(len(regexp_extract_all({{col}}, '{_SENT_RE}')) / 10.0, 1.0))"
    ", 1.0)) * 10000.0 + 0.5) / 10000.0"
)
