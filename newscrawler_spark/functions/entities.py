"""Entity extraction heuristic (reference `src/topics/entities.py:18-318`,
which uses spaCy NER — not available here, so a deterministic
capitalized-span heuristic stands in; the Spark plumbing — a pandas UDF
yielding `map<string, array<string>>` like the reference's JSONB
``entities`` column (`src/database/models.py:31`) — is the real part and
a drop-in for a model-backed NER).

Spec: an entity candidate is a maximal run of ≥1 capitalized words
(``[A-Z][a-z]+``) that does not start a sentence; runs of length ≥2 are
typed PERSON, single words ORG (crude, but deterministic and testable).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

_SPAN_RE = re.compile(r"(?:[A-Z][a-z]+)(?:[ \t\n\r\f\x0b]+[A-Z][a-z]+)*")
_SENT_START_RE = re.compile(r"(?:^|[.!?])[ \t\n\r\f\x0b]*(?=[A-Z])")


def extract_entities(text: str) -> dict[str, list[str]]:
    """Frozen heuristic: text → {"PERSON": [...], "ORG": [...]}.

    A span starting at a sentence boundary sheds its first word (the
    capitalization there carries no signal); what survives is typed by
    length (≥2 words → PERSON, 1 → ORG).
    """
    if not text:
        return {"PERSON": [], "ORG": []}
    starts = {m.end() for m in _SENT_START_RE.finditer(text)}
    person, org = [], []
    seen = set()
    for m in _SPAN_RE.finditer(text):
        words = m.group(0).split()
        if m.start() in starts:
            words = words[1:]
        if not words:
            continue
        span = " ".join(words)
        if span in seen:
            continue
        seen.add(span)
        (person if len(words) >= 2 else org).append(span)
    return {"PERSON": person, "ORG": org}


ENTITY_SCHEMA = "doc_id long, entities map<string, array<string>>"


def entities_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, text) → (doc_id, entities map)."""
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "entities": [extract_entities(t) for t in pdf["text"].tolist()],
            }
        )
