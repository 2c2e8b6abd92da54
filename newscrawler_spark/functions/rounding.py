"""Cross-engine-pinned decimal rounding.

``round(x, d)`` on DOUBLE diverges between engines at half boundaries:
Spark re-rounds the value's exact decimal expansion with BigDecimal
HALF_UP, while float engines (DuckDB among them) scale by 10^d and
nearbyint the scaled double — the scaling multiply can land on the
other side of .5 (observed live: ``quality_score`` at sf0.1, 6/5000
rows off by 1e-4, e.g. 0.3153 vs 0.3152).

``floor(x · 10^d + 0.5) / 10^d`` has no such freedom: both engines
evaluate the identical IEEE-754 expression tree bit-for-bit, so every
gate-visible rounded double uses this form — the Spark Column from
:func:`pinned_round`, the SQL string from :func:`pinned_round_sql` —
never bare ``round(x, d)``.  (0-digit rounds of near-integer values,
e.g. the integer-cents money pattern, are safe with plain round:
nothing lands near .5.)

Semantics: round-half-toward-+inf (for the negative-capable cosine
columns this differs from HALF_UP's away-from-zero at exact ties —
irrelevant for cross-engine equality, which only needs both sides to
agree).  Exact for |x·10^d| < 2^53.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pinned_round(col: Column, digits: int = 4) -> Column:
    s = float(10**digits)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def pinned_round_sql(expr: str, digits: int = 4) -> str:
    s = float(10**digits)
    return f"(floor(({expr}) * {s} + 0.5) / {s})"
