"""Shared scalar helpers used by operators AND their oracle SQL.

Cross-engine double rounding: Spark's round() is BigDecimal HALF_UP on
the double's exact binary expansion; DuckDB's round() works on x*100 —
they disagree on values whose expansion straddles a .xx5 boundary
(measured: 118/60000 lineitem revenue values). For *per-row* computed
values, where both engines hold bit-identical input doubles, the
floor(x*s + 0.5)/s form is bit-exact across engines because every step
(multiply, add, floor, divide) is an IEEE operation on identical
operands. Aggregated values keep plain round() — their inputs already
differ in the last ulps, and the 2dp rounding absorbs that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column | str, scale: int = 2) -> Column:
    """Deterministic cross-engine rounding for per-row doubles."""
    c = F.col(col) if isinstance(col, str) else col
    s = float(10**scale)
    return F.floor(c * s + F.lit(0.5)) / F.lit(s)


def money_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-side twin of :func:`money`."""
    s = float(10**scale)
    return f"floor(({expr}) * {s} + 0.5) / {s}"
