"""Result-set comparison used by tools/check.py and the pytest oracle
layer: row count + column-name set + order-insensitive multiset of
normalized values (strictest local stand-in for the driver's value-hash).
"""

from __future__ import annotations

import datetime as dt
import math


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return int(v)
    return v


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def compare_results(scols, srows, dcols, drows) -> list[str]:
    """Returns a list of problems (empty == match)."""
    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(drows)}")
    if not problems:
        sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
        if sm != dm:
            diffs = [(a, b) for a, b in zip(sm, dm) if a != b]
            problems.append(
                f"{len(diffs)} value diffs; first: {diffs[0] if diffs else '?'}"
            )
    return problems
