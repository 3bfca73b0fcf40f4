"""Hypothesis laws for the verification kernel itself
(base_etl_spark/compare.py).

Every correctness claim in this repo flows through compare_strict — the
local replica of the driver's type-tagged multiset hash — so a bug there
silently greens a broken operator (or reds a working one). These laws pin
the kernel's contract: equality must be invariant to row order and column
order (the driver sorts both), sensitive to any single-cell change that
crosses a value or type family, and must honor the documented coercion
semantics (float NaN is SQL NULL, -0.0 collapses to 0.0, int64 6 is NOT
float64 6.0). Pure pandas — no Spark session, so the file runs in
milliseconds.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from base_etl_spark.compare import compare_strict, frame_to_multiset

# Cell values spanning the type families the fixtures actually produce.
# NaN/inf floats are exercised by dedicated laws below, not the generator
# (NaN means SQL NULL by contract, so it would alias with None here).
_cell = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=8),
    st.booleans(),
    st.none(),
)


@st.composite
def frames(draw):
    ncols = draw(st.integers(min_value=1, max_value=4))
    nrows = draw(st.integers(min_value=0, max_value=8))
    cols = [f"c{i}" for i in range(ncols)]
    rows = [tuple(draw(_cell) for _ in cols) for _ in range(nrows)]
    return cols, rows


def _df(cols, rows):
    return pd.DataFrame(rows, columns=cols)


@settings(max_examples=200, deadline=None)
@given(frames())
def test_reflexive(cr):
    cols, rows = cr
    assert compare_strict(cols, rows, _df(cols, rows)) == []


@settings(max_examples=200, deadline=None)
@given(frames(), st.randoms(use_true_random=False))
def test_row_and_column_permutation_invariant(cr, rnd):
    cols, rows = cr
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    perm = list(range(len(cols)))
    rnd.shuffle(perm)
    pcols = [cols[i] for i in perm]
    prows = [tuple(r[i] for i in perm) for r in shuffled]
    assert compare_strict(cols, rows, _df(pcols, prows)) == []


@settings(max_examples=200, deadline=None)
@given(frames(), st.data())
def test_single_cell_change_detected(cr, data):
    cols, rows = cr
    if not rows:
        return
    i = data.draw(st.integers(min_value=0, max_value=len(rows) - 1))
    j = data.draw(st.integers(min_value=0, max_value=len(cols) - 1))
    old = rows[i][j]
    new = data.draw(_cell.filter(lambda v: _distinct(v, old)))
    mutated = [
        tuple(new if (r == i and c == j) else row[c] for c in range(len(cols)))
        for r, row in enumerate(rows)
    ]
    # The mutated value may coincide with another row's tuple only by
    # changing the multiset; a genuinely different multiset must be caught.
    if frame_to_multiset(_df(cols, rows)) != frame_to_multiset(_df(cols, mutated)):
        assert compare_strict(cols, rows, _df(cols, mutated)) != []


def _distinct(a, b):
    """True when a and b must occupy different (family, value) tags."""
    if a is None or b is None:
        return (a is None) != (b is None)
    if type(a) is not type(b):
        return True  # int 6 vs float 6.0 vs "6" vs True are all distinct tags
    if isinstance(a, float):
        return not (a == b or (a == 0.0 and b == 0.0))
    return a != b


def test_int_is_not_float_of_same_value():
    assert compare_strict(["v"], [(6,)], pd.DataFrame({"v": [6.0]})) != []


def test_float_nan_is_sql_null():
    # pandas renders SQL NULL in a float64 column as NaN; the kernel must
    # treat that as the NULL family, matching a Spark-side None.
    assert compare_strict(["v"], [(None,)], pd.DataFrame({"v": [float("nan")]})) == []


def test_negative_zero_collapses():
    assert compare_strict(["v"], [(-0.0,)], pd.DataFrame({"v": [0.0]})) == []
    assert math.copysign(1, -0.0) == -1  # the literal really was -0.0


def test_rowcount_mismatch_detected():
    assert compare_strict(["v"], [(1,)], pd.DataFrame({"v": [1, 1]})) != []


def test_column_name_mismatch_detected():
    assert compare_strict(["a"], [(1,)], pd.DataFrame({"b": [1]})) != []


def test_duplicate_multiplicity_matters():
    # {1, 1, 2} vs {1, 2, 2}: same row count, same distinct values —
    # only the multiset multiplicity differs.
    assert (
        compare_strict(["v"], [(1,), (1,), (2,)], pd.DataFrame({"v": [1, 2, 2]}))
        != []
    )
