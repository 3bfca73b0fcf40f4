"""Unit oracle layer: every declared registry key vs DuckDB at sf0.001
(fast twin of the driver's sf0.01 gate; tools/check.py runs the full SF)."""

from __future__ import annotations

import pytest

from base_etl_spark import queries, oracle_sql
from base_etl_spark.compare import compare_strict
from tests.conftest import SF_TEST

_QS = queries()
_ORACLE = oracle_sql()
DECLARED = sorted(_ORACLE)
ROWS_ONLY = sorted(set(_QS) - set(_ORACLE))


@pytest.mark.parametrize("key", DECLARED)
def test_declared_matches_oracle(key, spark, duck):
    sdf = _QS[key](spark, SF_TEST)
    srows = [tuple(r) for r in sdf.collect()]
    problems = compare_strict(sdf.columns, srows, duck.sql(_ORACLE[key]).df())
    assert not problems, f"{key}: {problems}"


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_runs(key, spark):
    df = _QS[key](spark, SF_TEST)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns


def test_every_key_has_docstring():
    from base_etl_spark.registry import REGISTRY

    missing = [k for k, s in REGISTRY.items() if not s.doc.strip()]
    assert not missing


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
