"""Fuzz-harness regressions (round 5): tools/fuzz_check.py builds a
perturbed copy of sf0.001 (short/unicode/boilerplate docs, exact-boundary
session gaps, duplicate timestamps, hour-edge events, NULL-punched
nullable columns) and compares every declared key driver-strict on it.

Its first two sweeps found 7 latent divergences the per-SF gates could
not see (byte-vs-char frame slicing on multibyte text, argmax ties on
duplicate timestamps, DuckDB array_to_string([]) = NULL, Spark
session_window merging an exact-gap event, NULL-crashing Python UDFs,
NULL-labeled docs training a langid profile, DuckDB raising on ln(0) where
Spark yields NULL). This test re-runs exactly
those keys on the fuzzed data so the fixes stay pinned; the full-surface
fuzz sweep remains a tools/ job (it needs its own Spark session budget).
"""

from __future__ import annotations

import glob

import pytest

FOUND_BY_FUZZ = [
    "mm_frame_stats",
    "agg_argmax",
    "map_funcs",
    "stream_session",
    "udf_scalar",
    "udf_arrow",
    "text_langid_ngram",
    "math_funcs",
    "sample_weighted",  # r6: zero-weight doc -> Spark x/0 NULL sorted FIRST
]


@pytest.fixture(scope="module")
def fuzz_sf():
    from tools.fuzz_check import FUZZ_SF, build_fuzz_dir

    build_fuzz_dir(with_nulls=True)
    return FUZZ_SF


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_sf):
    import duckdb

    con = duckdb.connect()
    for p in glob.glob(f"{fuzz_sf}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("key", FOUND_BY_FUZZ)
def test_fuzzed_key_matches_oracle(key, spark, fuzz_sf, fuzz_duck):
    from base_etl_spark import oracle_sql, queries
    from base_etl_spark.compare import compare_strict

    sdf = queries()[key](spark, fuzz_sf)
    srows = [tuple(r) for r in sdf.collect()]
    problems = compare_strict(
        sdf.columns, srows, fuzz_duck.sql(oracle_sql()[key]).df()
    )
    assert not problems, f"{key}: {problems}"


def test_division_by_zero_is_null_not_ieee(spark):
    """Pins the engine behavior sample_weighted's zero-weight exclusion
    relies on: Spark SQL division by zero yields NULL for DOUBLES too
    (non-ANSI mode), not IEEE inf/NaN — and NULL sorts FIRST ascending,
    so an unguarded ratio ORDER BY silently promotes exactly the rows a
    weight of zero says to never select. If either behavior changes
    (ANSI default flip, NULL ordering), the exclusion rationale must be
    revisited."""
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        (F.lit(1.0) / F.lit(0.0)).alias("d"),
        (F.lit(0.0) / F.lit(0.0)).alias("z"),
    ).first()
    assert row.d is None and row.z is None
    ordered = (
        spark.createDataFrame([(1.0,), (None,)], "x double")
        .orderBy("x")
        .collect()
    )
    assert ordered[0].x is None  # NULLS FIRST ascending
