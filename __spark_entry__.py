"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship star-join query at sf0.001 (smoke).
queries()     -> every implemented SURVEY §2 operator, one callable each.
oracle_sql()  -> matching DuckDB SQL per declared key (rows-only keys —
                 hash-seeded sketches, UDF surface demos — are omitted and
                 get the driver's weaker rows-only check).

Implementation lives in base_etl_spark/; the registry guarantees a key
can never exist on one side only (base_etl_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import base_etl_spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shaped star join) on /root/testdata/sf0.001."""
    # the driver passes its own session; engine configs that matter for
    # reading the fixtures (nanosAsLong is set by the driver's harness or
    # build_session in ours) — events isn't touched by the flagship query.
    qs = base_etl_spark.queries()
    return qs["join_star_q5"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return base_etl_spark.queries()


def oracle_sql() -> dict[str, str]:
    return base_etl_spark.oracle_sql()
