"""Daily-ETL job layer — the reference system's core use case
(BASELINE.json: 'Daily ETL system for data pipelines', 'DataFrame batch
transformations + JDBC/Parquet sinks'; reference checkout unavailable,
SURVEY.md §0).

A job is extract (central loader) -> transform (registry-grade DataFrame
expressions) -> load (partitioned parquet and/or JDBC). Jobs are plain
functions so a scheduler (cron/airflow) calls them with a logical date;
idempotency comes from overwrite-by-partition and upsert_parquet.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from base_etl_spark.io import load_tables
from base_etl_spark import sinks


def daily_order_summary(
    spark: SparkSession, sf_dir: str, day: dt.date
) -> DataFrame:
    """One day's order rollup: the canonical incremental-batch transform.
    The o_orderdate predicate prunes at the scan (and, on a
    date-partitioned lake copy, prunes whole partitions)."""
    t = load_tables(spark, sf_dir)
    d0 = F.lit(day.isoformat()).cast("timestamp")
    d1 = F.lit((day + dt.timedelta(days=1)).isoformat()).cast("timestamp")
    orders = t.orders.filter((F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d1))
    return (
        orders.join(t.lineitem, orders.o_orderkey == t.lineitem.l_orderkey, "left")
        .groupBy("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")
        .agg(
            F.count("l_linenumber").alias("n_lines"),
            F.round(
                F.coalesce(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.lit(0.0)),
                2,
            ).alias("revenue"),
        )
    )


def run_daily_job(
    spark: SparkSession,
    sf_dir: str,
    day: dt.date,
    out_path: str,
    jdbc_url: str | None = None,
) -> int:
    """Extract -> transform -> load for one logical date. Parquet is
    partitioned by order date (idempotent overwrite of that partition via
    dynamic partition overwrite); JDBC is plan-assembled when a URL is
    given. Returns the row count written."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = daily_order_summary(spark, sf_dir, day).withColumn(
        "ds", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    out.write.mode("overwrite").partitionBy("ds").parquet(out_path)
    if jdbc_url:
        sinks.build_jdbc_writer(out, jdbc_url, "analytics.daily_order_summary")
    return out.count()


def upsert_parquet(
    spark: SparkSession, existing_path: str, updates: DataFrame, key: str
) -> DataFrame:
    """MERGE-style upsert without a table format: keep existing rows whose
    key is absent from `updates`, union the updates (anti-join + union —
    the v1 emulation; a lakehouse deployment swaps this for Delta/Iceberg
    MERGE INTO with the same semantics)."""
    existing = spark.read.parquet(existing_path)
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)
