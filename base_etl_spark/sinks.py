"""Sinks (SURVEY §2.1 S-rows): parquet / CSV / JSON / JDBC writers.

Engine policy for 100 TB writes:
- parquet is the default interchange: partitionBy on a date-ish column so
  downstream reads get static + dynamic partition pruning; target file
  sizes via repartition(n) before write, never coalesce(1).
- bucketing (write_bucketed) pre-shuffles fact tables by join key so
  later fact-fact joins are co-located (no exchange at read time).
- JDBC batches through numPartitions concurrent connections; the fixture
  environment has no database, so build_jdbc_writer only assembles the
  plan (unit-tested); .save() is the caller's act.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameWriter
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Partitioned parquet sink. partition_by columns should be
    low-cardinality (date, region); high-cardinality partitioning
    produces the small-files problem at scale."""
    if target_partitions:
        df = df.repartition(target_partitions, *(partition_by or []))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header; explicit nullValue so round-trips preserve
    NULL vs empty-string."""
    df.write.mode(mode).option("header", "true").option("nullValue", "\\N").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 64
) -> None:
    """Bucketed managed table: pre-shuffles by bucket_col so future joins
    and aggs on that key read co-located data with NO exchange. This is
    the at-scale answer for repeated fact-fact joins (orders x lineitem
    on orderkey)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def build_jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrameWriter:
    """Assemble (without executing) the JDBC batch sink: the reference
    class's 'DataFrame batch transformations + JDBC sink' target
    (BASELINE.json:7). numPartitions bounds concurrent connections;
    batchsize amortizes round trips. Caller runs .save()."""
    df = df.repartition(num_partitions)
    w = (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("numPartitions", str(num_partitions))
        .option("isolationLevel", "READ_COMMITTED")
    )
    for k, v in (properties or {}).items():
        w = w.option(k, v)
    return w


def read_csv(spark, path: str, schema) -> DataFrame:
    """CSV source with explicit schema (never inferSchema at scale — it
    costs a full extra pass)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_json(spark, path: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
