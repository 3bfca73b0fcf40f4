"""Python DataSource API (Spark 4): a custom source implemented entirely
in Python and registered into the session's source registry — the
engine-surface answer to "read from a system Spark has no connector for"
(internal REST feeds, proprietary tick formats, bespoke queues) without
writing a JVM DataSource V2.

The demo source is DETERMINISTIC so the driver can hold the whole path
to a closed-form DuckDB oracle: partition p of P emits rows
id = p, p+P, p+2P, ... < total (round-robin striping, so skew-free by
construction) with val = (id*id) % 997 — order-insensitive, no RNG, no
clock. What the key certifies is the plumbing: partition planning on the
driver, per-partition Python readers on executors, Arrow hand-off, and
the aggregate over the result.

At 100 TB the same skeleton holds: partitions() returns one split per
shard/file/offset-range of the remote system, read(split) streams that
shard; Spark parallelizes across executors exactly as it does here.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from base_etl_spark.io import Tables
from base_etl_spark.registry import query

_TOTAL = 10_000
_PARTS = 8


class _SynthPartition(InputPartition):
    def __init__(self, pid: int):
        self.pid = pid


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.total = int(options.get("total", _TOTAL))
        self.parts = int(options.get("parts", _PARTS))

    def partitions(self):
        return [_SynthPartition(p) for p in range(self.parts)]

    def read(self, partition):
        # round-robin stripe: partition p owns ids ≡ p (mod parts)
        for i in range(partition.pid, self.total, self.parts):
            yield (i, (i * i) % 997)


class SynthSource(DataSource):
    """`spark.read.format("synthrange")` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthrange"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def reader(self, schema) -> SynthReader:
        return SynthReader(self.options)


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT i % 5                                   AS bucket,
           CAST(count(*) AS BIGINT)                AS n_rows,
           CAST(sum((i * i) % 997) AS BIGINT)      AS total_val,
           CAST(max((i * i) % 997) AS BIGINT)      AS max_val
    FROM (SELECT unnest(generate_series(0, {_TOTAL - 1})) AS i)
    GROUP BY i % 5
    """,
)
def scan_python_datasource(t: Tables) -> DataFrame:
    """Custom Python DataSource end to end, driver-checked: the source
    is registered (idempotently) into the session, read through the
    normal `spark.read.format(...)` path — 8 driver-planned partitions,
    each materialized by a Python reader on an executor — and
    aggregated; the oracle recomputes the closed form with
    generate_series, fully independent of the source code path.

    Python sources are the INGEST boundary tier: rows cross the
    Python→JVM hand-off once at the edge (this source declares no
    pushdown, so filters run JVM-side after materialization); convert
    to parquet immediately at scale, exactly like the CSV/text
    sources."""
    spark = t.spark
    try:
        spark.dataSource.register(SynthSource)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("synthrange").load()
    return df.groupBy((F.col("id") % 5).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("total_val"),
        F.max("val").cast("long").alias("max_val"),
    )


class _SinkCommit(WriterCommitMessage):
    """Per-task commit message: the file the task wrote and its row
    count — what the driver-side commit() aggregates into a manifest."""

    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    """Per-partition Python writer: rows stream to one JSON-lines file
    per task (write happens ON THE EXECUTOR), named by partition id +
    task attempt so speculative retries cannot collide; the driver-side
    commit publishes a manifest naming exactly the committed files —
    the same two-phase rename-free protocol cloud committers use."""

    def __init__(self, path: str, schema_names: list[str]):
        self.path = path
        self.names = schema_names

    def write(self, iterator):
        import json as _json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        out = os.path.join(self.path, f"part-{pid:05d}-{attempt}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                f.write(_json.dumps(dict(zip(self.names, row))) + "\n")
                n += 1
        return _SinkCommit(out, n)

    def commit(self, messages):
        import json as _json
        import os

        manifest = {
            "files": sorted(m.path for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            f.write(_json.dumps(manifest))

    def abort(self, messages):
        import os

        # Unfinished/failed tasks surface as None entries in the
        # DataSourceWriter protocol — guard them so abort cleans up the
        # committed files instead of raising and masking the original
        # task failure.
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSink(DataSource):
    """`df.write.format("jsonlsink").option("path", dir)` after
    registration — the WRITE half of the Python DataSource surface
    (SynthSource is the read half): a sink for systems Spark has no
    connector for, implemented entirely in Python. Verified by a
    pytest round-trip (tests/test_sinks.py): write -> manifest row
    count == source count -> read back == source aggregate. S-row
    (engine surface): a sink is not a driver-checkable query."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> str:  # pragma: no cover - required by the ABC
        return "id bigint"

    def writer(self, schema, overwrite: bool):
        return JsonlSinkWriter(self.options["path"], list(schema.names))
