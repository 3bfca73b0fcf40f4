"""Sinks (SURVEY §2.1 S-rows): parquet / CSV / JSON / JDBC writers.

Engine policy for 100 TB writes:
- parquet is the default interchange: partitionBy on a date-ish column so
  downstream reads get static + dynamic partition pruning; target file
  sizes via repartition(n) before write, never coalesce(1).
- bucketing (write_bucketed) pre-shuffles fact tables by join key so
  later fact-fact joins are co-located (no exchange at read time).
- JDBC batches through numPartitions concurrent connections; executed
  round-trips are tested against embedded Derby (bundled in Spark's
  jars), and jdbc_delete_where supplies the delete half of
  replay-idempotent delete+append loads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, DataFrameWriter
from pyspark.sql import functions as F

from base_etl_spark import schemas
from base_etl_spark.io import Tables
from base_etl_spark.registry import query


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
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Bucketed table: pre-shuffles by bucket_col so future joins and
    aggs on that key read co-located data with NO exchange. This is the
    at-scale answer for repeated fact-fact joins (orders x lineitem on
    orderkey). With `path` the table is external (data at an absolute
    location, independent of the session's warehouse dir / cwd);
    bucket metadata always lives in the catalog."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


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


def jdbc_delete_where(
    spark, url: str, table: str, predicate: str,
    properties: dict[str, str] | None = None,
) -> bool:
    """Execute ``DELETE FROM table WHERE predicate`` through the JVM's
    DriverManager — Spark's JDBC source cannot DELETE, and this is the
    replay half of overwrite-by-partition for database sinks (delete the
    logical date's rows, then append the recomputed ones).

    Returns False without deleting if the table does not exist yet (first
    run); any other database error propagates. One driver-side statement —
    the deleted predicate is a partition key (e.g. ds='2024-01-01'), so
    the DB does an index/partition delete, not a scan per executor."""
    jvm = spark._jvm
    props = properties or {}
    if props.get("driver"):
        jvm.java.lang.Class.forName(props["driver"])
    if "user" in props:
        conn = jvm.java.sql.DriverManager.getConnection(
            url, props["user"], props.get("password", "")
        )
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            try:  # existence probe: cheap, portable, no metadata dialects
                st.executeQuery(f"SELECT 1 FROM {table} WHERE 1=0").close()
            except Exception:
                return False  # table absent — nothing to delete
            st.executeUpdate(f"DELETE FROM {table} WHERE {predicate}")
            return True
        finally:
            st.close()
    finally:
        conn.close()


def read_jdbc(
    spark,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """JDBC source — the read twin of build_jdbc_writer, so the engine
    surface covers both halves of the reference class's database leg
    (BASELINE.json:7 'DataFrame batch transformations + JDBC').

    ``table`` may be a bare table name or a pushdown subquery
    ``"(SELECT ... ) t"``. Without a partition_column the read is ONE
    connection on one executor — fine for dims, a bottleneck for facts;
    with (partition_column, lower/upper bound, num_partitions) Spark
    issues num_partitions range-bounded queries in parallel. At 100 TB
    the bounds come from a cheap MIN/MAX probe and num_partitions is
    sized to what the database can serve concurrently, not the cluster
    size."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        r = r.option(k, v)
    return r.load()


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


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _derived_path(sf_dir: str, name: str) -> str:
    """Deterministic scratch location for derived-format fixture copies,
    namespaced by scale-factor directory so sf0.001/sf0.01 runs never
    collide. Lives inside the repo (gitignored) — the sandbox forbids
    writes elsewhere."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_REPO_ROOT, ".derived", sf_tag, name)


def _source_fingerprint(sf_dir: str, *tables: str) -> str:
    """Cheap content-state key for fixture sources: (size, mtime_ns) of
    each source parquet file. Strictly stronger than a row count — it
    catches fixture regeneration that happens to preserve row count
    (re-seeded data, schema tweaks, dirty-CSV edits) — and cheaper: a
    stat() instead of a Spark count() job per invocation."""
    parts = []
    for name in tables:
        p = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{name}:absent")
    return "|".join(parts)


def _ensure_derived(path: str, state_key: str, build) -> None:
    """Materialize a derived layout at most once per source state.

    Repeated invocations (bench loops, the driver's warm runs, parallel
    test sessions) previously rewrote the same shared path every time —
    charging the rewrite to whichever query ran it and racing when two
    sessions hit one path concurrently. Three guarantees:

    - **Reuse keyed on source content**, not row count: ``state_key``
      carries the source files' size+mtime fingerprint
      (``_source_fingerprint``), so a regenerated fixture with the same
      row count still triggers a rebuild.
    - **Single builder**: an O_EXCL lock file serializes concurrent
      sessions; losers poll for the winner's marker instead of
      double-building. Staleness is judged by the LOCK FILE's own mtime
      age (not the waiter's wait time), and a stale unlink re-enters the
      O_EXCL race instead of assuming ownership — so two waiters that
      both see a dead builder's lock cannot both steal it and build
      concurrently.
    - **Atomic data swap**: ``build(tmp_path)`` writes into a scratch
      directory which is renamed over the target, so a reader never sees
      a half-written layout — at worst a briefly missing directory, which
      fails loudly. The ``.done`` marker is itself written atomically
      AFTER the swap."""
    import shutil
    import time as _time

    marker = path + ".done"

    def _fresh() -> bool:
        try:
            with open(marker) as f:
                return f.read() == state_key
        except OSError:
            return False

    if _fresh():
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lock = path + ".lock"

    def _lock_owner_dead() -> bool:
        # The lock records its owner's pid; a recorded pid that still
        # exists means the builder is LIVE no matter how old the lock is
        # (a >300 s legitimate build must not get its lock stolen and its
        # scratch dir rmtree'd mid-write). Unreadable/empty/foreign
        # content falls back to age-only staleness.
        try:
            with open(lock) as f:
                pid = int(f.read().strip() or "0")
        except (OSError, ValueError):
            return True  # vanished or unparseable — age check governs
        if pid <= 0:
            return True
        try:
            os.kill(pid, 0)
            return False  # owner process exists
        except ProcessLookupError:
            return True
        except PermissionError:
            return False  # exists, owned by another user

    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            _time.sleep(0.2)
            if _fresh():
                return
            try:
                # stale = the LOCK ITSELF is old (builder died) AND its
                # recorded owner pid is gone; a live builder keeps its
                # lock however long the build takes. The absolute
                # ceiling defeats pid reuse: if a crashed builder's pid
                # was recycled by an unrelated long-lived process,
                # _lock_owner_dead stays False forever — but no
                # legitimate fixture build runs for hours, so a lock
                # that old is stolen regardless of pid liveness.
                age = _time.time() - os.stat(lock).st_mtime
                if age > 4 * 3600 or (age > 300 and _lock_owner_dead()):
                    os.unlink(lock)
                    # no ownership claimed: loop back into the O_EXCL
                    # race so at most one stealer wins
            except OSError:
                pass  # lock vanished — re-enter the race
    try:
        if _fresh():  # another session built it while we waited
            return
        # prune scratch dirs left by DEAD builders of any pid (a killed
        # build would otherwise leak its multi-MB tmp dir forever); safe
        # under the lock — no live builder exists besides us
        import glob as _glob

        for orphan in _glob.glob(path + ".build*"):
            shutil.rmtree(orphan, ignore_errors=True)
        tmp = f"{path}.build{os.getpid()}"
        build(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        mtmp = f"{marker}.tmp{os.getpid()}"
        with open(mtmp, "w") as f:
            f.write(state_key)
        os.replace(mtmp, marker)
    finally:
        # ownership-checked release: unlink only OUR lock — if a (buggy
        # or misjudged) stealer replaced it, freeing the stealer's lock
        # here would admit a third concurrent builder
        try:
            with open(lock) as f:
                if f.read().strip() == str(os.getpid()):
                    os.unlink(lock)
        except OSError:
            pass


def read_derived(spark, path: str, schema) -> DataFrame:
    """Explicit-schema read of a derived parquet layout.

    A PARTITIONED write of a zero-row frame emits no part files at all
    (only the directory and marker), and a bare ``spark.read.parquet``
    then raises UNABLE_TO_INFER_SCHEMA — the classic production failure
    when an upstream filter eliminates every row of a partition. The
    schema is driver-side metadata captured from the build-time
    DataFrame, so passing it costs nothing and the read degrades to an
    empty frame of the right shape instead of an outage. (Unpartitioned
    empty writes still produce one footer-bearing part file and would
    infer fine; the explicit schema is the uniform safe pattern.)"""
    return spark.read.schema(schema).parquet(path)


def _ensure_orders_by_year(t: Tables):
    """The shared year-partitioned orders layout (scan_partitioned_pruned
    reads it with a literal filter; join_dpp_runtime with a dim-driven
    runtime filter). ONE definition so the two queries can never disagree
    about the path, fingerprint, partition column, or read schema.
    Returns ``(path, schema)`` — readers must pass the schema through
    ``read_derived`` (see there for the empty-layout rationale)."""
    path = _derived_path(t.sf_dir, "orders_by_year")
    layout = t.orders.withColumn("o_year", F.year("o_orderdate"))
    _ensure_derived(
        path,
        _source_fingerprint(t.sf_dir, "orders"),
        lambda p: write_parquet(layout, p, partition_by=["o_year"]),
    )
    return path, layout.schema


@query(
    "scan_csv_agg",
    oracle="""
    SELECT c_mktsegment,
           count(*)                          AS n,
           count(DISTINCT c_nationkey)       AS n_nations,
           round(sum(c_acctbal), 2)          AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def scan_csv_agg(t: Tables) -> DataFrame:
    """CSV source, driver-checked end to end: the parquet customer table
    is written to CSV (header, explicit nullValue) and read back through
    read_csv with the declared schema, then aggregated; the oracle runs
    the same aggregate on the ORIGINAL parquet — so the check covers the
    full write->parse->type round trip (quoting, null marker, shortest
    double repr), not just that the reader runs.

    Scale notes: the reader takes an explicit schema (inferSchema costs a
    full extra pass), and CSV splits by line so reads parallelize; CSV is
    an ingestion format here — no pushdown or column pruning, convert to
    parquet at the lake edge."""
    path = _derived_path(t.sf_dir, "customer_csv")
    write_csv(t.customer, path)
    df = read_csv(t.spark, path, schemas.CUSTOMER)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "scan_json_agg",
    oracle="""
    SELECT p_brand,
           count(*)                          AS n,
           max(p_size)                       AS max_size,
           round(avg(p_retailprice), 2)      AS avg_price
    FROM part
    GROUP BY p_brand
    """,
)
def scan_json_agg(t: Tables) -> DataFrame:
    """JSON-lines source, driver-checked end to end: part -> JSON ->
    read_json with the declared schema -> aggregate, oracled against the
    original parquet (same protocol as scan_csv_agg; doubles survive via
    shortest-repr round trip).

    Scale notes: JSON-lines splits by line (parallel reads) but parses
    every byte of every record — explicit schema avoids the inference
    pass, and nothing pushes down; like CSV it is an edge-ingestion
    format to be converted to parquet once."""
    path = _derived_path(t.sf_dir, "part_json")
    write_json(t.part, path)
    df = read_json(t.spark, path, schemas.PART)
    return df.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("p_size").alias("max_size"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
    )


def _sf_tag(sf_dir: str) -> str:
    return (os.path.basename(os.path.normpath(sf_dir)) or "sf").replace(".", "_")


@query(
    "scan_partitioned_pruned",
    oracle="""
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE year(o_orderdate) = 1997
    GROUP BY o_orderpriority
    """,
)
def scan_partitioned_pruned(t: Tables) -> DataFrame:
    """Partitioned-parquet lake layout, driver-checked end to end: orders
    is written partitioned by derived o_year, read back, and filtered on
    the partition column — the filter resolves at PLANNING time against
    directory names (PartitionFilters, plan-asserted), so non-matching
    years are never opened, let alone scanned. The oracle runs the same
    aggregate on the ORIGINAL un-partitioned parquet, so the check covers
    the partitioned write -> hive-style directory discovery -> pruned
    read round trip.

    At 100 TB this is THE table layout decision: a year/date partition
    key turns every time-bounded query from a full scan into a touched-
    partition scan. Low-cardinality keys only (a high-cardinality
    partition key is the small-files anti-pattern)."""
    path, schema = _ensure_orders_by_year(t)
    pruned = read_derived(t.spark, path, schema).filter(F.col("o_year") == 1997)
    return pruned.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed_colocated(t: Tables) -> DataFrame:
    """Bucketed fact-fact join, driver-checked: both orders and lineitem
    are written as tables bucketed (and sorted) on the join key, then
    joined back — the bucket metadata lets Spark plan a sort-merge join
    with NO shuffle exchange on either side (plan-asserted with broadcast
    disabled in tests). The oracle joins the ORIGINAL parquet, so the
    check certifies the bucketed write -> catalog read -> co-located join
    round trip.

    At 100 TB this is the amortization play for repeated fact-fact joins:
    pay the orderkey shuffle ONCE at write time, then every subsequent
    join/agg on that key reads co-located, pre-sorted buckets. Bucket
    count sizes the parallelism (here 8; production: match target
    partition size)."""
    tag = _sf_tag(t.sf_dir)
    orders_tbl, lineitem_tbl = f"be_orders_bkt_{tag}", f"be_lineitem_bkt_{tag}"
    # the bucketed write is the once-per-layout amortized cost — memoized
    # on the session catalog so repeated invocations (bench warm loops)
    # measure the co-located JOIN, not a re-shuffle-and-rewrite
    if not t.spark.catalog.tableExists(orders_tbl):
        write_bucketed(
            t.orders.select("o_orderkey", "o_orderstatus"), orders_tbl, "o_orderkey", 8,
            path=_derived_path(t.sf_dir, "orders_bkt"),
        )
    if not t.spark.catalog.tableExists(lineitem_tbl):
        write_bucketed(
            t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
            lineitem_tbl,
            "l_orderkey",
            8,
            path=_derived_path(t.sf_dir, "lineitem_bkt"),
        )
    o = t.spark.table(orders_tbl)
    li = t.spark.table(lineitem_tbl)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_dpp_runtime",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE year(o_orderdate) >= 2000
    GROUP BY o_orderpriority
    """,
)
def join_dpp_runtime(t: Tables) -> DataFrame:
    """Dynamic partition pruning (DPP), driver-checked: the fact side is
    the year-partitioned orders layout; the dimension is a small year
    table carrying an `era` attribute the planner cannot constant-fold.
    Filtering the dimension on era='modern' and joining on the partition
    column makes Spark inject a runtime `dynamicpruningexpression` into
    the fact scan's PartitionFilters (plan-asserted): the qualifying
    years are discovered by executing the broadcast dim side first, and
    only those partitions are ever read.

    This is the second half of the partition-layout story: static
    pruning (scan_partitioned_pruned) covers literal predicates; DPP
    covers the star-join case where the selective predicate lives on the
    dimension — at 100 TB the difference between scanning 25 years and 2.
    """
    fact_path, fact_schema = _ensure_orders_by_year(t)
    src_key = _source_fingerprint(t.sf_dir, "orders")
    dim_path = _derived_path(t.sf_dir, "year_dim")
    years = (
        t.orders.select(F.year("o_orderdate").alias("year"))
        .distinct()
        .withColumn("era", F.when(F.col("year") >= 2000, "modern").otherwise("classic"))
    )
    _ensure_derived(dim_path, src_key, lambda p: write_parquet(years, p))
    fact = read_derived(t.spark, fact_path, fact_schema)
    dim = t.spark.read.parquet(dim_path).filter(F.col("era") == "modern")
    return (
        fact.join(F.broadcast(dim), fact.o_year == dim.year)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "etl_compaction",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def etl_compaction(t: Tables) -> DataFrame:
    """Small-files compaction, driver-checked: lineitem is first written
    deliberately fragmented (repartition(64) → 64 tiny files — the state
    every streaming/incremental ingest drifts into), then compacted by
    reading the fragments and rewriting at repartition(4). The returned
    aggregate reads the COMPACTED copy; the oracle reads the original
    parquet — so the hash certifies the fragment→compact rewrite lost and
    duplicated nothing. tests assert the file-count contract (64 → 4).

    At 100 TB small files are a top-3 operational killer: every file
    costs a task + a footer read + a metadata entry; compaction restores
    scan throughput. Production sizing: target ~128 MB–1 GB per file
    (spark.sql.files.maxPartitionBytes-aligned); repartition — never
    coalesce(1) — keeps the write itself parallel."""
    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"]
    frag = _derived_path(t.sf_dir, "lineitem_fragmented")
    t.lineitem.select(*cols).repartition(64).write.mode("overwrite").parquet(frag)
    compact = _derived_path(t.sf_dir, "lineitem_compacted")
    t.spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compact)
    return (
        t.spark.read.parquet(compact)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN year(o_orderdate) >= 1999 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_channel,
           count(DISTINCT CASE WHEN year(o_orderdate) >= 1999
                               THEN o_orderpriority END) AS n_channels
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scan_schema_evolution(t: Tables) -> DataFrame:
    """Schema evolution across parquet generations, driver-checked: an
    old generation (orders before 1999) is written WITHOUT the
    sales_channel column, a new generation (1999+) WITH it; reading the
    directory pair under mergeSchema=true unions the schemas and
    null-fills the old files — the lake-evolution behavior every
    long-lived table depends on. The aggregate counts channel coverage
    per status; the oracle recreates it from the original single-schema
    parquet via the generation predicate.

    At 100 TB: mergeSchema=true costs a footer read per FILE at planning
    (expensive on huge file counts) — production pins the merged schema
    in a catalog/metastore and passes it explicitly; the read semantics
    (missing columns → NULL) are identical."""
    root = _derived_path(t.sf_dir, "orders_evolving")
    old_gen = t.orders.filter(F.year("o_orderdate") < 1999)
    new_gen = t.orders.filter(F.year("o_orderdate") >= 1999).withColumn(
        "sales_channel", F.col("o_orderpriority")
    )
    write_parquet(old_gen, os.path.join(root, "gen=1"))
    write_parquet(new_gen, os.path.join(root, "gen=2"))
    merged = t.spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("sales_channel").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_channel"),
        F.countDistinct("sales_channel").alias("n_channels"),
    )


@query(
    "etl_forget_users",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE user_id % 29 <> 3
    GROUP BY event_type
    """,
)
def etl_forget_users(t: Tables) -> DataFrame:
    """Right-to-be-forgotten rewrite, driver-checked: a deterministic
    forget-list (user_id % 29 == 3 stands in for the legal request
    table), the events table rewritten WITHOUT those users via an
    anti-join, and the aggregate read back from the REWRITTEN copy — the
    oracle computes the same answer from the original plus the predicate,
    so the hash certifies the deletion rewrite dropped exactly the
    requested users and nobody else.

    At 100 TB: deletion from immutable parquet IS a rewrite; scope it
    with partition pruning (rewrite only partitions containing the
    users — here the whole table stands in) and an anti join against the
    broadcast forget-list. Table formats with delete vectors (Iceberg/
    Delta) turn this into a metadata operation; the anti-join rewrite is
    the format-agnostic floor."""
    forget = t.events.select("user_id").distinct().filter(F.col("user_id") % 29 == 3)
    cleaned_path = _derived_path(t.sf_dir, "events_forgotten")
    t.events.join(F.broadcast(forget), "user_id", "left_anti").write.mode(
        "overwrite"
    ).parquet(cleaned_path)
    return (
        t.spark.read.parquet(cleaned_path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "etl_cluster_by_date",
    oracle="""
    SELECT l_returnflag, count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def etl_cluster_by_date(t: Tables) -> DataFrame:
    """Sort-clustered lake layout: lineitem rewritten range-partitioned +
    sorted by l_shipdate, then a date-range query over the clustered
    copy (oracle over the original). Clustering gives every file a tight
    shipdate min/max, so the pushed-down range predicate (plan-asserted
    in tests) lets the reader skip whole files and row groups — the
    poor-man's Z-order for the single-column-range workload, and the
    right companion when partitioning by date is too fine-grained
    (high-cardinality timestamp vs low-cardinality partition key).

    repartitionByRange(ts) + sortWithinPartitions keeps the write
    parallel AND the clustering global across files (file k's max <=
    file k+1's min, modulo range-sampling boundaries)."""
    path = _derived_path(t.sf_dir, "lineitem_clustered")
    (
        t.lineitem.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    lo, hi = "1997-06-01", "1997-09-01"
    return (
        t.spark.read.parquet(path)
        .filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "scan_csv_permissive",
    oracle="""
    SELECT FALSE AS is_corrupt, count(*) AS n_rows FROM customer
    UNION ALL
    SELECT TRUE, 3
    """,
)
def scan_csv_permissive(t: Tables) -> DataFrame:
    """Malformed-input ingest contract: the customer CSV plus an injected
    file of 3 deterministically-broken lines (wrong arity / non-numeric
    key), read in PERMISSIVE mode with a corrupt-record column — bad rows
    surface as quarantine rows instead of failing the load or silently
    vanishing. The grouped count certifies BOTH populations: every good
    row parsed (count == parquet truth) and every bad row captured
    (count == injected 3).

    At 100 TB this is the ingest stance: PERMISSIVE + quarantine column,
    route corrupt rows to a review sink, never FAILFAST on a multi-hour
    load (and never DROPMALFORMED, which destroys the audit trail)."""
    from pyspark.sql.types import StringType, StructField, StructType

    path = _derived_path(t.sf_dir, "customer_csv_dirty")

    def build(p: str) -> None:
        write_csv(t.customer, p)
        bad = os.path.join(p, "zz_bad_lines.csv")
        with open(bad, "w") as f:
            f.write("c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment\n")  # per-file header
            f.write("not_an_int,Broken Row 1,9,12.5,BUILDING\n")
            f.write("42,Too,Few\n")
            f.write("abc,def,ghi,jkl,mno\n")

    # write-once is CORRECTNESS here, not just cost: the .cache() below
    # registers an InMemoryRelation keyed on this plan, and a re-overwrite
    # from a later invocation deletes the part files the cached file
    # index still points at (measured: plans-sweep then correctness run
    # read an empty/partial layout)
    _ensure_derived(path, _source_fingerprint(t.sf_dir, "customer"), build)
    schema = StructType(
        [*schemas.CUSTOMER.fields, StructField("_corrupt_record", StringType())]
    )
    df = (
        t.spark.read.schema(schema)
        .option("header", "true")
        .option("nullValue", "\\N")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # Spark refuses to run plans that read ONLY the corrupt-record column
    # from a raw CSV scan (column pruning reduces this query to exactly
    # that), so the quarantine split materializes the parsed batch first —
    # which is also the production shape: parse once, then fan out the
    # good rows and the quarantine rows from the same materialization.
    df = df.cache()
    grouped = df.groupBy(
        F.col("_corrupt_record").isNotNull().alias("is_corrupt")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    # A quarantine report must state BOTH populations even when one is
    # empty — "good rows: 0" is load-bearing information (groupBy alone
    # drops the absent group, e.g. a source file of only corrupt lines).
    # Left join against the static two-value domain; no-op when both
    # groups occur.
    domain = t.spark.createDataFrame([(False,), (True,)], "is_corrupt boolean")
    return domain.join(grouped, "is_corrupt", "left").select(
        "is_corrupt", F.coalesce("n_rows", F.lit(0).cast("long")).alias("n_rows")
    )


@query(
    "scan_nested_struct",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_totalprice > 300000.0
    GROUP BY o_orderstatus
    """,
)
def scan_nested_struct(t: Tables) -> DataFrame:
    """Nested-column lake layout: orders rewritten with the measures
    nested under a struct (`info.price`, `info.priority`), then filtered
    ON THE NESTED FIELD — Spark pushes the predicate into the parquet
    reader as a nested-field filter and prunes the struct to the touched
    leaves (both plan-asserted), so deep document-style schemas keep
    columnar economics. The oracle computes the same answer from the
    ORIGINAL flat parquet."""
    path = _derived_path(t.sf_dir, "orders_nested")
    nested = t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("odate"),
        ).alias("info"),
    )
    nested.write.mode("overwrite").parquet(path)
    return (
        t.spark.read.parquet(path)
        .filter(F.col("info.price") > 300000.0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("info.price"), 2).alias("total_price"),
        )
    )


@query(
    "scan_orc_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def scan_orc_agg(t: Tables) -> DataFrame:
    """ORC source/sink, driver-checked end to end (same derived-fixture
    protocol as the CSV/JSON keys): orders → ORC → read → aggregate,
    oracled against the ORIGINAL parquet. ORC is the other first-class
    columnar lake format (vectorized reader, predicate pushdown, column
    pruning — same economics as parquet, different ecosystem: Hive/Trino
    shops); the round trip certifies type fidelity through the format
    boundary including timestamps."""
    path = _derived_path(t.sf_dir, "orders_orc")
    t.orders.write.mode("overwrite").orc(path)
    return (
        t.spark.read.orc(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


def _avro_available() -> bool:
    """True when the spark-avro module jar is on this distribution's
    classpath. Avro is an EXTERNAL module (`spark-avro_2.13`, published
    with every Spark release but not bundled in the pyspark wheel), so
    the probe is a session-free jars-dir glob — registration happens at
    import time, before any SparkSession exists. This sandbox is offline
    and the wheel ships no avro jar (probe recorded in SURVEY §2.1), so
    the key self-registers the day the jar lands in $SPARK_HOME/jars —
    no code change needed then."""
    import glob as _glob

    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return bool(_glob.glob(os.path.join(jars, "*spark-avro*.jar")))
    except Exception:
        return False


if _avro_available():  # pragma: no cover — jar absent in this sandbox

    @query(
        "scan_avro_agg",
        oracle="""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
        """,
    )
    def scan_avro_agg(t: Tables) -> DataFrame:
        """Avro source/sink, driver-checked end to end (same
        derived-fixture protocol as the CSV/JSON/ORC keys): orders →
        Avro → read → aggregate, oracled against the ORIGINAL parquet.
        Avro is the row-oriented lake interchange format (Kafka/schema-
        registry ecosystems): no column pruning or predicate pushdown —
        every row deserializes — so it belongs at the ingest edge with a
        parquet conversion behind it; this key certifies type fidelity
        through the format boundary including timestamps."""
        path = _derived_path(t.sf_dir, "orders_avro")
        t.orders.write.mode("overwrite").format("avro").save(path)
        return (
            t.spark.read.format("avro")
            .load(path)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            )
        )


@query(
    "scan_xml_agg",
    oracle="""
    SELECT s_nationkey,
           count(*)                      AS n_suppliers,
           round(sum(s_acctbal), 2)      AS total_bal,
           max(s_name)                   AS max_name
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def scan_xml_agg(t: Tables) -> DataFrame:
    """XML source/sink, driver-checked end to end (same derived-fixture
    protocol as the CSV/JSON/ORC keys): supplier -> XML (native Spark 4
    writer, rowTag elements, entity escaping) -> read with the declared
    schema -> aggregate, oracled against the ORIGINAL parquet. The max()
    over a string column certifies the text round trip (escape/unescape),
    the sum certifies doubles' shortest-repr parse, and NULLs survive as
    absent elements (probed; the fixture is NULL-free but the degenerate
    tiers exercise absent rows).

    Scale notes: XML is an edge-ingestion format — record boundaries
    need the tag scanner, nothing pushes down, every byte parses; the
    reader takes an explicit schema (inference costs a full extra pass)
    and parallelizes by file split like the JSON reader. Convert to
    parquet at the lake edge."""
    path = _derived_path(t.sf_dir, "supplier_xml")
    t.supplier.write.mode("overwrite").format("xml").option("rowTag", "supplier").save(path)
    return (
        t.spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(schemas.SUPPLIER)
        .load(path)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.max("s_name").alias("max_name"),
        )
    )


@query("scan_binary_files", oracle=None)  # R: file sizes are fixture-layout-specific
def scan_binary_files(t: Tables) -> DataFrame:
    """Whole-file binary ingest (`binaryFile` source) — the entry path
    for image/audio/video corpora before any decode: one row per file
    with path + length + content, feeding the multimodal mapInPandas
    decoders (multimodal.py). Reported as per-extension counts and byte
    totals over the fixture directory; rows-only (sizes are a property
    of the fixture generation, not of query semantics) with self-checks:
    every fixture table's parquet appears exactly once, lengths > 0.

    At 100 TB: binaryFile parallelizes per file — fine for media blobs
    (one file = one work unit), wrong for many-small-files (pack into
    sequence/tar-shard layouts first, or the small-files problem applies
    to the MANIFEST too)."""
    df = t.spark.read.format("binaryFile").load(t.sf_dir + "/*.parquet")
    return (
        df.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length").cast("long").alias("n_bytes"),
        )
        .orderBy("file_name")
    )


@query(
    "scan_text_lines",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(len(replace(replace(text, chr(13), ' '), chr(10), ' ')))
                AS BIGINT) AS total_chars,
           CAST(max(len(text)) AS BIGINT) AS max_len,
           CAST(sum(CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_the
    FROM documents
    """,
)
def scan_text_lines(t: Tables) -> DataFrame:
    """Plain-text source (`spark.read.text`) checked end to end: the
    documents corpus is newline-sanitized (each \\r / \\n becomes one
    space, so lengths are preserved 1:1), written via the text sink —
    one line per document — and read back as lines; the aggregate runs
    over the RE-READ lines while the oracle computes the same stats from
    the ORIGINAL parquet. Certifies the write→split-by-line→read round
    trip loses and merges nothing.

    At 100 TB: text is the rawest ingestion tier (crawl dumps, logs) —
    line-splittable so reads parallelize, but schema-free, no pushdown,
    no column pruning; convert to parquet at the lake edge. The
    newline-sanitize step is the real-world contract: line-oriented
    formats cannot carry embedded newlines without a framing protocol
    (that upgrade path is JSON-lines, scan_json_agg)."""
    path = _derived_path(t.sf_dir, "documents_txt")
    sanitized = t.documents.select(
        F.regexp_replace("text", "[\\r\\n]", " ").alias("value")
    )
    _ensure_derived(
        path,
        _source_fingerprint(t.sf_dir, "documents"),
        lambda p: sanitized.write.mode("overwrite").text(p),
    )
    lines = t.spark.read.text(path)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
        F.max(F.length("value")).cast("bigint").alias("max_len"),
        F.sum(F.when(F.col("value").contains("the"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_the"),
    )


@query("etl_file_stats", oracle=None)
def etl_file_stats(t: Tables) -> DataFrame:
    """Per-file scan statistics through the hidden `_metadata` column —
    the data-skipping audit (file count, rows per file, bytes, per-file
    key ranges) that tells an operator whether a table needs compaction
    or re-clustering WITHOUT a filesystem walk: the stats ride along the
    normal parquet scan as a struct column.

    Rows-only by necessity (file names/sizes are layout properties no
    SQL oracle can see); the invariants that make it trustworthy are
    pinned in tests: per-file rows sum to the table count, every file
    row count is positive, and the min/max key ranges bound the true
    global range. Output keys are (file ordinal by name, not path) so
    the result is stable across checkout locations."""
    df = t.spark.read.parquet(f"{t.sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_orderdate",
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.file_size").alias("fsize"),
    )
    from pyspark.sql import Window

    per_file = df.groupBy("fname", "fsize").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    w = Window.orderBy("fname")  # ≤ #files rows — bounded
    return (
        per_file.withColumn("file_ord", F.row_number().over(w))
        .select(
            "file_ord",
            F.col("fsize").cast("long").alias("file_bytes"),
            "n_rows",
            "min_key",
            "max_key",
            "min_date",
            "max_date",
        )
    )


@query(
    "scan_json_permissive",
    oracle="""
    SELECT 'good' AS row_class,
           CAST(count(*) + 1 AS BIGINT) AS n_rows,
           -- coalesce: on an EMPTY customer table the good class still
           -- holds the injected drift row, so the sum is 12.75, not NULL
           round(CAST(coalesce(sum(c_acctbal), 0.0) AS DOUBLE) + 12.75, 2)
               AS sum_acctbal
    FROM customer
    UNION ALL
    SELECT 'partial', 1, 5.25
    UNION ALL
    SELECT 'syntax', 1, NULL
    """,
)
def scan_json_permissive(t: Tables) -> DataFrame:
    """Malformed-JSON ingest contract — the JSONL twin of
    scan_csv_permissive, covering the failure taxonomy JSON adds over
    CSV: (a) SYNTAX-broken records (unclosed object) become fully-null
    quarantine rows, (b) TYPE-mismatch records ("abc" where a long
    belongs) parse PARTIALLY — the well-typed fields survive while
    _corrupt_record still captures the raw line (probed Spark
    behavior), and (c) schema-DRIFT records (an extra unknown field)
    are NOT corrupt — the extra field drops and the row counts as good.
    The report states all three classes with parsed-value sums, so a
    load that silently reclassified any population flips the hash.

    At 100 TB this is the ingest stance for event/JSON feeds:
    PERMISSIVE + corrupt column + per-class counts published with the
    load; FAILFAST wastes the cluster-night, DROPMALFORMED destroys the
    audit trail, and partial rows are real recoverable data (their
    typed fields are right there)."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    path = _derived_path(t.sf_dir, "customer_jsonl_dirty")

    def build(p: str) -> None:
        (
            t.customer.select(
                F.to_json(F.struct("c_custkey", "c_acctbal", "c_mktsegment")).alias("j")
            ).write.mode("overwrite").text(p)
        )
        bad = os.path.join(p, "zz_injected.jsonl")
        with open(bad, "w") as f:
            # type mismatch: custkey unparseable as long -> partial row
            f.write('{"c_custkey": "not_an_int", "c_acctbal": 5.25, "c_mktsegment": "BUILDING"}\n')
            # syntax error: unclosed object -> fully corrupt row
            f.write('{"c_custkey": 77, "c_acctbal":\n')
            # schema drift: unknown extra field -> good row
            f.write('{"c_custkey": 900001, "c_acctbal": 12.75, "c_mktsegment": "DRIFT", "new_col": true}\n')

    _ensure_derived(path, _source_fingerprint(t.sf_dir, "customer"), build)
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        t.spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # same materialize-then-fan-out stance as scan_csv_permissive (Spark
    # rejects plans pruned down to only the corrupt-record column, and
    # parse-once is the production shape anyway)
    df = df.cache()
    cls = (
        F.when(F.col("_corrupt_record").isNull(), F.lit("good"))
        .when(F.col("c_acctbal").isNotNull(), F.lit("partial"))
        .otherwise(F.lit("syntax"))
    )
    grouped = df.groupBy(cls.alias("row_class")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )
    # all three classes are load-bearing even at count 0 (empty tier)
    domain = t.spark.createDataFrame(
        [("good",), ("partial",), ("syntax",)], "row_class string"
    )
    return domain.join(grouped, "row_class", "left").select(
        "row_class",
        F.coalesce("n_rows", F.lit(0).cast("long")).alias("n_rows"),
        "sum_acctbal",
    )


_Z_BITS = 4  # 16 buckets per dimension -> 8-bit z-values, 16 z-ranges


def _z_interleave_sql(bx: str, by: str, bits: int = _Z_BITS, idiv: str = "//") -> str:
    """Bit-interleave two `bits`-wide bucket ids into a z-value, as
    portable integer arithmetic (no engine bit-op dialect): bit i of bx
    lands at position 2i+1, bit i of by at 2i. `idiv` is the integer-
    division spelling — DuckDB's `//` vs Spark SQL's `div`."""
    terms = []
    for i in range(bits):
        terms.append(f"(({bx} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({by} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


@query(
    "etl_zorder_cluster",
    oracle=f"""
    WITH b AS (
        SELECT l_orderkey % 16 AS bx, l_partkey % 16 AS by
        FROM lineitem
    ),
    z AS (
        SELECT bx, by, {_z_interleave_sql('bx', 'by')} AS zval FROM b
    )
    SELECT CAST(zval // 16 AS INT)       AS zrange,
           CAST(count(*) AS BIGINT)      AS n_rows,
           CAST(min(bx) AS INT)          AS min_bx,
           CAST(max(bx) AS INT)          AS max_bx,
           CAST(min(by) AS INT)          AS min_by,
           CAST(max(by) AS INT)          AS max_by,
           CAST((max(bx) - min(bx) + 1) * (max(by) - min(by) + 1) AS INT)
                                         AS cell_span
    FROM z GROUP BY 1
    """,
)
def etl_zorder_cluster(t: Tables) -> DataFrame:
    """Z-order (Morton) clustering layout plan — the multi-dimensional
    data-skipping file layout (Delta OPTIMIZE ZORDER BY / Hudi
    clustering, public technique): bucket two filter columns into 16
    buckets each, bit-INTERLEAVE the bucket ids into an 8-bit z-value,
    and cut the z-axis into 16 contiguous z-ranges — each range is what
    a writer would emit as one file via repartitionByRange(zval). The
    report carries each range's min/max per dimension and the
    cell_span: z-ranges cover a BOUNDED RECTANGLE of (bx, by) cells
    (span 16 of 256 cells here), so a predicate on EITHER column prunes
    ~15/16 of the files — a lexicographic (bx, by) sort gives the same
    for bx but spans the full by-axis in every file (span check in
    tests). The interleave is spelled as portable div/mod arithmetic,
    identical in both engines, and certified by the hash gate.

    Scale: one in-row projection + one z-keyed hash agg; the actual
    write is repartitionByRange(zval) + write_parquet (the
    etl_cluster_by_date machinery) — the layout ARITHMETIC is the
    checkable part."""
    b = t.lineitem.select(
        (F.col("l_orderkey") % 16).alias("bx"),
        (F.col("l_partkey") % 16).alias("by"),
    )
    z = b.selectExpr(
        "bx", "by", f"{_z_interleave_sql('bx', 'by', idiv='div')} AS zval"
    )
    return (
        z.groupBy(F.floor(F.col("zval") / 16).cast("int").alias("zrange"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("bx").cast("int").alias("min_bx"),
            F.max("bx").cast("int").alias("max_bx"),
            F.min("by").cast("int").alias("min_by"),
            F.max("by").cast("int").alias("max_by"),
        )
        .select(
            "zrange",
            "n_rows",
            "min_bx",
            "max_bx",
            "min_by",
            "max_by",
            (
                (F.col("max_bx") - F.col("min_bx") + 1)
                * (F.col("max_by") - F.col("min_by") + 1)
            )
            .cast("int")
            .alias("cell_span"),
        )
    )


@query(
    "sink_ledger_census",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts)                  AS min_ts,
           max(ts)                  AS max_ts
    FROM events GROUP BY event_type
    """,
)
def sink_ledger_census(t: Tables) -> DataFrame:
    """Read-back census over the EXACTLY-ONCE ledger sink's published
    epoch table (r10 VERDICT task 6a): puts make_ledger_append_sink
    under the driver's hash gate the same way scan_python_datasource
    certified the DataSource read path — the sink graduates from an
    S-surface (pytest-only) to a D key whose correctness IS the
    exactly-once property.

    Pipeline, executed live on every call (never cached — the property
    under test is the write path):
    1. feed: events (event_type, ts) split into 4 source files; a
       4-epoch availableNow stream (maxFilesPerTrigger=1) appends each
       micro-batch's per-type facts (n_events, min_ts, max_ts) through
       the ledger sink's stage→publish→fsync-commit protocol.
    2. adversarial redelivery: every committed epoch is then REPLAYED
       through the same sink with a poison census (event_type='poison',
       n_events=10^9). If the ledger skip were broken the poison row
       lands in the published table and the census below hash-fails —
       at-least-once redelivery must be a byte-level no-op.
    3. census: SUM(n_events) / MIN(min_ts) / MAX(max_ts) per event_type
       across epochs. Count and min/max decompose exactly over any
       partition of the rows (no float-order hazard), so the census
       equals the oracle's direct aggregate over events iff every input
       row landed in EXACTLY one published epoch — duplicated batches
       overshoot n_events, vanished batches undershoot.

    The returned frame is rebuilt via createDataFrame from the collected
    census (bounded: one row per event type) so the temp dirs can be
    deleted eagerly instead of leaking until the driver materializes.

    Scale: the per-epoch facts are map-side-combined aggregates of one
    micro-batch (census cardinality = event types, not rows); the
    published table grows one tiny file set per epoch and the read-back
    is a metadata-scale scan. On a real deployment the same protocol
    rides foreachBatch against cloud storage with the ledger in the
    checkpoint volume."""
    import shutil
    import tempfile

    from base_etl_spark.streaming.jobs import make_ledger_append_sink

    spark = t.spark
    root = tempfile.mkdtemp(prefix="ledger_census_")
    try:
        src = os.path.join(root, "src")
        out = os.path.join(root, "out")
        ckpt = os.path.join(root, "ckpt")
        feed = t.events.select("event_type", "ts").repartition(4)
        feed.write.mode("overwrite").parquet(src)
        publish = make_ledger_append_sink(out)

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            publish(
                batch_df.groupBy("event_type").agg(
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.min("ts").alias("min_ts"),
                    F.max("ts").alias("max_ts"),
                ),
                epoch_id,
            )

        q = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        ledger = os.path.join(out, "_ledger")
        epochs = (
            [int(f.split(".")[0]) for f in os.listdir(ledger)
             if f.endswith(".committed")]
            if os.path.isdir(ledger) else []
        )
        poison = spark.range(1).select(
            F.lit("poison").alias("event_type"),
            F.lit(10**9).cast("long").alias("n_events"),
            F.current_timestamp().alias("min_ts"),
            F.current_timestamp().alias("max_ts"),
        )
        for e in epochs:  # redelivery storm: all must be no-ops
            publish(poison, e)

        if epochs:
            rows = (
                spark.read.parquet(*[
                    os.path.join(out, f"epoch={e}") for e in epochs
                ])
                .groupBy("event_type")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.min("min_ts").alias("min_ts"),
                    F.max("max_ts").alias("max_ts"),
                )
                .collect()
            )
        else:  # empty feed: no micro-batch ever fired
            rows = []
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_events bigint, min_ts timestamp, max_ts timestamp"
    )
