"""Sink round-trips + JDBC plan assembly (SURVEY §2.1 S-rows)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from base_etl_spark import sinks
from base_etl_spark.schemas import ORDERS


def test_parquet_partitioned_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "orders_by_status")
    df = tables.orders.withColumn("yr", F.year("o_orderdate"))
    sinks.write_parquet(df, path, partition_by=["o_orderstatus"], target_partitions=4)
    # hive-style partition dirs exist
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    # partition pruning: the filter becomes a PartitionFilter (directory
    # skip), never a data filter over all rows
    one = back.filter(F.col("o_orderstatus") == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert one.count() > 0


def test_csv_roundtrip_preserves_nulls(spark, tmp_path):
    path = str(tmp_path / "csv_rt")
    df = spark.createDataFrame([(1, "x"), (2, None)], ["id", "s"])
    sinks.write_csv(df, path)
    back = sinks.read_csv(spark, path, df.schema).orderBy("id").collect()
    assert back[1].s is None  # NULL survived (not "")


def test_json_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "json_rt")
    df = tables.nation
    sinks.write_json(df, path)
    back = sinks.read_json(spark, path, df.schema)
    assert back.count() == 25


def test_jdbc_writer_builds_without_db(tables):
    w = sinks.build_jdbc_writer(
        tables.nation,
        url="jdbc:postgresql://example.invalid:5432/warehouse",
        table="analytics.nation",
        properties={"user": "etl"},
    )
    # plan assembled; .save() would need a live DB — not available here
    assert w is not None


def test_bucketed_table_joins_without_exchange(spark, tables, tmp_path):
    # warehouse dir is set (session-scoped, static conf) in conftest
    sinks.write_bucketed(
        tables.orders.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 4
    )
    sinks.write_bucketed(
        tables.lineitem.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 4
    )
    # force a non-broadcast join so the bucketed layout is what saves the
    # shuffle (with broadcast there is nothing for bucketing to save)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("lineitem_b"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing co-located the join
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


_DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_roundtrip_derby(spark, tables):
    """Real executed JDBC load: write nation to embedded Derby (bundled
    in Spark's jars), read it back through the JDBC source."""
    url = "jdbc:derby:memory:etltest;create=true"
    w = sinks.build_jdbc_writer(
        tables.nation, url, "nation_jdbc", mode="overwrite", properties=_DERBY
    )
    w.save()
    back = sinks.read_jdbc(spark, url, "nation_jdbc", properties=_DERBY)
    assert back.count() == 25
    assert {c.lower() for c in back.columns} == {c.lower() for c in tables.nation.columns}
    # append mode adds rows (the default daily-ETL load semantics)
    sinks.build_jdbc_writer(
        tables.nation.limit(5), url, "nation_jdbc", mode="append", properties=_DERBY
    ).save()
    assert sinks.read_jdbc(spark, url, "nation_jdbc", properties=_DERBY).count() == 30


def test_read_jdbc_partitioned_and_pushdown(spark, tables):
    """The parallel-read leg: a range-partitioned read splits into
    numPartitions range queries, and a subquery dbtable pushes the
    filter/projection into the database."""
    url = "jdbc:derby:memory:etlread;create=true"
    sinks.build_jdbc_writer(
        tables.customer.select("c_custkey", "c_nationkey", "c_acctbal"),
        url, "customer_jdbc", mode="overwrite", properties=_DERBY,
    ).save()
    part = sinks.read_jdbc(
        spark, url, "customer_jdbc", properties=_DERBY,
        partition_column="c_custkey", lower_bound=1, upper_bound=1501,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == tables.customer.count()
    # range partitioning must not drop or duplicate boundary rows
    assert part.select("c_custkey").distinct().count() == tables.customer.count()
    sub = sinks.read_jdbc(
        spark, url,
        # Derby uppercases unquoted identifiers; Spark created the table
        # with quoted lowercase columns, so the pushdown query quotes too
        '(SELECT "c_custkey", "c_acctbal" FROM customer_jdbc WHERE "c_acctbal" > 0) t',
        properties=_DERBY,
    )
    assert set(c.lower() for c in sub.columns) == {"c_custkey", "c_acctbal"}
    assert sub.count() == tables.customer.filter("c_acctbal > 0").count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sinks.read_jdbc(
            spark, url, "customer_jdbc", properties=_DERBY,
            partition_column="c_custkey",
        )


def test_run_daily_job_executes_jdbc_leg(spark, tmp_path):
    """run_daily_job with a JDBC URL must actually LOAD the rows (ADVICE
    r1: the writer was built and discarded)."""
    import datetime as dt

    from base_etl_spark import etl
    from tests.conftest import SF_TEST

    url = "jdbc:derby:memory:etljob;create=true"
    n = etl.run_daily_job(
        spark, SF_TEST, dt.date(1995, 6, 19), str(tmp_path / "daily"),
        jdbc_url=url, jdbc_properties=_DERBY,
    )
    back = (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "daily_order_summary")
        .option("driver", _DERBY["driver"]).load()
    )
    assert back.count() == n > 0
    # replaying the same logical date must NOT double-insert (ADVICE r2:
    # the JDBC leg appended blindly; now it delete+appends the date)
    n2 = etl.run_daily_job(
        spark, SF_TEST, dt.date(1995, 6, 19), str(tmp_path / "daily"),
        jdbc_url=url, jdbc_properties=_DERBY,
    )
    assert n2 == n
    assert (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "daily_order_summary")
        .option("driver", _DERBY["driver"]).load().count() == n
    )


def test_compaction_file_count_contract(spark):
    import glob
    import os

    from base_etl_spark import queries
    from base_etl_spark.sinks import _derived_path
    from tests.conftest import SF_TEST

    queries()["etl_compaction"](spark, SF_TEST).collect()
    frag = glob.glob(os.path.join(_derived_path(SF_TEST, "lineitem_fragmented"), "*.parquet"))
    comp = glob.glob(os.path.join(_derived_path(SF_TEST, "lineitem_compacted"), "*.parquet"))
    assert len(frag) == 64
    assert len(comp) == 4


def test_python_datasource_partition_plumbing(spark):
    """The custom source must genuinely parallelize: 8 driver-planned
    partitions, round-robin striping so every partition carries an even
    share, and options flow through (a smaller total/parts override)."""
    from base_etl_spark.pysource import SynthSource

    try:
        spark.dataSource.register(SynthSource)
    except Exception:
        pass
    df = spark.read.format("synthrange").load()
    assert df.rdd.getNumPartitions() == 8
    sizes = [len(p) for p in df.rdd.glom().collect()]
    assert sizes == [10_000 // 8] * 8
    small = spark.read.format("synthrange").option("total", "100").option("parts", "4").load()
    assert small.count() == 100
    assert small.rdd.getNumPartitions() == 4
    # ids cover the exact range with no dupes or gaps
    assert small.agg({"id": "min"}).first()[0] == 0
    assert small.select("id").distinct().count() == 100


def test_ensure_derived_rebuilds_on_source_change(tmp_path):
    """The reuse marker is keyed on the source files' size+mtime
    fingerprint, so a regenerated fixture that preserves row count still
    triggers a rebuild — and the data lands via tmp-dir + atomic rename."""
    import os

    from base_etl_spark.sinks import _ensure_derived, _source_fingerprint

    src = tmp_path / "sf"
    src.mkdir()
    (src / "customer.parquet").write_bytes(b"v1-bytes")
    target = str(tmp_path / "derived" / "layout")

    builds = []

    def build(p):
        os.makedirs(p)
        with open(os.path.join(p, "part-0"), "w") as f:
            f.write(f"build{len(builds)}")
        builds.append(p)

    key1 = _source_fingerprint(str(src), "customer")
    _ensure_derived(target, key1, build)
    _ensure_derived(target, key1, build)  # cached: no second build
    assert len(builds) == 1
    assert os.path.isdir(target)  # tmp dir was renamed over the target
    assert not os.path.exists(target + ".lock")

    # same byte length, same row count story — only mtime moves
    os.utime(src / "customer.parquet", ns=(1, 1))
    key2 = _source_fingerprint(str(src), "customer")
    assert key2 != key1
    _ensure_derived(target, key2, build)
    assert len(builds) == 2
    with open(os.path.join(target, "part-0")) as f:
        assert f.read() == "build1"


def test_ensure_derived_stale_lock_and_orphan_cleanup(tmp_path):
    """A dead builder's stale lock (old mtime) is stolen through the
    O_EXCL race, and scratch dirs leaked by killed builds of OTHER pids
    are pruned under the lock."""
    import os

    from base_etl_spark.sinks import _ensure_derived

    target = str(tmp_path / "layout")
    os.makedirs(tmp_path, exist_ok=True)
    # dead builder artifacts: stale lock + an orphan scratch dir
    lock = target + ".lock"
    open(lock, "w").close()
    os.utime(lock, ns=(0, 0))  # epoch mtime => stale by any timeout
    orphan = target + ".build99999"
    os.makedirs(orphan)

    def build(p):
        os.makedirs(p)
        open(os.path.join(p, "part-0"), "w").close()

    _ensure_derived(target, "k1", build)
    assert os.path.isdir(target)
    assert not os.path.exists(orphan), "dead builder's scratch dir pruned"
    assert not os.path.exists(lock)


def test_ensure_derived_release_is_ownership_checked(tmp_path):
    """If a stealer replaced our lock mid-build, release must NOT free
    the stealer's lock (that would admit a third concurrent builder)."""
    import os

    from base_etl_spark.sinks import _ensure_derived

    target = str(tmp_path / "layout")
    lock = target + ".lock"

    def build(p):
        os.makedirs(p)
        open(os.path.join(p, "part-0"), "w").close()
        # simulate a (misjudged) stealer taking the lock mid-build
        with open(lock, "w") as f:
            f.write("999999")

    _ensure_derived(target, "k1", build)
    assert os.path.isdir(target)
    assert os.path.exists(lock), "foreign lock left in place on release"
    with open(lock) as f:
        assert f.read() == "999999"
    os.unlink(lock)


def test_ensure_derived_live_owner_lock_not_stolen(tmp_path):
    """A lock whose mtime is ancient but whose recorded owner pid is
    ALIVE belongs to a legitimately slow (>300 s) build: waiters must
    keep waiting instead of stealing it and pruning the live builder's
    scratch dir mid-write."""
    import os
    import threading
    import time

    from base_etl_spark.sinks import _ensure_derived

    target = str(tmp_path / "layout")
    lock = target + ".lock"
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # a live owner (this very process)
    # past the 300 s age threshold but under the absolute pid-reuse
    # ceiling — the band where pid liveness governs
    aged = time.time() - 600
    os.utime(lock, (aged, aged))

    built = []

    def run():
        _ensure_derived(target, "k1", lambda p: built.append(p))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(1.0)
    assert t.is_alive(), "waiter stole a live owner's lock"
    assert not built and os.path.exists(lock)
    # the 'builder' finishes: marker appears, waiter returns without building
    with open(target + ".done", "w") as f:
        f.write("k1")
    t.join(timeout=10)
    assert not t.is_alive() and not built


def test_ensure_derived_pid_reuse_ceiling_steals(tmp_path):
    """A lock older than the absolute ceiling is stolen even when its
    recorded pid is alive: a crashed builder's pid recycled by an
    unrelated long-lived process must not wedge waiters forever
    (r6 ADVICE, sinks._lock_owner_dead pid-reuse hazard)."""
    import os
    import time

    from base_etl_spark.sinks import _ensure_derived

    target = str(tmp_path / "layout")
    lock = target + ".lock"
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # "recycled" pid: alive, not a builder
    ancient = time.time() - 5 * 3600  # past the 4 h ceiling
    os.utime(lock, (ancient, ancient))

    built = []

    def build(p):
        os.makedirs(p)
        open(os.path.join(p, "part-0"), "w").close()
        built.append(p)

    _ensure_derived(target, "k1", build)
    assert built and os.path.isdir(target)


def test_avro_registration_matches_jar_probe(spark):
    """scan_avro_agg registers iff the spark-avro module jar is on the
    classpath (r7 VERDICT task 8): the key self-registers the day the
    jar ships, and until then stays a documented n/a instead of a red
    driver row. When present, the round trip must actually work."""
    from base_etl_spark import queries
    from base_etl_spark.sinks import _avro_available
    from tests.conftest import SF_TEST  # noqa: F401

    qs = queries()
    assert ("scan_avro_agg" in qs) == _avro_available()
    if _avro_available():  # pragma: no cover — jar absent in this sandbox
        assert qs["scan_avro_agg"](spark, SF_TEST).count() > 0


def test_python_datasource_sink_roundtrip(spark, tables, tmp_path):
    """The WRITE half of the Python DataSource surface: per-task Python
    writers stream JSON-lines files on executors, the driver-side
    commit publishes a manifest, and the files read back to exactly the
    source aggregate. Abort safety is the protocol's (attempt-unique
    file names); this pins the happy path end to end."""
    import json

    from pyspark.sql import functions as F

    from base_etl_spark.pysource import JsonlSink

    try:
        spark.dataSource.register(JsonlSink)
    except Exception:
        pass  # already registered in this session
    src = tables.orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    expected = {r.o_orderpriority: r.n for r in src.collect()}
    out = str(tmp_path / "jsonl_sink")
    (tmp_path / "jsonl_sink").mkdir()
    src.write.format("jsonlsink").option("path", out).mode("append").save()
    manifest = json.loads((tmp_path / "jsonl_sink" / "_MANIFEST.json").read_text())
    assert manifest["n_rows"] == len(expected)
    back = spark.read.json(f"{out}/part-*.jsonl")
    got = {r.o_orderpriority: r.n for r in back.collect()}
    assert got == expected
