"""Sorts / limits / top-k (SURVEY §2.6) and set operations (§2.7).

topk uses orderBy+limit, which Spark plans as TakeOrderedAndProject:
each partition keeps a k-element heap and only k rows ever move — the
correct global top-k at any scale (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from base_etl_spark.io import Tables
from base_etl_spark.registry import query


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(t: Tables) -> DataFrame:
    """TPC-H Q3 shape: join + agg + global top-10 by computed revenue.
    Tie-break by o_orderkey pins membership across engines."""
    cust = F.broadcast(t.customer.filter(F.col("c_mktsegment") == "BUILDING"))
    orders = t.orders.filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    return (
        t.lineitem.join(orders, t.lineitem.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "sort_multikey",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment,
           row_number() OVER (ORDER BY c_mktsegment DESC,
                              nullif(c_mktsegment, 'BUILDING') ASC NULLS FIRST,
                              c_acctbal ASC, c_custkey) AS rn
    FROM customer
    """,
)
def sort_multikey(t: Tables) -> DataFrame:
    """Multi-key sort with explicit nulls ordering; the rn column encodes
    the sort so the order-insensitive hash still verifies it.

    Two-phase global rank (the 100 TB plan — a naive
    Window.orderBy(*order) with no partitionBy funnels the whole table
    through ONE task): sort keys 2-4 are functions of the leading key
    c_mktsegment or reside below it, so (1) rank locally within each
    segment (hash-distributed window), (2) broadcast the per-segment
    cumulative counts ordered by the segment-level keys, (3) global rn =
    segment offset + local rn. The only single-partition work is the
    5-row offsets table."""
    seg_order = [
        F.col("c_mktsegment").desc(),
        # constant within a segment — exercises nulls-first ordering only
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).asc_nulls_first(),
    ]
    local_w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    counts = t.customer.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_seg"))
    off_w = (
        Window.orderBy(*seg_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "c_mktsegment", F.coalesce(F.sum("n_seg").over(off_w), F.lit(0)).alias("seg_off")
    )
    return (
        t.customer.withColumn("local_rn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "c_mktsegment")
        .select(
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            (F.col("seg_off") + F.col("local_rn")).cast("int").alias("rn"),
        )
        .orderBy("rn")
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey
    LIMIT 20 OFFSET 100
    """,
)
def limit_offset(t: Tables) -> DataFrame:
    """Pagination over a deterministic (unique-key) sort."""
    return (
        t.orders.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(100).limit(20)
    )


# ---------------------------------------------------------------- set ops


@query(
    "set_union_all",
    oracle="""
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_totalprice > 300000.0
    """,
)
def set_union_all(t: Tables) -> DataFrame:
    """Bag union of two overlapping subsets (duplicates preserved)."""
    a = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = t.orders.filter(F.col("o_totalprice") > 300000.0)
    proj = lambda df: df.select("o_custkey", F.round("o_totalprice", 2).alias("price"))
    return proj(a).unionByName(proj(b))


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_totalprice > 300000.0
    """,
)
def set_union_distinct(t: Tables) -> DataFrame:
    """Deduplicating union (UNION = UNION ALL + DISTINCT)."""
    a = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = t.orders.filter(F.col("o_totalprice") > 300000.0)
    proj = lambda df: df.select("o_custkey", F.round("o_totalprice", 2).alias("price"))
    return proj(a).unionByName(proj(b)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(t: Tables) -> DataFrame:
    """Customers appearing in both status-F and status-O order sets."""
    f = t.orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t.orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT user_id AS o_custkey FROM events WHERE event_type = 'error'
    """,
)
def set_except(t: Tables) -> DataFrame:
    """Buyers minus error-event users (EXCEPT = distinct set semantics,
    so Spark's subtract(), not exceptAll())."""
    buyers = t.orders.select("o_custkey")
    err = t.events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("o_custkey")
    )
    return buyers.subtract(err)


@query(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def agg_unpivot(t: Tables) -> DataFrame:
    """Unpivot (melt): wide measures -> long (measure, value) rows — the
    inverse of agg_pivot_casewhen. Spark's native unpivot is a generator
    (no shuffle); the oracle spells it as UNION ALL for dialect safety."""
    return t.lineitem.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_totalprice > 200000.0
    """,
)
def set_intersect_all(t: Tables) -> DataFrame:
    """Multiset INTERSECT ALL: keeps min(m, n) copies of each duplicated
    row (vs set_intersect's dedup-to-one) — the bag semantics audits need
    when counting matched occurrences. Planned like the distinct variant
    (co-shuffle on the full row) plus per-row multiplicity counters."""
    proj = lambda df: df.select("o_custkey", F.round("o_totalprice", 2).alias("price"))
    a = proj(t.orders.filter(F.col("o_orderpriority") == "1-URGENT"))
    b = proj(t.orders.filter(F.col("o_totalprice") > 200000.0))
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_totalprice > 200000.0
    EXCEPT ALL
    SELECT o_custkey, round(o_totalprice, 2) AS price FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_all(t: Tables) -> DataFrame:
    """Multiset EXCEPT ALL: removes one copy per match, keeps max(m-n, 0)
    copies (vs set_except's remove-all) — the reconciliation diff that
    respects multiplicities."""
    proj = lambda df: df.select("o_custkey", F.round("o_totalprice", 2).alias("price"))
    a = proj(t.orders.filter(F.col("o_totalprice") > 200000.0))
    b = proj(t.orders.filter(F.col("o_orderpriority") == "1-URGENT"))
    return a.exceptAll(b)


@query(
    "sort_global_rank_two_phase",
    oracle="""
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS global_rank
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def sort_global_rank_two_phase(t: Tables) -> DataFrame:
    """Two-phase global row numbering — THE distributed rewrite of
    `row_number() OVER (ORDER BY ...)` that a dozen docstrings in this
    repo declare as the billions-of-rows tier (a bare global window is
    one partition = one task), promoted from a property test to a
    checked key: (1) repartitionByRange on the rank order so partition
    p holds a contiguous rank slice, (2) partition-LOCAL row_number
    keyed by spark_partition_id, (3) per-partition counts -> exclusive
    prefix-sum offsets (a partition-count-sized frame, broadcast), (4)
    global_rank = offset + local rank. The result is invariant to where
    the sampled range boundaries fall — offsets absorb any split — so
    the key is deterministic even though RangePartitioner samples, and
    the hash gate checks it against the single-window oracle at every
    sampling.

    The total order (o_totalprice DESC, o_orderkey) is unique, so
    ranks are engine-neutral. Scale: one range shuffle + one
    partition-local sort + one n_partitions-row window + one broadcast
    join — no global single-task sort anywhere.

    INVARIANT (r9 ADVICE): the local-rank leg and the offset leg MUST
    observe the SAME physical range partitioning. RangePartitioner
    SAMPLES its boundaries, so two independent evaluations of the same
    repartitionByRange can split rows differently; correctness here
    relied on spark.sql.exchange.reuse deduplicating the two identical
    exchanges. localCheckpoint() pins one materialized partitioning
    that both legs read, independent of exchange-reuse config or plan
    divergence."""
    base = t.orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice"
    )
    nb = max(base.sparkSession.sparkContext.defaultParallelism, 2)
    by_range = (
        base.repartitionByRange(nb, F.desc("o_totalprice"), F.asc("o_orderkey"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local_w = Window.partitionBy("pid").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    local = by_range.withColumn("lrn", F.row_number().over(local_w))
    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        by_range.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("pid", F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off"))
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select("o_orderkey", (F.col("off") + F.col("lrn")).cast("long").alias("global_rank"))
    )
