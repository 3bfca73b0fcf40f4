"""Scans, projections, predicates (SURVEY §2.1, §2.2).

These shapes exist to prove the scan path: explicit-schema parquet reads,
computed projections, and compound predicates that Catalyst pushes into
the vectorized parquet reader (plan-asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from base_etl_spark.functions import money, money_sql
from base_etl_spark.io import Tables
from base_etl_spark.registry import query


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    """,
)
def scan_parquet(t: Tables) -> DataFrame:
    """Full scan, stable projection. Column pruning means the reader
    materializes exactly these 5 columns (ReadSchema assertion in plan
    tests) — at 100 TB the projection is the difference between reading
    5% and 100% of the table."""
    return t.lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )


@query(
    "proj_revenue",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           {money_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           {money_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charged
    FROM lineitem
    """,
)
def proj_revenue(t: Tables) -> DataFrame:
    """Computed projection + rename/drop; stays in whole-stage codegen.

    Per-row money values use the bit-exact floor rounding (see
    base_etl_spark.functions) — plain round() diverges from the oracle on
    ~0.2% of rows at .xx5 boundaries.
    """
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        money(price * (1 - disc)).alias("revenue"),
        money(price * (1 - disc) * (1 + tax)).alias("charged"),
    )


@query(
    "filter_complex",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_brand, p_size, l_quantity, l_returnflag
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand LIKE 'Brand#1%' OR p_size BETWEEN 5 AND 15)
      AND l_quantity >= 10.0
      AND NOT (l_returnflag = 'R')
      AND p_type IN ('ECONOMY', 'SMALL', 'STANDARD')
      AND nullif(l_linestatus, '') IS NOT NULL
    """,
)
def filter_complex(t: Tables) -> DataFrame:
    """AND/OR/NOT, IN, BETWEEN, LIKE, IS [NOT] NULL, comparisons.

    The part-side predicates are pushed below the join; the lineitem-side
    predicates reach the parquet reader as PushedFilters.
    """
    li, p = t.lineitem, t.part
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(
            (F.col("p_brand").like("Brand#1%") | F.col("p_size").between(5, 15))
            & (F.col("l_quantity") >= 10.0)
            & ~(F.col("l_returnflag") == "R")
            & F.col("p_type").isin("ECONOMY", "SMALL", "STANDARD")
            & F.nullif(F.col("l_linestatus"), F.lit("")).isNotNull()
        )
        .select("l_orderkey", "l_linenumber", "p_brand", "p_size", "l_quantity", "l_returnflag")
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)   AS n_customers,
           round(avg(c_acctbal), 4)   AS avg_balance
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def sql_pipe_syntax(t: Tables) -> DataFrame:
    """SQL pipe syntax (|>) — Spark 4.0's linear query form (public
    SQL:2023-era pipe-operator proposal; Spark implements FROM ... |>
    WHERE ... |> AGGREGATE): each stage reads top-to-bottom in
    execution order instead of the inside-out nesting of classic
    SELECT. This key certifies the parser surface end-to-end: the piped
    text compiles to the identical aggregate plan as the classic form
    (same Catalyst tree after parsing), hash-checked against the
    classic-SQL oracle.

    Scale: surface-only — the plan is the standard partial/final hash
    agg over a pushed-filter scan; pipe syntax changes the PARSER, not
    the plan. The customer frame is bound via spark.sql's DataFrame
    parameter substitution ({customer}) rather than a session-global
    temp view — no name to race on across interleaved fixtures, and
    nothing leaks into the session catalog after the plan is built."""
    spark = t.customer.sparkSession
    return spark.sql(
        """
        FROM {customer}
        |> WHERE c_acctbal > 0
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_customers,
                     round(avg(c_acctbal), 4) AS avg_balance
           GROUP BY c_mktsegment
        |> SELECT c_mktsegment, n_customers, avg_balance
        """,
        customer=t.customer,
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
        FROM orders
    ),
    months(m, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi
    ),
    rev AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT months.m AS month,
           coalesce(rev.revenue, 0.0)              AS revenue,
           coalesce(rev.n_orders, 0)               AS n_orders
    FROM months LEFT JOIN rev ON months.m = rev.m
    """,
)
def sql_recursive_cte(t: Tables) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.0's SQL:1999 recursion
    surface — SPARK-24497): builds the month calendar spine between the
    first and last order date by RECURSION (anchor row + month+1 step
    until the max), then left-joins monthly revenue so empty months
    surface as explicit zero rows — the classic gap-filled calendar
    every reporting stack needs, certified end-to-end through the
    recursive parser/execution path against DuckDB's identical
    recursive CTE. (events_gapfill builds a spine with sequence();
    this key certifies the RECURSION surface itself.)

    Scale: the recursion depth is the month span (bounded, ~84 for the
    7-year TPC-H calendar — each step is a 1-row union); the revenue
    side is one month-keyed hash agg of orders, joined to the bounded
    spine. The max bound rides INSIDE the recursion as a carried column
    — the first spelling referenced a scalar subquery over orders in
    the step's WHERE, which re-scanned the table once per month step
    (measured 96 s at sf0.001 vs ~2 s carried). The frame is bound via
    spark.sql DataFrame parameter substitution (the sql_pipe_syntax
    lesson: no session temp view to race or leak)."""
    spark = t.orders.sparkSession
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
            FROM {orders}
        ),
        months(m, hi) AS (
            SELECT lo, hi FROM bounds
            UNION ALL
            SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months
            WHERE m < hi
        ),
        rev AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM {orders} GROUP BY 1
        )
        SELECT months.m AS month,
               coalesce(rev.revenue, 0.0D)  AS revenue,
               coalesce(rev.n_orders, 0L)   AS n_orders
        FROM months LEFT JOIN rev ON months.m = rev.m
        """,
        orders=t.orders,
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_execute_immediate(t: Tables) -> DataFrame:
    """EXECUTE IMMEDIATE with USING parameter binding (Spark 4.0's
    dynamic-SQL surface): the query text arrives as a string variable
    and the filter value binds as a named parameter — the
    SQL-injection-safe spelling of runtime-assembled queries (dashboard
    backends, rule engines). Certifies parse -> parameter substitution
    -> execution against the classic static oracle: the dynamic path
    must produce the identical aggregate.

    Scale: surface-only — after binding, the plan is the standard
    pushed-filter scan + partial/final hash agg; EXECUTE IMMEDIATE
    changes WHERE THE TEXT COMES FROM, not the plan."""
    spark = t.orders.sparkSession
    t.orders.createOrReplaceTempView("orders_exec_imm_v")
    try:
        return spark.sql(
            """
            EXECUTE IMMEDIATE
            'SELECT o_orderpriority,
                    count(*) AS n_orders,
                    round(avg(o_totalprice), 4) AS avg_price
             FROM orders_exec_imm_v
             WHERE o_orderstatus = :st
             GROUP BY o_orderpriority'
            USING 'F' AS st
            """
        )
    finally:
        spark.catalog.dropTempView("orders_exec_imm_v")
