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
