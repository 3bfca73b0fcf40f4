"""Aggregation family (SURVEY §2.4).

All shapes use Spark's built-in hash aggregation (partial map-side combine
+ final, automatic); nothing here breaks whole-stage codegen. Doubles are
rounded to 2dp on both sides (FIXTURES.md gotcha 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from base_etl_spark.io import Tables
from base_etl_spark.registry import query


@query(
    "agg_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                  AS avg_qty,
           round(avg(l_extendedprice), 2)                             AS avg_price,
           round(avg(l_discount), 4)                                  AS avg_disc,
           count(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing(t: Tables) -> DataFrame:
    """TPC-H Q1 shape: filter + 2-key group-by + 8 aggregates.

    At 100 TB this is a pure scan + partial/final hash agg — no join, one
    shuffle of ~6 groups; the parquet filter on l_shipdate is pushed down.
    """
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*)                AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(t: Tables) -> DataFrame:
    """Exact distinct users per event type (expand-then-agg under the hood)."""
    return t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("agg_approx_distinct", oracle=None)  # R: HLL sketches differ across engines
def agg_approx_distinct(t: Tables) -> DataFrame:
    """HyperLogLog distinct users per event type (rows-only oracle).

    Self-check (tests): within ±5% of the exact count. At 100 TB this is
    THE distinct-count operator — constant memory per group vs the exact
    expand-then-agg.
    """
    return t.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("n_users_approx")
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           count(*)                  AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING sum(o_totalprice) > 1500000.0
    """,
)
def agg_having(t: Tables) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        t.orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_total"),
        )
        .filter(F.col("_total") > 1500000.0)
        .select("o_custkey", "n_orders", F.round("_total", 2).alias("total_spent"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(n_name, 'ALL')       AS nation,
           coalesce(c_mktsegment, 'ALL') AS segment,
           grouping(n_name) * 2 + grouping(c_mktsegment) AS gid,
           count(*)                      AS n_customers,
           round(sum(c_acctbal), 2)      AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def agg_rollup(t: Tables) -> DataFrame:
    """Hierarchical subtotals; gid disambiguates subtotal levels.

    coalesce to 'ALL' is safe because the fixtures contain no NULL names
    (FIXTURES.md); gid pins which level each row belongs to.

    ANSI divergence handled: the () grouping set emits its grand-total
    row even over EMPTY input (DuckDB/Postgres do), but Spark's
    Expand-based grouping sets emit nothing — a real shape on any
    filtered-to-nothing partition. The union branch below synthesizes
    that row gated on a count-only subquery. Cost honesty: the gate
    re-executes the aggregation INPUT (here the customer-nation join)
    with zero data columns per run — column pruning makes it cheap, not
    free, and the physical plan carries the union plus that extra
    subtree. The RESULT hash is unchanged on any non-empty input (the
    gate contributes 0 rows); acceptable since no grand-total-gated key
    is a bench headline key."""
    j = t.customer.join(t.nation, t.customer.c_nationkey == t.nation.n_nationkey)
    rolled = (
        j.rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "gid",
            "n_customers",
            "sum_acctbal",
        )
    )
    grand_if_empty = (
        j.agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == 0)
        .select(
            F.lit("ALL").alias("nation"),
            F.lit("ALL").alias("segment"),
            F.lit(3).cast("long").alias("gid"),
            F.lit(0).cast("long").alias("n_customers"),
            F.lit(None).cast("double").alias("sum_acctbal"),
        )
    )
    return rolled.unionByName(grand_if_empty)


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(t: Tables) -> DataFrame:
    """All 2^2 grouping combinations over (status, priority).

    Same empty-input grand-total synthesis as agg_rollup (ANSI emits the
    () row over empty input, Spark's Expand emits nothing); the branch
    is a count-only scan contributing 0 rows whenever orders has any."""
    cubed = (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "sum_price",
        )
    )
    grand_if_empty = (
        t.orders.agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == 0)
        .select(
            F.lit("ALL").alias("status"),
            F.lit("ALL").alias("priority"),
            F.lit(3).cast("long").alias("gid"),
            F.lit(0).cast("long").alias("n_orders"),
            F.lit(None).cast("double").alias("sum_price"),
        )
    )
    return cubed.unionByName(grand_if_empty)


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*)                      AS n_items,
           round(sum(l_quantity), 2)     AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(t: Tables) -> DataFrame:
    """Explicit grouping sets via the SQL entry point (SURVEY §3 E3).

    The UNION ALL branch is the same empty-input grand-total synthesis
    as agg_rollup, spelled in SQL: ANSI's () set emits its row over
    empty input, Spark's doesn't; the count-only gate adds 0 rows
    whenever lineitem has any."""
    return t.spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*)                      AS n_items,
               round(sum(l_quantity), 2)     AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        UNION ALL
        SELECT 'ALL', 'ALL', CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)
        FROM (SELECT count(*) AS _n FROM lineitem) WHERE _n = 0
        """
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # measured domain


@query(
    "agg_pivot_casewhen",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot_casewhen(t: Tables) -> DataFrame:
    """Pivot event_type into columns (explicit value list => single pass,
    no extra job to discover pivot values — the 100 TB-safe form)."""
    p = t.events.groupBy("user_id").pivot("event_type", _EVENT_TYPES).sum("value")
    return p.select("user_id", *[F.round(F.col(c), 2).alias(c) for c in _EVENT_TYPES])


@query(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct_rows(t: Tables) -> DataFrame:
    """SELECT DISTINCT == group-by-all-columns (partial agg applies)."""
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           round(min(o_totalprice), 2)                 AS lo,
           round(max(o_totalprice), 2)                 AS hi
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentiles(t: Tables) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont: both linearly interpolate at p*(n-1)). Exact
    percentiles sort per group — fine for bounded groups; unbounded
    cardinalities use agg_approx_quantile instead."""
    return t.orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query("agg_approx_quantile", oracle=None)  # R: sketch-based, engine-specific
def agg_approx_quantile(t: Tables) -> DataFrame:
    """approx_percentile via the KLL/GK sketch — constant memory per
    group, THE quantile operator at 100 TB (exact percentile must sort).
    Self-check (tests): within 2% relative error of the exact p50/p90."""
    return t.orders.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90_approx"),
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT user_id,
           max(ts)                  AS last_ts,
           arg_max(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                               || lpad(CAST(event_id AS VARCHAR), 20, '0'))
               AS last_event_type,
           round(arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                             || lpad(CAST(event_id AS VARCHAR), 20, '0')), 2)
               AS last_value,
           arg_min(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                               || lpad(CAST(event_id AS VARCHAR), 20, '0'))
               AS first_event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def agg_argmax(t: Tables) -> DataFrame:
    """Latest/earliest record per key via max_by/min_by — the
    last-known-state pattern (CDC compaction, sessionless 'current
    value' lookups) as ONE hash aggregate instead of a sort or window.

    At 100 TB this is the cheapest shape for 'latest per key': a single
    partial+final agg on user_id, no row_number sort, no self-join.
    Determinism (fuzz harness, r5): the order key is the UNIQUE tuple
    (ts, event_id) — Spark orders the struct lexicographically, the
    oracle encodes the same tuple as a zero-padded string (DuckDB's
    arg_max takes no composite key) — so duplicate timestamps within a
    user, which real event streams produce constantly, resolve
    identically on both engines instead of by engine-internal scan
    order."""
    tie_key = F.struct("ts", "event_id")
    return t.events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.max_by("event_type", tie_key).alias("last_event_type"),
        F.round(F.max_by("value", tie_key), 2).alias("last_value"),
        F.min_by("event_type", tie_key).alias("first_event_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)  AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted(t: Tables) -> DataFrame:
    """Two-level salted aggregation (skew.salted_agg) producing EXACTLY
    the plain groupBy result — the driver hash-verifies that the salt
    never leaks into the answer.

    The skew fallback for hot group keys AQE cannot split: level 1
    spreads each key over 16 random salts, level 2 merges partials.
    Only algebraic aggregates salt this way; sum-of-partial-sums on
    doubles reassociates the addition, so money rounds once at the end
    (the 2dp round absorbs the reassociation noise, same rule as the
    oracle side)."""
    from base_etl_spark.skew import salted_agg

    out = salted_agg(
        t.lineitem,
        ["l_returnflag"],
        aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum("l_quantity").alias("ps"),
            F.min("l_extendedprice").alias("pmin"),
            F.max("l_extendedprice").alias("pmax"),
        ],
        reaggs=[
            F.sum("pn").alias("n_rows"),
            F.round(F.sum("ps"), 2).alias("sum_qty"),
            F.round(F.min("pmin"), 2).alias("min_price"),
            F.round(F.max("pmax"), 2).alias("max_price"),
        ],
    )
    return out


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event, n AS n_events
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY n DESC, event_type) AS rn
        FROM counts
    ) WHERE rn = 1
    """,
)
def agg_mode(t: Tables) -> DataFrame:
    """Statistical mode per group: each user's most frequent event type,
    ties broken lexicographically so the answer is a total function of
    the data (Spark's native mode() is non-deterministic on ties).

    Two hash aggregations — (user, type) counts, then argmax via max_by
    over a (count, reversed-type) ordering struct — NO window over the
    full table: the second agg's input is already one row per (user,
    type), and max_by's comparator gives the deterministic tie-break.
    At 100 TB both aggs shuffle on user_id and co-partition."""
    counts = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # deterministic argmax: strings don't negate, so order by
    # (-n, event_type) and take min_by — (count DESC, type ASC)
    pick = F.min_by(
        F.struct(F.col("event_type").alias("mode_event"), F.col("n").alias("n_events")),
        F.struct((-F.col("n")).alias("negn"), F.col("event_type").alias("et")),
    )
    return counts.groupBy("user_id").agg(pick.alias("p")).select(
        "user_id", F.col("p.mode_event").alias("mode_event"), F.col("p.n_events").alias("n_events")
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_total,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           round(sum(o_totalprice) FILTER (WHERE o_totalprice > 300000.0), 2)
               AS big_order_revenue,
           round(avg(o_totalprice) FILTER (WHERE year(o_orderdate) >= 2000), 2)
               AS avg_price_modern
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_filter_clause(t: Tables) -> DataFrame:
    """SQL FILTER clause (per-aggregate predicates) through the SQL entry
    point — the standard form of conditional aggregation; Catalyst
    compiles each FILTER to the same if(cond, x, null) input the CASE
    formulation produces, so one scan serves all four aggregates.
    NULL-when-empty semantics (sum/avg over a filtered-empty group)
    match across engines."""
    return t.spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_total,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               round(sum(o_totalprice) FILTER (WHERE o_totalprice > 300000.0), 2)
                   AS big_order_revenue,
               round(avg(o_totalprice) FILTER (WHERE year(o_orderdate) >= 2000), 2)
                   AS avg_price_modern
        FROM orders
        GROUP BY o_orderstatus
        """
    )


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(t: Tables) -> DataFrame:
    """Built-in OLS regression aggregates (regr_slope / regr_intercept /
    regr_r2 / regr_count): price-vs-quantity fit per return flag in ONE
    hash-aggregate pass — the single-pass sufficient-statistics form
    (Σx, Σy, Σxx, Σxy per group), so at 100 TB a regression costs
    exactly what a sum costs. Verified value-identical to DuckDB's
    implementations at 6dp. The two-pass normalized-moment recipe
    (agg_stats_moments) remains the numerically-careful fallback for
    ill-conditioned columns."""
    return t.spark.sql(
        """
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
               regr_count(l_extendedprice, l_quantity)               AS n_pairs
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_mean_family",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_quantity), 6) AS arith_mean,
           round(exp(avg(ln(l_quantity))), 6) AS geo_mean,
           round(count(*) / sum(1.0 / l_quantity), 6) AS harm_mean
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_returnflag
    """,
)
def agg_mean_family(t: Tables) -> DataFrame:
    """The three Pythagorean means per group: arithmetic, geometric
    (exp∘avg∘ln — the log-space trick that also makes it a single
    partial-aggregable pass and overflow-proof), harmonic (n/Σ(1/x) —
    the correct mean for rates). Strict-positive guard because ln/1÷x
    are undefined at zero. AM ≥ GM ≥ HM is asserted as a property test
    invariant."""
    q = F.col("l_quantity")
    return (
        t.lineitem.filter(q > 0)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg(q), 6).alias("arith_mean"),
            F.round(F.exp(F.avg(F.log(q))), 6).alias("geo_mean"),
            F.round(F.count(F.lit(1)) / F.sum(1.0 / q), 6).alias("harm_mean"),
        )
    )


@query(
    "agg_top_percentile_share",
    oracle="""
    WITH cust AS (SELECT o_custkey, sum(o_totalprice) AS rev
                  FROM orders GROUP BY o_custkey),
         thresh AS (SELECT quantile_cont(rev, 0.99) AS p99,
                           sum(rev) AS total FROM cust)
    SELECT CAST(count(*) AS BIGINT) AS n_top_customers,
           round(sum(rev), 2) AS top_revenue,
           round(sum(rev) / max(thresh.total), 6) AS revenue_share
    FROM cust CROSS JOIN thresh
    WHERE rev > thresh.p99
    """,
)
def agg_top_percentile_share(t: Tables) -> DataFrame:
    """Whale concentration: customers above the p99 revenue threshold
    and their share of total revenue — the one-number concentration
    report next to agg_gini's full curve. NO global rank: the threshold
    is an exact-percentile SCALAR (one-row broadcast), so the plan is
    hash agg → scalar → filtered re-aggregation — the pattern that
    replaces 'rank everyone, take top 1%' at any scale (swap
    approx_percentile for the same plan when exactness isn't worth the
    sort memory)."""
    cust = t.orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    thresh = cust.agg(
        F.percentile("rev", F.lit(0.99)).alias("p99"), F.sum("rev").alias("total")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("rev") > F.col("p99"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_top_customers"),
            F.round(F.sum("rev"), 2).alias("top_revenue"),
            F.round(F.sum("rev") / F.max("total"), 6).alias("revenue_share"),
        )
    )


@query(
    "agg_hhi",
    oracle="""
    WITH shares AS (
        SELECT p_type, p_brand, sum(l_extendedprice) AS rev,
               sum(sum(l_extendedprice)) OVER (PARTITION BY p_type) AS tot
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type, p_brand
    )
    SELECT p_type,
           round(sum(pow(rev / tot, 2)), 6) AS hhi,
           CAST(count(*) AS BIGINT) AS n_brands
    FROM shares GROUP BY p_type
    """,
)
def agg_hhi(t: Tables) -> DataFrame:
    """Herfindahl-Hirschman concentration index per part type: Σ(brand
    market share)² — the antitrust-style concentration scalar next to
    agg_gini's inequality curve (HHI→1 = monopoly, →1/n = fragmented).
    Two chained hash aggs sharing the p_type key; the per-type total
    rides a partition window over the small (type × brand) aggregate."""
    shares = (
        t.lineitem.join(
            F.broadcast(t.part.select("p_partkey", "p_type", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_type", "p_brand")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .withColumn("tot", F.sum("rev").over(Window.partitionBy("p_type")))
    )
    return shares.groupBy("p_type").agg(
        F.round(F.sum(F.pow(F.col("rev") / F.col("tot"), 2)), 6).alias("hhi"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )


@query(
    "agg_chi_square",
    oracle="""
    WITH obs AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri,
                        count(*) AS o
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 GROUP BY 1, 2),
         margins AS (
             SELECT seg, pri, o,
                    sum(o) OVER (PARTITION BY seg) AS row_tot,
                    sum(o) OVER (PARTITION BY pri) AS col_tot,
                    sum(o) OVER () AS n
             FROM obs
         )
    SELECT round(sum(pow(o - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 6) AS chi2,
           CAST((count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS BIGINT)
               AS dof
    FROM margins
    """,
)
def agg_chi_square(t: Tables) -> DataFrame:
    """Chi-square independence statistic for the (market segment × order
    priority) contingency table — the categorical-drift / A-B sanity
    test. Expected counts come from the margins of the OBSERVED 25-cell
    aggregate, so the windows run over 25 rows; the fact-sized work is
    one hash agg. Emits the statistic + degrees of freedom (the p-value
    lookup is a client-side table, deliberately not a UDF)."""
    obs = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    m = obs.select(
        "seg",
        "pri",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("pri")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
        ((F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1))
        .cast("long")
        .alias("dof"),
    )


@query(
    "agg_trimmed_mean",
    oracle="""
    WITH th AS (
        SELECT o_orderstatus AS st,
               quantile_cont(o_totalprice, 0.05) AS lo,
               quantile_cont(o_totalprice, 0.95) AS hi
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           round(avg(o_totalprice), 4) AS plain_mean,
           round(avg(CASE WHEN o_totalprice >= th.lo AND o_totalprice <= th.hi
                          THEN o_totalprice END), 4) AS trimmed_mean,
           CAST(sum(CASE WHEN o_totalprice < th.lo OR o_totalprice > th.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed
    FROM orders JOIN th ON o_orderstatus = th.st
    GROUP BY o_orderstatus
    """,
)
def agg_trimmed_mean(t: Tables) -> DataFrame:
    """5%-trimmed mean per group next to the plain mean — the robust
    location estimate that survives fat tails without the median's
    information loss. Two passes: per-group exact 5/95 percentiles
    (broadcast ~3 rows), then a conditional re-aggregation — the
    win_mad_outliers plan family. Rows outside the band average as NULL
    (CASE without ELSE), identical NULL-skipping avg semantics on both
    engines."""
    th = t.orders.groupBy(F.col("o_orderstatus").alias("st")).agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    inband = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") <= F.col("hi"))
    return (
        t.orders.join(F.broadcast(th), F.col("o_orderstatus") == F.col("st"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("plain_mean"),
            F.round(F.avg(F.when(inband, F.col("o_totalprice"))), 4).alias("trimmed_mean"),
            F.sum(F.when(~inband, 1).otherwise(0)).cast("long").alias("n_trimmed"),
        )
    )


@query(
    "agg_boxplot_stats",
    oracle="""
    WITH q AS (
        SELECT c_mktsegment AS seg,
               quantile_cont(c_acctbal, 0.25) AS q1,
               quantile_cont(c_acctbal, 0.50) AS q2,
               quantile_cont(c_acctbal, 0.75) AS q3
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           round(q1, 4) AS q1, round(q2, 4) AS q2, round(q3, 4) AS q3,
           round(q3 - q1, 4) AS iqr,
           CAST(sum(CASE WHEN c_acctbal < q1 - 1.5 * (q3 - q1)
                           OR c_acctbal > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM customer JOIN q ON c_mktsegment = q.seg
    GROUP BY c_mktsegment, q1, q2, q3
    """,
)
def agg_boxplot_stats(t: Tables) -> DataFrame:
    """Tukey boxplot statistics per segment: quartiles, IQR, and the
    count outside the 1.5·IQR fences — the third robust-outlier method
    beside z-score (parametric) and MAD (rank spread), and the one every
    BI tool draws. Quartile broadcast + conditional re-aggregation (the
    trimmed-mean plan family)."""
    q = t.customer.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.percentile("c_acctbal", F.lit(0.25)).alias("q1"),
        F.percentile("c_acctbal", F.lit(0.50)).alias("q2"),
        F.percentile("c_acctbal", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (F.col("c_acctbal") < F.col("q1") - 1.5 * iqr) | (
        F.col("c_acctbal") > F.col("q3") + 1.5 * iqr
    )
    return (
        t.customer.join(F.broadcast(q), F.col("c_mktsegment") == F.col("seg"))
        .groupBy("c_mktsegment", "q1", "q2", "q3")
        .agg(F.sum(F.when(out, 1).otherwise(0)).cast("long").alias("n_outliers"))
        .select(
            "c_mktsegment",
            F.round("q1", 4).alias("q1"),
            F.round("q2", 4).alias("q2"),
            F.round("q3", 4).alias("q3"),
            F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            "n_outliers",
        )
    )


@query(
    "agg_pivot_native",
    oracle="""
    SELECT o_orderpriority,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS f_total,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS o_total,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS p_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot_native(t: Tables) -> DataFrame:
    """Native pivot API (`groupBy().pivot(col, values)`): the same
    rows→columns rotation agg_pivot_casewhen spells out by hand, through
    Spark's first-class surface. The VALUES LIST IS EXPLICIT — omitting
    it makes Spark run a hidden distinct-collect job over the pivot
    column (a full extra pass, unbounded width) before it can even plan;
    with the list the plan is ONE partial/final hash agg, identical to
    the case-when form.

    The empty-cell coalesce(0) must be applied AFTER the pivot, in the
    final select: Spark's PivotFirst path emits NULL for any (group,
    value) cell with zero rows REGARDLESS of a coalesce inside the pivot
    aggregate (verified empirically), while the oracle's CASE-WHEN sum
    yields 0 — an inner coalesce alone would hash-mismatch on any
    dataset with an empty cell.

    At 100 TB: same contract as agg_pivot_casewhen — pivot column must
    be low-cardinality (each value becomes a column); high-cardinality
    rotation is a different operator (maps / explode back)."""
    p = t.orders.groupBy("o_orderpriority").pivot(
        "o_orderstatus", ["F", "O", "P"]
    ).agg(F.sum("o_totalprice"))
    return p.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("f_total"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("o_total"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("p_total"),
    )


@query("agg_freq_items", oracle=None)
def agg_freq_items(t: Tables) -> DataFrame:
    """Heavy hitters via Spark's native freqItems (the Karp-Papadimitriou
    -Shenker counter sketch behind df.stat.freqItems): one JVM-side pass,
    per-partition bounded counter maps merged at the driver — the
    constant-memory answer to 'which values exceed s% of a 100 TB
    column' without a full groupBy shuffle.

    Sketch contract (why this is an R row): every item with relative
    frequency > support is GUARANTEED present; items below support MAY
    appear (false positives are allowed, false negatives are not). The
    self-check test pins that superset guarantee against exact counts.
    Output is exploded + sorted so the row set is deterministic for the
    driver's rows-only check."""
    fi = t.orders.stat.freqItems(["o_orderpriority"], support=0.15)
    return fi.select(
        F.explode(F.sort_array(F.col("o_orderpriority_freqItems"))).alias(
            "frequent_item"
        )
    )


@query(
    "agg_crosstab",
    oracle="""
    SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_crosstab(t: Tables) -> DataFrame:
    """Contingency table through the first-class `df.stat.crosstab`
    API — the pair-frequency matrix behind chi-square checks
    (agg_chi_square computes the statistic; this is the raw table via
    the dedicated surface). Output columns are re-selected explicitly
    (F/O/P) because crosstab derives column NAMES from data values —
    fine for a bounded categorical, an anti-pattern for anything
    high-cardinality, where the pivoted width explodes (same contract
    note as agg_pivot_native).

    Plan-wise crosstab compiles to the same single partial/final count
    aggregate as the hand-written CASE form.

    crosstab derives columns from OBSERVED values, so a status absent
    from the data (trivially: empty input) yields no column at all and
    the explicit select would crash — the same lesson as
    agg_pivot_native's explicit values list. Missing domain columns are
    materialized as zero counts; a no-op whenever all three statuses
    occur."""
    ct = t.orders.stat.crosstab("o_orderpriority", "o_orderstatus")
    for status in ("F", "O", "P"):
        if status not in ct.columns:
            ct = ct.withColumn(status, F.lit(0).cast("long"))
    return ct.select(
        "o_orderpriority_o_orderstatus",
        F.col("F").cast("long").alias("f"),
        F.col("O").cast("long").alias("o"),
        F.col("P").cast("long").alias("p"),
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 1
                THEN 'grand_total'
                WHEN GROUPING(o_orderpriority) = 1 THEN 'by_status'
                WHEN GROUPING(o_orderstatus) = 1 THEN 'by_priority'
                ELSE 'detail' END                      AS level,
           o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT)                    AS n_orders,
           round(sum(o_totalprice), 2)                 AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) > 0
    """,
)
def agg_grouping_id(t: Tables) -> DataFrame:
    """CUBE with GROUPING() level discrimination — the surface that
    makes multi-grain rollup outputs self-describing: a NULL status in
    a cube row is ambiguous (real NULL group vs subtotal) until the
    grouping indicator names the level. Emits a human-readable level
    label derived from the two grouping bits (agg_cube is the plain
    cube; this is the disambiguated form a BI layer consumes).

    Plan: one Expand + hash agg (the standard cube plan — each input
    row fans out to the 4 grouping sets map-side, partials combine
    before the shuffle). Spark's grouping() mirrors SQL GROUPING();
    both engines agree the indicator is 1 for the aggregated-away
    column. Empty-input semantics pinned by HAVING count(*) > 0: SQL's
    CUBE emits a zero-count grand-total row over an EMPTY table where
    Spark's cube().agg() emits none (degenerate-tier find) — the HAVING
    only ever drops that empty-input row."""
    g = lambda c: F.grouping(c)  # noqa: E731
    level = (
        F.when((g("o_orderstatus") == 1) & (g("o_orderpriority") == 1), "grand_total")
        .when(g("o_orderpriority") == 1, "by_status")
        .when(g("o_orderstatus") == 1, "by_priority")
        .otherwise("detail")
    )
    # grouping() only resolves INSIDE the cube's agg list (Spark rejects
    # it in a downstream select — the indicator column is gone by then)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            level.alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            "level", "o_orderstatus", "o_orderpriority", "n_orders", "revenue"
        )
    )


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH th AS (
        SELECT o_orderstatus AS st,
               quantile_cont(o_totalprice, 0.05) AS lo,
               quantile_cont(o_totalprice, 0.95) AS hi
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           round(avg(o_totalprice), 4) AS plain_mean,
           round(avg(least(greatest(o_totalprice, th.lo), th.hi)), 4)
               AS winsor_mean,
           CAST(sum(CASE WHEN o_totalprice < th.lo OR o_totalprice > th.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM orders JOIN th ON o_orderstatus = th.st
    GROUP BY o_orderstatus
    """,
)
def agg_winsorized_mean(t: Tables) -> DataFrame:
    """5/95-winsorized mean per group — agg_trimmed_mean's sibling that
    CLAMPS tail values to the percentile band instead of discarding
    them (the estimator of choice when every row must keep unit weight,
    e.g. revenue accounting where dropping outliers understates
    totals). Same two-pass plan: exact per-group 5/95 percentiles
    broadcast (~3 rows), then one conditional re-aggregation with
    least/greatest doing the clamp JVM-side. n_clamped quantifies how
    much tail the estimate absorbed."""
    th = t.orders.groupBy(F.col("o_orderstatus").alias("st")).agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    outband = (F.col("o_totalprice") < F.col("lo")) | (F.col("o_totalprice") > F.col("hi"))
    return (
        t.orders.join(F.broadcast(th), F.col("o_orderstatus") == F.col("st"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("plain_mean"),
            F.round(
                F.avg(F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))),
                4,
            ).alias("winsor_mean"),
            F.sum(F.when(outband, 1).otherwise(0)).cast("long").alias("n_clamped"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    """,
)
def agg_bitmap_distinct(t: Tables) -> DataFrame:
    """EXACT distinct counting through Spark 3.5+'s bitmap aggregate
    surface (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the
    warehouse-native middle ground between countDistinct (exact, but
    re-shuffles raw ids on every query) and HLL sketches (mergeable but
    approximate): per (group, bucket-of-32768) the member ids become
    one bitmap, bitmaps OR-merge algebraically (rollups and incremental
    refreshes re-aggregate bitmaps, never rescan ids), and the final
    count is exact. The merged 'ALL' row is computed FROM THE BITMAPS
    (bitmap_or_agg), not from the raw ids — certifying the merge
    algebra itself against the oracle's count(DISTINCT).

    Scale: one shuffle of (group, bucket) bitmap partials (map-side
    combined, 4 KB per bucket regardless of bucket population); the
    re-aggregation tier is what makes exact daily->monthly distinct
    rollups at 100 TB a bitmap OR instead of a rescan."""
    b = t.events.select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bkt"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    per_bucket = b.groupBy("event_type", "bkt").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct")
    )
    merged = (
        per_bucket.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        # coalesce: the global agg over an EMPTY bucket frame emits one
        # row with a NULL sum where the oracle's count(DISTINCT) over an
        # empty table emits 0 (empty-tier find)
        .agg(
            F.coalesce(F.sum(F.bitmap_count("bm")), F.lit(0))
            .cast("long")
            .alias("n_distinct")
        )
        .select(F.lit("ALL").alias("event_type"), "n_distinct")
    )
    return per_type.unionByName(merged)


@query(
    "agg_skyline_2d",
    oracle="""
    WITH pts AS (
        SELECT c.c_custkey,
               c.c_acctbal AS x,
               round(coalesce(sum(o.o_totalprice), 0), 2) AS y
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    ),
    per_x AS (SELECT x, max(y) AS ymax FROM pts GROUP BY x),
    sky_x AS (
        SELECT x, ymax
        FROM (
            SELECT x, ymax,
                   max(ymax) OVER (ORDER BY x DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS higher_ymax
            FROM per_x
        )
        WHERE higher_ymax IS NULL OR ymax > higher_ymax
    )
    SELECT p.c_custkey, round(p.x, 2) AS acctbal, p.y AS spend
    FROM pts p JOIN sky_x s ON p.x = s.x AND p.y = s.ymax
    """,
)
def agg_skyline_2d(t: Tables) -> DataFrame:
    """2-D skyline (Pareto frontier) of customers on (account balance,
    total spend): the classic maximal-vector OLAP operator — a customer
    is ON the skyline iff no other customer is >= on both axes and
    strictly better on one ('who is undominated on credit AND
    revenue'). NOT the naive all-pairs anti-join: for two dimensions
    the frontier falls out of one sorted sweep — collapse to per-x max
    y, then a running max over x DESC keeps exactly the points whose y
    strictly exceeds every higher-x point's best y (equal-y at higher x
    dominates via strict x; equal (x, y) duplicates survive together,
    restored by the join back). Domination compares 2dp-rounded money
    sums (the repo's cross-engine float rule) so near-ties cannot flip
    the frontier between engines.

    Scale: per-customer collapse and per-x max are map-side-combined
    hash aggs; the sweep window runs over the DISTINCT-x frame
    (declared exact tier — the sort_multikey two-phase rewrite applies
    at billions of distinct values); join-back is x-keyed. This plan is
    the public textbook sort-based skyline (Borzsonyi et al.'s SFS
    idea) expressed as two aggs + one window."""
    pts = (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("y"))
        .select("c_custkey", F.col("c_acctbal").alias("x"), "y")
    )
    per_x = pts.groupBy("x").agg(F.max("y").alias("ymax"))
    w = Window.orderBy(F.desc("x")).rowsBetween(Window.unboundedPreceding, -1)
    sky_x = (
        per_x.withColumn("higher_ymax", F.max("ymax").over(w))
        .filter(F.col("higher_ymax").isNull() | (F.col("ymax") > F.col("higher_ymax")))
        # rename: sky_x shares pts' lineage (per_x is derived from pts),
        # so same-name join columns trip the ambiguous-self-join check
        .select(F.col("x").alias("sx"), F.col("ymax").alias("symax"))
    )
    return (
        pts.join(sky_x, (F.col("x") == F.col("sx")) & (F.col("y") == F.col("symax")))
        .select(
            "c_custkey",
            F.round(F.col("x"), 2).alias("acctbal"),
            F.col("y").alias("spend"),
        )
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ', ' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_listagg(t: Tables) -> DataFrame:
    """listagg(... ) WITHIN GROUP (ORDER BY ...) — Spark 4.0's
    SQL:2016 ordered string aggregation (SPARK-42746): the per-group
    CSV of member names every report footer wants, with the ORDER BY
    making the concatenation deterministic (an unordered collect_list
    + concat_ws varies with partitioning — exactly the flakiness this
    surface exists to kill). Hash-checked against DuckDB's equivalent
    string_agg(... ORDER BY ...).

    Scale: group-bounded — the aggregation buffers one ordered list
    per group; appropriate for dimension-sized groups (nations per
    region), never for fact-sized ones (that's array_agg + explode
    territory, or a top-k truncation first)."""
    spark = t.nation.sparkSession
    return spark.sql(
        """
        SELECT r.r_name,
               count(*) AS n_nations,
               listagg(n.n_name, ', ') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations
        FROM {nation} n JOIN {region} r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """,
        nation=t.nation,
        region=t.region,
    )


@query(
    "agg_corr_matrix",
    oracle="""
    WITH c AS (
        SELECT corr(l_quantity, l_extendedprice) AS qp,
               corr(l_quantity, l_discount)      AS qd,
               corr(l_extendedprice, l_discount) AS pd
        FROM lineitem
    )
    SELECT 'l_quantity' AS var_a, 'l_extendedprice' AS var_b, round(qp, 6) AS corr FROM c
    UNION ALL
    SELECT 'l_quantity', 'l_discount', round(qd, 6) FROM c
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', round(pd, 6) FROM c
    """,
)
def agg_corr_matrix(t: Tables) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle, long form)
    over the lineitem measures — the feature-screening pass every
    modeling pipeline runs before it trusts a regression
    (agg_regression computes ONE pair's slope; this reports every
    pair's association in one scan). All three correlations come from
    a SINGLE aggregate pass (one map-side-combined co-moment
    computation per pair inside the same hash agg), then unpivot
    in-row into (var_a, var_b, corr) rows — never three scans.

    Engine note: both engines accumulate co-moments with the standard
    numerically-stable one-pass update; summation-order ulp is
    absorbed by the 6dp round (the llm_vectors convention)."""
    c = t.lineitem.agg(
        F.corr("l_quantity", "l_extendedprice").alias("qp"),
        F.corr("l_quantity", "l_discount").alias("qd"),
        F.corr("l_extendedprice", "l_discount").alias("pd"),
    )
    return c.selectExpr(
        """stack(3,
            'l_quantity',      'l_extendedprice', round(qp, 6),
            'l_quantity',      'l_discount',      round(qd, 6),
            'l_extendedprice', 'l_discount',      round(pd, 6)
        ) AS (var_a, var_b, corr)"""
    )


@query("agg_hll_native", oracle=None)  # R: datasketches binary sketches —
# estimates are implementation-specific; self-check vs exact distinct in tests
def agg_hll_native(t: Tables) -> DataFrame:
    """Native HyperLogLog distinct sketches (Spark 3.5's Apache
    DataSketches surface: hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate) — the BUILT-IN twin of the repo's
    from-scratch sketch_hll_rollup: per event_type, a 12-bit-configK
    sketch estimates distinct users, and the ALL row is computed by
    UNION-MERGING the per-group sketches, never rescanning ids —
    certifying the re-aggregation algebra (daily -> monthly rollups at
    100 TB merge kilobyte sketches instead of re-shuffling raw ids).

    Rows-only: sketch binaries and their estimates are DataSketches-
    implementation-specific (DuckDB's approx_count_distinct is a
    different HLL); the binding checks are in tests — every estimate
    within the configK error envelope of the exact count, and the
    merged ALL row consistent with the exact global distinct.

    Scale: one (event_type)-keyed sketch agg (map-side combined, ~4 KB
    partials), one 5-row union merge."""
    per = t.events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    groups = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("n_users_est"),
    )
    total = per.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("n_users_est"),
    )
    return groups.unionByName(total)


_TOPK_SKETCH_K = 10
_TOPK_SKETCH_CAP = 100000  # maxItemsTracked >> distinct parts: sketch is exact


@query("agg_approx_top_k", oracle=None)  # R: sketch surface — tie order and
# estimate semantics are implementation-specific; exactness pinned in tests
def agg_approx_top_k(t: Tables) -> DataFrame:
    """approx_top_k (Spark 4.0 sketch surface): the top-10
    most-frequent part keys across lineitem from ONE streaming sketch
    aggregate — the heavy-hitters report (hot keys, skew candidates,
    trending items) without a full groupBy + global sort. The sketch
    is sized (maxItemsTracked=100000) far above the distinct-part
    count at every test SF, so counts are EXACT here and the test tier
    asserts set-equality against the exact groupBy top-10; at true
    100 TB cardinalities the same plan degrades gracefully to
    approximate counts instead of OOMing.

    Rows-only: rank ties inside the sketch's returned array break by
    stream order, not a total order (the exact twin breaks ties by
    key), so the emitted ROW SET can differ across engines/runs at tie
    boundaries; the test tier checks count-multiset equality instead."""
    return (
        t.lineitem.agg(
            F.expr(
                f"approx_top_k(l_partkey, {_TOPK_SKETCH_K}, {_TOPK_SKETCH_CAP})"
            ).alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("l_partkey"),
            F.col("e.count").cast("long").alias("n_lines"),
        )
    )
