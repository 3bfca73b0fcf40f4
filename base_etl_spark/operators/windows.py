"""Window-function family (SURVEY §2.5).

Frames are ALWAYS explicit: Spark's implicit frame under ORDER BY is
RANGE UNBOUNDED PRECEDING..CURRENT ROW, which silently diverges from
other engines on ties — every window below pins its frame and a total
tie-break order (SURVEY §7 step 3).

Scale note: each window is one shuffle on its partition key + a sort
within partitions. Keys here (customer, user) are high-cardinality, so
partitions stay small; a low-cardinality partition key at 100 TB would
need pre-bucketing or a two-level (salted) rollup instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from base_etl_spark.io import Tables
from base_etl_spark.registry import query


@query(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(t: Tables) -> DataFrame:
    """Top-3 orders per customer; ties broken by orderkey (total order)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk
    FROM lineitem
    """,
)
def win_rank_dense(t: Tables) -> DataFrame:
    """rank vs dense_rank over heavy ties (50 distinct quantities)."""
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts))  OVER w AS gap_us,
           lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(t: Tables) -> DataFrame:
    """Per-user inter-event gaps in microseconds (lag + lead)."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.lead(us).over(w) - us).alias("next_gap_us"),
    )


@query(
    "win_moving_avg",
    oracle="""
    WITH c AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               cast(floor(o_totalprice * 100.0 + 0.5) AS bigint) AS cents
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           sum(cents)  OVER w / (100.0 * count(*) OVER w) AS avg_7
    FROM c
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(t: Tables) -> DataFrame:
    """7-row moving average of order totals per customer.

    Computed over exact integer cents: windowed double avg() differs
    between engines in summation order (DuckDB's segment tree vs Spark's
    sliding accumulator), which flips ~0.7% of 2dp-rounded values. Integer
    window sums are exact, and the final double division has identical
    operands on both sides — bit-exact without any rounding."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w) / (100.0 * F.count(F.lit(1)).over(w))).alias("avg_7"),
    )


@query(
    "win_range_frame",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS day_rev
        FROM orders GROUP BY o_orderdate
    )
    SELECT day, day_rev,
           round(sum(day_rev) OVER (
               ORDER BY day
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
    FROM daily
    """,
)
def win_range_frame(t: Tables) -> DataFrame:
    """Running revenue by date with an explicit RANGE frame over the
    pre-aggregated daily series (group first => the window input is one
    row per day, so the cumulative sum is order-deterministic).

    The bare Window.orderBy here is BOUNDED BY CONSTRUCTION: its input is
    the post-aggregation one-row-per-day series (~2.4k rows for 7 years
    of orders — and still only ~thousands at 100 TB, because the grain is
    calendar days, not input rows). The partial aggregation before it is
    what absorbs the scale; a two-phase rank over a table this size would
    add two shuffles to save a single-task pass over a few KB."""
    daily = t.orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("day_rev")
    )
    w = Window.orderBy("day").rangeBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", "day_rev", F.round(F.sum("day_rev").over(w), 2).alias("running_rev")
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def win_distribution(t: Tables) -> DataFrame:
    """ntile/percent_rank/cume_dist; ntile is order-sensitive on ties, so
    the order is made total with the primary key.

    Two-phase global rank (the 100 TB plan — a bare Window.orderBy moves
    the ENTIRE table through one task): (1) bucket rows by static acctbal
    ranges (width_bucket over the known TPC-H domain — no sampling pass),
    (2) row_number within each bucket (hash-distributed window), (3) add
    broadcast cumulative bucket-count offsets -> global rn. Because the
    order is total (c_custkey breaks all ties), every distribution
    function is a closed form of (rn, n): percent_rank = (rn-1)/(n-1)
    — with the SQL-standard n=1 special case pinned explicitly, because
    0/0 is NULL under Spark's non-ANSI division while percent_rank of a
    lone row is defined as 0.0 (found by the one-row degenerate tier) —
    cume_dist = rn/n, and ntile(4) follows the SQL-standard first-(n%4)-
    tiles-get-one-extra rule. Only the tiny bucket-offsets table is ever
    single-partition."""
    bucket = F.width_bucket(F.col("c_acctbal"), F.lit(-1000.0), F.lit(10000.0), F.lit(32))
    local_w = Window.partitionBy("bucket").orderBy("c_acctbal", "c_custkey")
    base = t.customer.withColumn("bucket", bucket)
    counts = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_b"))
    off_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n_b").over(off_w), F.lit(0)).alias("b_off")
    )
    total = t.customer.agg(F.count(F.lit(1)).alias("n_total"))
    rn = F.col("b_off") + F.col("local_rn")
    n = F.col("n_total")
    # SQL-standard ntile: q = n//4, r = n%4; first r tiles hold q+1 rows
    q, r = F.floor(n / 4), n % 4
    quartile = (
        F.when(rn <= r * (q + 1), F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - r * (q + 1) - 1) / q) + 1)
        .cast("int")
    )
    return (
        base.withColumn("local_rn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            "c_acctbal",
            quartile.alias("quartile"),
            F.round(
                F.when(n == 1, F.lit(0.0)).otherwise((rn - 1) / (n - 1)), 6
            ).alias("pct_rank"),
            F.round(rn / n, 6).alias("cdist"),
        )
    )


@query(
    "win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           date_trunc('day', ts) AS day,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(t: Tables) -> DataFrame:
    """First/last/second event value per user-day; the unbounded frame is
    what makes last_value mean 'last of the whole partition'."""
    day = F.date_trunc("day", F.col("ts"))
    w = (
        Window.partitionBy("user_id", day)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.events.select(
        "user_id",
        day.alias("day"),
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    ).distinct()


@query(
    "win_running_distinct",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT user_id, event_id, ts,
           CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_types_seen
    FROM marked
    """,
)
def win_running_distinct(t: Tables) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user over time — a window
    Spark (and ANSI SQL) cannot express directly (COUNT DISTINCT is not
    allowed in a running frame). The standard rewrite: mark each (user,
    event_type)'s FIRST occurrence with a per-type row_number, then a
    plain running sum of the markers counts distinct types seen so far.

    Two window passes over the SAME user-keyed shuffle (the second
    partitions by a prefix of the first, so no second exchange); no
    collect_set state that would grow with cardinality — at 100 TB the
    state per row stays one integer regardless of how many distinct
    values exist."""
    first_w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = t.events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0).alias("is_first"),
    )
    return marked.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("is_first").over(run_w).cast("long").alias("n_types_seen"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_mktsegment, decile,
           CAST(count(*) AS BIGINT)     AS n_customers,
           round(min(c_acctbal), 2)     AS lo_bal,
           round(max(c_acctbal), 2)     AS hi_bal
    FROM (
        SELECT c_mktsegment, c_acctbal,
               ntile(10) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    GROUP BY c_mktsegment, decile
    """,
)
def win_ntile(t: Tables) -> DataFrame:
    """Equi-populated decile banding (ntile) per market segment — the
    percentile-bucket assignment scorecards and monotonicity checks are
    built on. ntile's bucket arithmetic is deterministic ONLY under a
    total order, so ties on c_acctbal are pinned by c_custkey (both
    engines place the same rows in the same bucket).

    One shuffle on the segment key + in-partition sort, then the decile
    re-agg reuses the same partitioning (no second exchange). Segments
    are low-cardinality (5), so at 100 TB this exact shape would skew —
    the documented upgrade is the two-phase rank discipline
    (etl_id_gap_audit's bucketing) or approx_percentile banding; at
    dimension-table cardinality the single window is the right plan."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t.customer.select(
            "c_mktsegment", "c_acctbal", F.ntile(10).over(w).alias("decile")
        )
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("lo_bal"),
            F.round(F.max("c_acctbal"), 2).alias("hi_bal"),
        )
    )


@query(
    "win_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders GROUP BY 1
    )
    SELECT day,
           round(rev_cents / 100.0, 2) AS revenue,
           round(quantile_cont(rev_cents, 0.5) OVER (
               ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) / 100.0, 2) AS rolling_median_7d
    FROM daily
    """,
)
def win_rolling_median(t: Tables) -> DataFrame:
    """7-day rolling MEDIAN of daily revenue — the robust trend line
    (a single flash-sale day drags a rolling mean for a week; the
    median shrugs it off). percentile() is a full aggregate usable over
    a window frame, so this stays one JVM window pass — no UDF, no
    collect_list.

    Median inputs are EXACT INTEGER CENTS (the orders_cohort_ltv
    lesson): the daily sums are then identical longs on both engines,
    and the 7-value interpolated median of integers divides by at most
    2 — exact in double — so the 2dp edge round cannot straddle.

    The window is a bare orderBy over the DAILY grain — bounded by the
    calendar (one row per day, ~2.4k rows at any SF), the documented
    exception class; the fact-sized work is the daily hash agg."""
    daily = t.orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev_cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(
            F.expr("percentile(rev_cents, 0.5)").over(w) / 100.0, 2
        ).alias("rolling_median_7d"),
    )


@query(
    "win_percent_rank_cume",
    oracle="""
    SELECT c_mktsegment, rn,
           c_custkey                 AS custkey,
           round(c_acctbal, 2)       AS acctbal,
           round(pr, 6)              AS pct_rank,
           round(cd, 6)              AS cume
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number()   OVER w AS rn,
               percent_rank() OVER w AS pr,
               cume_dist()    OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    )
    WHERE rn <= 10
    """,
)
def win_percent_rank_cume(t: Tables) -> DataFrame:
    """Relative-position window functions (percent_rank + cume_dist)
    over the per-segment balance order, reported for each segment's top
    10 — the distribution-position readout behind 'top x%' customer
    tiers. Both functions depend on PEER groups, so the order is pinned
    total ((acctbal DESC, custkey)): no ties, identical positions in
    both engines, and cume_dist == rn/n exactly.

    One shuffle on the segment key; all three window functions share
    one sort (same WINDOW spec), and the rn <= 10 filter bounds the
    output while the full partition is still scanned — at 100 TB, if
    only the top rows matter, pre-prune with the two-phase global-rank
    discipline (etl_id_gap_audit) before paying the full sort."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        t.customer.select(
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.col("c_custkey").alias("custkey"),
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("rn") <= 10)
    )


@query(
    "win_locf_fill",
    oracle="""
    SELECT user_id, event_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN round(value, 4) END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_value
    FROM events
    """,
)
def win_locf_fill(t: Tables) -> DataFrame:
    """Last-observation-carried-forward: attach the most recent
    PURCHASE amount to every event in the user's stream (NULL until
    the first purchase) — the standard sparse-signal densification
    behind 'value of customer at time of click' features and gap-free
    state snapshots. The sparse series is derived (CASE on event_type),
    so the fill is genuinely exercised: most events are not purchases.
    F.last(ignorenulls) over a running frame == last_value IGNORE NULLS
    in both engines; (ts, event_id) ordering makes ties deterministic.

    Scale: ONE window partitioned by user_id (bounded partitions, one
    hash exchange — never a global sort); the carried state is O(1) per
    user, so the same operator streams via applyInPandasWithState when
    the feed goes online (the win_ewma_time_decay posture). The
    rounding happens BEFORE the carry, so carried values equal their
    source row's rounded value exactly."""
    src = F.when(
        F.col("event_type") == "purchase", F.round(F.col("value"), 4)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.events.select(
        "user_id",
        "event_id",
        "event_type",
        F.last(src, ignorenulls=True).over(w).alias("last_purchase_value"),
    )
