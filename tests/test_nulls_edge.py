"""Null-semantics and edge cases the fixtures cannot cover — the
synthetic tables contain NO NULLs anywhere (FIXTURES.md, measured), so
this layer carries the null-handling weight (SURVEY §5.4 / risk 5)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("grp", StringType(), True),
        StructField("v", DoubleType(), True),
    ]
)

ROWS = [
    (1, "a", 1.0),
    (2, "a", None),
    (3, None, 3.0),
    (4, "b", None),
    (5, None, None),
]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_agg_null_semantics(spark):
    df = _df(spark)
    r = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_v"),  # count(col) skips NULLs
        F.sum("v").alias("sum_v"),
        F.avg("v").alias("avg_v"),  # avg over non-null only
        F.countDistinct("grp").alias("n_grp"),  # NULL not a distinct value
    ).collect()[0]
    assert (r.n_rows, r.n_v, r.sum_v, r.avg_v, r.n_grp) == (5, 2, 4.0, 2.0, 2)


def test_groupby_null_key_is_a_group(spark):
    got = {r.grp: r.n for r in _df(spark).groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a": 2, "b": 1, None: 2}


def test_outer_join_null_fill_and_null_keys_dont_match(spark):
    left = _df(spark).select("k", "grp")
    right = _df(spark).select(F.col("grp").alias("grp2"), F.col("v").alias("rv"))
    j = left.join(right, left.grp == right.grp2, "left")
    # NULL keys never equi-match (not even each other)
    null_rows = j.filter(F.col("k").isin(3, 5)).collect()
    assert all(r.rv is None and r.grp2 is None for r in null_rows)


def test_null_safe_equality(spark):
    df = _df(spark)
    n = df.alias("a").join(df.alias("b"), F.col("a.grp").eqNullSafe(F.col("b.grp"))).count()
    # groups: a(2)+b(1)+null(2) -> 4 + 1 + 4 = 9 pairs with <=> semantics
    assert n == 9


def test_sort_nulls_first_last(spark):
    df = _df(spark)
    first = [r.grp for r in df.orderBy(F.col("grp").asc_nulls_first(), "k").collect()]
    last = [r.grp for r in df.orderBy(F.col("grp").asc_nulls_last(), "k").collect()]
    assert first[:2] == [None, None] and last[-2:] == [None, None]


def test_window_over_single_row_partition(spark):
    df = _df(spark)
    w = Window.partitionBy("k").orderBy("v").rowsBetween(-6, 0)
    out = df.select("k", F.avg("v").over(w).alias("m")).collect()
    assert len(out) == 5  # no crash; NULL v -> NULL avg
    got = {r.k: r.m for r in out}
    assert got[1] == 1.0 and got[2] is None


def test_topk_ties_are_pinned(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 10.0), (4, 5.0)], ["id", "score"]
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    top2 = [r.id for r in df.withColumn("rn", F.row_number().over(w)).filter("rn <= 2").collect()]
    assert top2 == [1, 2]  # deterministic under ties


def test_empty_group_filter_yields_empty_frame(spark, tables):
    out = tables.lineitem.filter(F.col("l_quantity") > 1e9).groupBy("l_returnflag").count()
    assert out.count() == 0


def test_set_ops_null_rows(spark):
    a = _df(spark).select("grp")
    inter = a.intersect(a.filter(F.col("grp").isNull()))
    # INTERSECT treats NULL = NULL (distinct set semantics)
    assert [r.grp for r in inter.collect()] == [None]


def test_explode_empty_array(spark):
    df = spark.createDataFrame([(1, []), (2, ["x"])], ["id", "arr"])
    assert df.select(F.explode("arr")).count() == 1  # empty arrays vanish
    assert df.select(F.explode_outer("arr")).count() == 2  # _outer keeps them


# ---- as-of / bucketized range join under NULL keys (VERDICT r1 item 8).
# The fixtures contain no NULLs, so these pin the operators' null
# semantics on hand-built events frames driven through the SAME code path
# (runner.tables_fn).

_EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _events_with_nulls(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # normal user: click then purchase
        (1, 10, "click", t0, 1.0),
        (2, 10, "purchase", t0 + 5 * m, 2.0),
        # NULL-user click and purchase
        (3, None, "click", t0 + m, 3.0),
        (4, None, "purchase", t0 + 2 * m, 4.0),
        # NULL-ts click for user 20, then a real purchase
        (5, 20, "click", None, 5.0),
        (6, 20, "purchase", t0 + 10 * m, 6.0),
        # purchase with NULL ts
        (7, 30, "purchase", None, 7.0),
        (8, 30, "click", t0, 8.0),
    ]
    return spark.createDataFrame(rows, _EV_SCHEMA)


class _T:
    def __init__(self, events):
        self.events = events


def test_join_asof_null_keys(spark):
    from base_etl_spark import queries

    ev = _events_with_nulls(spark)
    out = {r.probe_id: r.matched_click for r in
           queries()["join_asof"].tables_fn(_T(ev)).collect()}
    # normal path still matches
    assert out[2] == 1
    # NULL users form ONE window partition (window semantics, identical
    # in the DuckDB oracle formulation): the NULL-user purchase sees the
    # NULL-user click
    assert out[4] == 3
    # NULL ts sorts FIRST (Spark asc default), so the NULL-ts click is
    # 'before' every real timestamp and matches
    assert out[6] == 5
    # a NULL-ts purchase sorts before its user's real-ts clicks -> no match
    assert out[7] is None
    assert len(out) == 4


def test_join_range_bucketized_null_keys(spark):
    from base_etl_spark import queries

    ev = _events_with_nulls(spark)
    out = {r.probe_id: (r.n_clicks, r.click_value) for r in
           queries()["join_range_bucketized"].tables_fn(_T(ev)).collect()}
    # every purchase appears exactly once (left join back to probes)
    assert set(out) == {2, 4, 6, 7}
    assert out[2] == (1, 1.0)
    # equi-join semantics: NULL user/ts never equi-match -> zero clicks,
    # but the probe row survives with coalesced zeros
    assert out[4] == (0, 0.0)
    assert out[6] == (0, 0.0)  # its only click has NULL ts
    assert out[7] == (0, 0.0)  # NULL-ts probe has no bucket


def test_scd2_empty_updates_keeps_dim_current(spark):
    """SCD2 with an empty update set is a no-op: every key stays current."""
    from base_etl_spark.etl import scd2_apply

    dim = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    empty = spark.createDataFrame([], "k long, v double")
    out = scd2_apply(dim, empty, "k", "2024-01-01", ["v"]).collect()
    assert len(out) == 2 and all(r.is_current for r in out)


def test_funnel_empty_stage_truncates(spark):
    """No click events at all -> every user stops at stage 1 with null
    click/purchase timestamps."""
    from base_etl_spark import queries
    from tests.conftest import SF_TEST
    from base_etl_spark.io import load_tables

    t = load_tables(spark, SF_TEST)

    class _Shim:  # events_funnel only touches t.events
        events = t.events.filter(F.col("event_type") != "click")

    rows = queries()["events_funnel"].tables_fn(_Shim()).collect()
    assert rows and all(r.funnel_stage == 1 for r in rows)
    assert all(r.t_click is None and r.t_purchase is None for r in rows)


def test_bucket_pairs_empty_and_singleton_buckets(spark):
    """Buckets of size 1 and an empty input both yield no pairs."""
    from base_etl_spark.operators.llm_dedup import bucket_pairs

    single = spark.createDataFrame([(1, 0, 7), (2, 0, 8)], "id long, band int, bh long")
    assert bucket_pairs(single, "id", "a", "b").count() == 0
    empty = spark.createDataFrame([], "id long, band int, bh long")
    assert bucket_pairs(empty, "id", "a", "b").count() == 0


# ---- ADVICE r4 regressions: boundary semantics that fixtures never hit.


def test_boilerplate_spans_short_docs(spark):
    """Docs shorter than 30 chars must yield no spans, not crash: Spark's
    sequence(1, len-29, 10) throws 'Illegal sequence boundaries' when the
    upper bound drops below the start unless they are filtered first."""
    from base_etl_spark import queries

    docs = spark.createDataFrame(
        [
            (1, "tiny"),
            (2, "x" * 29),
            (3, "All rights reserved. " * 5),
            (4, "All rights reserved. " * 5),
        ],
        "doc_id long, text string",
    )

    class _T:
        documents = docs

    rows = queries()["text_boilerplate_spans"].tables_fn(_T()).collect()
    assert rows, "shared 100-char boilerplate must surface"
    assert all(r.n_docs == 2 for r in rows)  # only docs 3+4 share spans


def test_session_gap_exact_microsecond_boundary(spark):
    """The 30-min session gap compares exact microseconds (oracle:
    ts - lag(ts) > INTERVAL 30 MINUTES). A gap of 1800.000001 s starts a
    new session; 1800.0 s exactly and 1799.5 s do not. The old
    floor-second cast called 1800.000001 a 1800 s gap (same session)."""
    import datetime as dt

    from base_etl_spark import queries

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, 10, "click", t0, 1.0),
        (2, 10, "click", t0 + 1799.5 * s, 1.0),  # same session
        (3, 10, "click", t0 + 3599.5 * s, 1.0),  # gap exactly 1800 s: same
        (4, 10, "click", t0 + 5399.500001 * s, 1.0),  # > 1800 s: NEW session
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)

    class _T:
        events = ev

    (out,) = queries()["events_session_stats"].tables_fn(_T()).collect()
    assert out.n_sessions == 2
    assert out.max_events == 3
    assert out.n_bounce == 1


def test_pivot_native_empty_cell_is_zero(spark):
    """A (priority, status) cell with zero rows must surface as 0.0 like
    the oracle's CASE-WHEN sum, not the NULL that Spark's PivotFirst
    emits regardless of any coalesce inside the pivot aggregate."""
    from base_etl_spark import queries

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", "F", 10.0),
            (2, "1-URGENT", "O", 20.5),
            # no 'P' row for 1-URGENT; no rows at all for 5-LOW except P
            (3, "5-LOW", "P", 7.25),
        ],
        "o_orderkey long, o_orderpriority string, o_orderstatus string,"
        " o_totalprice double",
    )

    class _T:
        pass

    _T.orders = orders
    got = {
        r.o_orderpriority: r
        for r in queries()["agg_pivot_native"].tables_fn(_T()).collect()
    }
    assert got["1-URGENT"].p_total == 0.0
    assert got["5-LOW"].f_total == 0.0 and got["5-LOW"].o_total == 0.0
    assert got["1-URGENT"].f_total == 10.0 and got["5-LOW"].p_total == 7.25
