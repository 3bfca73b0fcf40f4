"""Scalar function surface (SURVEY §2.8): string / regexp / date / math /
conditional / cast / array / map / json.

Everything here is a built-in `pyspark.sql.functions` expression — JVM-side,
inside whole-stage codegen, no Python in the row path. Each oracle pins the
DuckDB dialect equivalent explicitly; known divergences and their pinning:

- dayofweek: Spark 1=Sunday..7, DuckDB 0=Sunday..6 -> oracle adds 1.
- ceil/floor: Spark returns LONG, DuckDB DOUBLE -> oracle casts to BIGINT.
- cast(double as int): Spark truncates toward zero, DuckDB rounds ->
  both sides round explicitly first.
- sign(): Spark returns DOUBLE, DuckDB INT -> cast both to INT/LONG? Spark
  signum double -> cast to int on both sides.
- datediff: Spark datediff(end, start); DuckDB date_diff('day', start, end).
- timestamp->string: via explicit format pattern on both sides, never raw cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType

from base_etl_spark.functions import money, money_sql
from base_etl_spark.io import Tables
from base_etl_spark.registry import query


@query(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS up_name,
           lower(c_mktsegment)                   AS lo_seg,
           substr(c_name, 1, 8)                  AS name_prefix,
           trim(concat('  ', c_name, ' '))       AS trimmed,
           lpad(cast(c_custkey AS varchar), 12, '0') AS padded_key,
           concat_ws('|', c_name, c_mktsegment)  AS joined,
           replace(c_name, 'Customer', 'Cust')   AS replaced,
           length(c_name)                        AS name_len
    FROM customer
    """,
)
def str_funcs(t: Tables) -> DataFrame:
    """upper/lower/substr/trim/lpad/concat_ws/replace/length."""
    return t.customer.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.length("c_name").alias("name_len"),
    )


@query(
    "str_regexp",
    oracle="""
    SELECT p_partkey,
           cast(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS int) AS brand_no,
           regexp_replace(p_name, '[aeiou]', '_', 'g')               AS devoweled,
           (p_name LIKE '%bolt%')                                    AS has_bolt,
           regexp_matches(p_type, '^(ECONOMY|PROMO)')                AS is_cheap_type
    FROM part
    """,
)
def str_regexp(t: Tables) -> DataFrame:
    """regexp_extract with group, global regexp_replace, LIKE, RLIKE.
    DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics; the character-class pattern avoids escape
    dialect differences."""
    return t.part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("int").alias("brand_no"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").like("%bolt%").alias("has_bolt"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_cheap_type"),
    )


@query(
    "str_split_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def str_split_explode(t: Tables) -> DataFrame:
    """Tokenize: one row per (doc, token) — the 1->N generator shape.
    explode() is a native generator operator (no UDTF needed)."""
    return t.documents.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                               AS yr,
           month(o_orderdate)                              AS mon,
           quarter(o_orderdate)                            AS qtr,
           dayofmonth(o_orderdate)                         AS dom,
           dayofweek(o_orderdate) + 1                      AS dow,
           date_trunc('month', o_orderdate)                AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           o_orderdate + INTERVAL 3 MONTH                  AS plus_3m,
           o_orderdate + INTERVAL 30 DAY                   AS plus_30d,
           strftime(o_orderdate, '%Y-%m-%d')               AS iso_day
    FROM orders
    """,
)
def date_funcs(t: Tables) -> DataFrame:
    """Calendar functions. dow pinned to Spark's 1=Sunday convention;
    month arithmetic end-of-month clamping agrees between engines."""
    d = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mon"),
        F.quarter(d).alias("qtr"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("2000-01-01 00:00:00").cast("timestamp"), d).alias("days_to_y2k"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3m"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {money_sql('l_extendedprice')}                      AS price_2dp,
           abs(l_discount - 0.05)                              AS abs_diff,
           cast(ceil(l_quantity) AS bigint)                    AS qty_ceil,
           cast(floor(l_quantity) AS bigint)                   AS qty_floor,
           round(sqrt(l_extendedprice), 6)                     AS price_sqrt,
           round(pow(l_quantity, 2.0), 6)                      AS qty_sq,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END         AS price_ln,
           CASE WHEN l_extendedprice > 0
                THEN round(log10(l_extendedprice), 6) END      AS price_log10,
           round(exp(l_discount), 6)                           AS disc_exp,
           cast(sign(l_discount - 0.05) AS int)                AS disc_sign,
           l_linenumber % 3                                    AS line_mod
    FROM lineitem
    """,
)
def math_funcs(t: Tables) -> DataFrame:
    """round/abs/ceil/floor/sqrt/pow/ln/log10/exp/sign/mod.
    Transcendentals (sqrt is exact IEEE; ln/log10/exp are libm) are
    rounded to 6dp to absorb last-ulp libm differences.

    Log domain (fuzz harness, r5): Spark's ln/log10 return NULL outside
    the domain while DuckDB RAISES ('cannot take logarithm of zero') —
    a free-price row would crash the oracle-shaped query on one engine
    and not the other, so both sides guard x > 0 explicitly and emit
    NULL for the rest."""
    q, price, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        money(price).alias("price_2dp"),
        F.abs(disc - 0.05).alias("abs_diff"),
        F.ceil(q).alias("qty_ceil"),
        F.floor(q).alias("qty_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.pow(q, 2.0), 6).alias("qty_sq"),
        F.when(price > 0, F.round(F.log(price), 6)).alias("price_ln"),
        F.when(price > 0, F.round(F.log10(price), 6)).alias("price_log10"),
        F.round(F.exp(disc), 6).alias("disc_exp"),
        F.signum(disc - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@query(
    "cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                        AS size_bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending,
           greatest(o_totalprice, 150000.0)             AS at_least,
           least(o_totalprice, 150000.0)                AS at_most,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def cond_funcs(t: Tables) -> DataFrame:
    """case-when / coalesce / nullif / greatest / least / if."""
    price = F.col("o_totalprice")
    return t.orders.select(
        "o_orderkey",
        F.when(price > 300000, "big").when(price > 100000, "mid").otherwise("small").alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_or_pending"
        ),
        F.greatest(price, F.lit(150000.0)).alias("at_least"),
        F.least(price, F.lit(150000.0)).alias("at_most"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "cast_funcs",
    oracle="""
    SELECT o_orderkey,
           cast(o_orderkey AS varchar)                   AS key_str,
           cast(cast(o_orderkey AS varchar) AS bigint)   AS key_roundtrip,
           cast(round(o_totalprice, 0) AS bigint)        AS price_int,
           cast(o_orderkey AS double)                    AS key_dbl,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')    AS date_str,
           cast('1996-06-15 12:30:00' AS timestamp)      AS ts_lit,
           cast('123.5' AS double)                       AS num_lit
    FROM orders
    """,
)
def cast_funcs(t: Tables) -> DataFrame:
    """Casts across int/double/string/timestamp. double->int goes through
    an explicit round() on both sides (Spark truncates, DuckDB rounds);
    timestamp->string goes through an explicit format pattern."""
    return t.orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.round("o_totalprice", 0).cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("date_str"),
        F.lit("1996-06-15 12:30:00").cast("timestamp").alias("ts_lit"),
        F.lit("123.5").cast("double").alias("num_lit"),
    )


@query(
    "array_funcs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    SELECT doc_id,
           len(tokens)                                  AS n_tokens,
           list_contains(tokens, 'spark')               AS has_spark,
           len(list_slice(tokens, 2, 4))                AS slice_len,
           list_sort(list_distinct(tokens))[1]          AS first_token_sorted,
           len(list_distinct(tokens))                   AS n_distinct_tokens
    FROM toks
    """,
)
def array_funcs(t: Tables) -> DataFrame:
    """size / array_contains / slice / sort_array / array_distinct
    (array-typed intermediates, scalar outputs — scalars hash identically
    across engines; raw array values would compare representation).
    Spark slice(arr,2,3) == DuckDB list_slice(arr,2,4) (start+length vs
    inclusive bounds)."""
    toks = t.documents.select("doc_id", F.split("text", " ").alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.size(F.slice("tokens", 2, 3)).alias("slice_len"),
        F.element_at(F.sort_array(F.array_distinct("tokens")), 1).alias("first_token_sorted"),
        F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
    )


@query(
    "array_agg",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           count(DISTINCT c_mktsegment)                                 AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def array_agg(t: Tables) -> DataFrame:
    """collect_set per group, sorted then joined for a deterministic,
    engine-neutral scalar representation."""
    j = t.customer.join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
    return j.groupBy("n_name").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           CASE WHEN props IS NULL THEN NULL
                ELSE coalesce(array_to_string(json_keys(props), ','), '')
           END                                      AS prop_keys,
           cast(json_extract(props, '$.k') AS int)  AS k_val
    FROM events
    """,
)
def map_funcs(t: Tables) -> DataFrame:
    """JSON string -> MapType via from_json; map_keys + element access.
    (The map itself stays internal; outputs are engine-neutral scalars.)

    Empty-object edge (fuzz harness, r5): Spark's array_join over the
    empty key list yields '' while DuckDB's array_to_string([]) yields
    NULL — the oracle coalesces the empty list to '' (NULL props stays
    NULL on both sides)."""
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    return t.events.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        m.getItem("k").alias("k_val"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(cast(json_extract(props, '$.k') AS int)) AS BIGINT) AS sum_k,
           round(avg(cast(json_extract(props, '$.k') AS int)), 6)       AS avg_k,
           count(*)                                                     AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_extract(t: Tables) -> DataFrame:
    """get_json_object path extraction feeding an aggregate.

    sum_k is pinned to BIGINT on both sides: DuckDB's round(sum(INT), 2)
    yields DOUBLE while Spark's sum(int) is LONG — identical values,
    different dtypes under a strict value-hash (round-2 driver FAIL)."""
    k = F.get_json_object("props", "$.k").cast("int")
    return t.events.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "str_fuzzy",
    oracle="""
    SELECT p_partkey, p_name,
           levenshtein(p_name, 'red widget') AS dist
    FROM part
    WHERE levenshtein(p_name, 'red widget') <= 5
    """,
)
def str_fuzzy(t: Tables) -> DataFrame:
    """Fuzzy matching by edit distance (ETL record-linkage staple).
    Identical DP algorithm in both engines -> exact integer parity."""
    d = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return t.part.select("p_partkey", "p_name", d.alias("dist")).filter(d <= 5)


@query(
    "join_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > 1.10 * (SELECT avg(c2.c_acctbal) FROM customer c2
                              WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def join_scalar_subquery(t: Tables) -> DataFrame:
    """Correlated scalar subquery via the SQL entry point: Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates it into an aggregate +
    join — the declarative form costs nothing vs hand-writing the join."""
    return t.spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > 1.10 * (SELECT avg(c2.c_acctbal) FROM customer c2
                                  WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sum_sq,
           len(list_filter(embedding, x -> x < -0.4)) > 0  AS any_very_neg,
           len(list_filter(embedding, x -> abs(x) >= 1.0)) = 0 AS all_unit_bounded,
           round(list_aggregate(list_transform(list_slice(embedding, 1, 8),
                 x -> CAST(x AS DOUBLE)), 'sum') / 8.0, 4) AS head8_mean
    FROM embeddings
    """,
)
def array_hof(t: Tables) -> DataFrame:
    """Higher-order array function surface: transform / filter / exists /
    forall / aggregate as a declared key (embedding_quantize et al. use
    them internally; this pins the semantics directly).

    Every lambda stays a Catalyst expression — no Python. Float32
    elements are cast to double BEFORE arithmetic on both sides, so the
    products and the in-order fold are bit-identical cross-engine.
    Caveat for the scale notes: HOF lambdas evaluate interpreted (outside
    whole-stage codegen), fine for 64-element arrays; for hot million-row
    × wide-array paths prefer explode+agg (see minhash_signatures'
    measured 2x note)."""
    e = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return t.embeddings.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)), 4
        ).alias("sum_sq"),
        F.exists(e, lambda x: x < -0.4).alias("any_very_neg"),
        F.forall(e, lambda x: F.abs(x) < 1.0).alias("all_unit_bounded"),
        F.round(
            F.aggregate(F.slice(e, 1, 8), F.lit(0.0), lambda acc, x: acc + dbl(x)) / 8.0, 4
        ).alias("head8_mean"),
    )


@query(
    "str_try_parse",
    oracle="""
    WITH src AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 4 = 0 THEN CAST(p_size AS VARCHAR)
                    WHEN p_partkey % 4 = 1 THEN ' ' || CAST(p_size AS VARCHAR) || ' '
                    WHEN p_partkey % 4 = 2 THEN p_name
                    ELSE '' END AS int_raw,
               CASE WHEN p_partkey % 3 = 0 THEN CAST(p_retailprice AS VARCHAR)
                    WHEN p_partkey % 3 = 1 THEN '1e2'
                    ELSE p_brand END AS dbl_raw,
               CASE WHEN p_partkey % 2 = 0 THEN '1997-02-28'
                    ELSE '1997-02-30' END AS date_raw
        FROM part
    )
    SELECT p_partkey,
           TRY_CAST(int_raw AS INTEGER)  AS as_int,
           TRY_CAST(dbl_raw AS DOUBLE)   AS as_double,
           TRY_CAST(date_raw AS DATE)    AS as_date,
           TRY_CAST(int_raw AS INTEGER) IS NULL AS int_failed
    FROM src
    """,
)
def str_try_parse(t: Tables) -> DataFrame:
    """Fault-tolerant parsing surface (`try_cast`): dirty-ingest strings
    → typed columns with NULL instead of job failure — the difference
    between a 100 TB load that completes with a quarantine column and one
    that dies at row 40 billion.

    The probe strings derive deterministically from fixture columns:
    integral-with-whitespace (parses), prose (NULL), empty (NULL),
    double/scientific notation (parses), invalid calendar date (NULL).
    Pinned out: decimal-string→int, where engines legitimately disagree
    (Spark try_cast('7.5' AS int) = NULL; DuckDB rounds to 8) — the
    declared contract covers the behaviors that are portable."""
    pk = F.col("p_partkey")
    int_raw = (
        F.when(pk % 4 == 0, F.col("p_size").cast("string"))
        .when(pk % 4 == 1, F.concat(F.lit(" "), F.col("p_size").cast("string"), F.lit(" ")))
        .when(pk % 4 == 2, F.col("p_name"))
        .otherwise(F.lit(""))
    )
    dbl_raw = (
        F.when(pk % 3 == 0, F.col("p_retailprice").cast("string"))
        .when(pk % 3 == 1, F.lit("1e2"))
        .otherwise(F.col("p_brand"))
    )
    date_raw = F.when(pk % 2 == 0, F.lit("1997-02-28")).otherwise(F.lit("1997-02-30"))
    return t.part.select(
        "p_partkey",
        int_raw.try_cast("int").alias("as_int"),
        dbl_raw.try_cast("double").alias("as_double"),
        date_raw.try_cast("date").alias("as_date"),
        int_raw.try_cast("int").isNull().alias("int_failed"),
    )


@query(
    "date_timezone",
    oracle="""
    SELECT o_orderkey,
           strftime(timezone('America/New_York',
                             o_orderdate AT TIME ZONE 'UTC'),
                    '%Y-%m-%d %H:%M') AS ny_local,
           hour(timezone('America/New_York', o_orderdate AT TIME ZONE 'UTC'))
               AS ny_hour,
           hour(timezone('Asia/Tokyo', o_orderdate AT TIME ZONE 'UTC'))
               AS tokyo_hour
    FROM orders
    """,
)
def date_timezone(t: Tables) -> DataFrame:
    """Timezone conversion surface: UTC order timestamps rendered in
    America/New_York (DST boundary crossings included — the 1995–2001
    span covers both offsets) and Asia/Tokyo. Local-time values are
    emitted as strings/hours so the comparison is about WALL-CLOCK
    semantics, not timestamp-type representation; the session timezone is
    pinned to UTC on both engines (io.REQUIRED_CONFS), which is also the
    production posture — store UTC, convert at the edge."""
    d = F.col("o_orderdate")
    ny = F.from_utc_timestamp(d, "America/New_York")
    tokyo = F.from_utc_timestamp(d, "Asia/Tokyo")
    return t.orders.select(
        "o_orderkey",
        F.date_format(ny, "yyyy-MM-dd HH:mm").alias("ny_local"),
        F.hour(ny).alias("ny_hour"),
        F.hour(tokyo).alias("tokyo_hour"),
    )


@query(
    "json_struct_roundtrip",
    oracle="""
    SELECT l_orderkey % 10 AS bucket,
           CAST(sum(cnt) AS BIGINT) AS n_lines,
           round(sum(qty_sum), 2) AS total_qty
    FROM (SELECT l_orderkey, count(*) AS cnt, sum(l_quantity) AS qty_sum
          FROM lineitem GROUP BY l_orderkey)
    GROUP BY l_orderkey % 10
    """,
)
def json_struct_roundtrip(t: Tables) -> DataFrame:
    """Nested-JSON round trip: each order's lines are packed into a JSON
    document (array of structs), parsed back with an explicit schema, and
    re-exploded; the aggregate equals the direct computation because the
    to_json/from_json double representation is shortest-repr lossless.
    This is the document-shaped ingest path (webhook / event payloads)
    exercised end to end — build, parse, explode, aggregate.

    Scale: to_json/from_json are codegen'd JVM expressions (Jackson
    under the hood) — no Python; the per-order pack is one hash agg and
    the parse is a projection. The explicit schema matters at 100 TB:
    schema inference over JSON is a full extra pass."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    packed = t.lineitem.groupBy("l_orderkey").agg(
        F.to_json(
            F.struct(
                F.collect_list(
                    F.struct(F.col("l_quantity").alias("qty"), F.col("l_extendedprice").alias("price"))
                ).alias("lines")
            )
        ).alias("doc")
    )
    schema = StructType(
        [
            StructField(
                "lines",
                ArrayType(
                    StructType(
                        [StructField("qty", DoubleType()), StructField("price", DoubleType())]
                    )
                ),
            )
        ]
    )
    exploded = packed.select(
        "l_orderkey", F.explode(F.from_json("doc", schema).lines).alias("line")
    )
    return (
        exploded.groupBy((F.col("l_orderkey") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("line.qty"), 2).alias("total_qty"),
        )
    )


@query(
    "str_mask_pii",
    oracle="""
    WITH src AS (
        SELECT c_custkey,
               c_name || ' <user' || CAST(c_custkey AS VARCHAR)
                      || '@example.com> card 4556-' 
                      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                      || '-1111-2222' AS contact
        FROM customer
    )
    SELECT c_custkey,
           regexp_replace(
               regexp_replace(contact,
                   '[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+)', '[email@\\1]'),
               '\\d{4}-\\d{4}-\\d{4}-(\\d{4})', 'XXXX-XXXX-XXXX-\\1')
               AS masked,
           NOT regexp_matches(
               regexp_replace(
                   regexp_replace(contact,
                       '[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+)', '[email@\\1]'),
                   '\\d{4}-\\d{4}-\\d{4}-(\\d{4})', 'XXXX-XXXX-XXXX-\\1'),
               '@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') AS is_clean
    FROM src
    """,
)
def str_mask_pii(t: Tables) -> DataFrame:
    """PII masking (the redaction half of the scrub stage next to
    text_pii_scrub's counts): emails collapse to their domain in
    brackets, card-like numbers keep only the last group — partial
    reveal preserves debuggability while killing the identifier. Capture
    groups pin the dialect difference: Spark's replacement refs are $1,
    DuckDB's are \\1 — same pattern semantics, different escape (the
    regex dialect-parity concern text_pii_scrub tests row-wise).

    Pure projection: two codegen'd regexp_replace passes, zero shuffles;
    the is_clean flag re-scans for any surviving raw email — the audit
    column a release gate filters on."""
    contact = F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com> card 4556-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit("-1111-2222"),
    )
    masked = F.regexp_replace(
        F.regexp_replace(
            contact, r"[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+)", r"[email@$1]"
        ),
        r"\d{4}-\d{4}-\d{4}-(\d{4})",
        r"XXXX-XXXX-XXXX-$1",
    )
    return t.customer.select(
        "c_custkey",
        masked.alias("masked"),
        (~masked.rlike(r"@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")).alias("is_clean"),
    )


@query(
    "date_business_days",
    oracle="""
    WITH joined AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) AS d1, CAST(l_shipdate AS DATE) AS d2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 60 DAYS
    ),
    bd AS (
        SELECT o_orderpriority,
               len(list_filter(generate_series(d1, d2 - INTERVAL 1 DAY,
                                               INTERVAL 1 DAY),
                               d -> dayofweek(d) NOT IN (0, 6))) AS bdays
        FROM joined
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(bdays), 4) AS avg_business_days,
           CAST(max(bdays) AS BIGINT) AS max_business_days
    FROM bd GROUP BY o_orderpriority
    """,
)
def date_business_days(t: Tables) -> DataFrame:
    """Business-day lead time (order → ship, weekends excluded) per
    priority — the SLA arithmetic every fulfillment dashboard needs and
    no engine ships as a builtin. Computed IN-ROW: a bounded date
    sequence filtered by weekday (the 60-day theta bound caps the array;
    at wider spans switch to the closed-form full-weeks + remainder
    formula). Day-of-week conventions pinned AGAIN (Spark 1=Sun/7=Sat,
    DuckDB 0=Sun/6=Sat — the join_interval_overlap lesson). The
    lineitem<->orders join is merge-hinted: both sides scale with the
    fact, and the 64 MB dim threshold otherwise broadcasts the pruned
    lineitem projection at mid scale (measured 2.5x slower at 30x
    sf0.1, tools/scale_stress.py A/B)."""
    joined = (
        t.lineitem.select("l_orderkey", F.to_date("l_shipdate").alias("d2"))
        .hint("merge")
        .join(
            t.orders.select(
                "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("d1")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            (F.col("d2") >= F.col("d1")) & (F.col("d2") < F.date_add(F.col("d1"), 60))
        )
    )
    # Spark sequence(start, stop) with stop < start yields a DESCENDING
    # sequence (never empty) — the d2 == d1 same-day rows must be guarded
    # or they count phantom days; DuckDB's generate_series yields empty.
    days = F.sequence(F.col("d1"), F.date_sub(F.col("d2"), 1))
    bdays = F.when(
        F.col("d2") > F.col("d1"),
        F.size(F.filter(days, lambda d: ~F.dayofweek(d).isin(1, 7))),
    ).otherwise(0)
    bd = joined.select("o_orderpriority", bdays.alias("bdays"))
    return bd.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.avg("bdays"), 4).alias("avg_business_days"),
        F.max("bdays").cast("long").alias("max_business_days"),
    )


@query(
    "json_flatten_nested",
    oracle="""
    SELECT l_orderkey % 10                                   AS bucket,
           CAST(count(*) AS BIGINT)                          AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)   AS total_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM lineitem
    GROUP BY l_orderkey % 10
    """,
)
def json_flatten_nested(t: Tables) -> DataFrame:
    """Nested-JSON flatten round trip: line items are nested into a JSON
    array-of-objects per order (collect_list + to_json — the event
    payload shape every API emits), then parsed back with an EXPLICIT
    from_json schema and exploded two levels down to rows. The oracle
    computes the same aggregate from the RELATIONAL truth, so the hash
    certifies the nest→serialize→parse→flatten cycle loses, duplicates,
    and corrupts nothing (shortest-repr double printing included —
    quantities and prices survive bit-exact through the JSON text).

    collect_list order is partition-dependent; the round trip is
    deliberately checked through an ORDER-INSENSITIVE aggregate (the
    explode washes the order out), never through array equality.

    At 100 TB: one l_orderkey shuffle to nest; parse+explode are pure
    projections. An explicit from_json schema is non-negotiable at scale
    — schema inference on a JSON column is a full extra pass, and a
    schemaless parse degrades to strings."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    item = StructType(
        [
            StructField("ln", LongType()),
            StructField("qty", DoubleType()),
            StructField("price", DoubleType()),
        ]
    )
    nested = (
        t.lineitem.groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                )
            ).alias("items")
        )
        .select("l_orderkey", F.to_json("items").alias("payload"))
    )
    flat = nested.select(
        "l_orderkey",
        F.explode(F.from_json("payload", ArrayType(item))).alias("it"),
    )
    return flat.groupBy((F.col("l_orderkey") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("it.qty").cast("long")).cast("long").alias("total_qty"),
        F.sum(F.round(F.col("it.price") * 100, 0).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


@query(
    "json_variant_get",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(sum(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_recent
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def json_variant_get(t: Tables) -> DataFrame:
    """VARIANT ingestion path (Spark 4's semi-structured type): each
    order is serialized to a JSON document, parsed with parse_json into
    a VARIANT column — no schema declared at parse time — and the typed
    fields are pulled back out with variant_get paths ($.status,
    $.total, $.year). The aggregate over the extracted columns must
    equal the relational truth, certifying the
    serialize→variant-encode→path-extract cycle end to end.

    VARIANT vs from_json (json_flatten_nested's path): from_json needs
    the full schema up front and pays a text re-parse per access;
    variant parses ONCE into a binary encoding, then every
    variant_get is a cheap binary path walk — the right default for
    schema-drifting event payloads at 100 TB. Extraction casts are
    explicit ('long'/'double') so drifting payloads fail loudly, not
    silently as strings."""
    js = t.orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("total"),
                F.year("o_orderdate").alias("year"),
            )
        ).alias("doc")
    )
    v = js.select(F.parse_json("doc").alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.total", "double").alias("total"),
        F.variant_get("v", "$.year", "long").alias("yr"),
    )
    return extracted.groupBy(F.col("status").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("total") * 100, 0).cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.sum(F.when(F.col("yr") >= 1998, 1).otherwise(0))
        .cast("long")
        .alias("n_recent"),
    )


@query(
    "array_explode_outer",
    oracle="""
    WITH src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN []
                    ELSE string_split(o_orderpriority, '-') END AS parts
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_rows,
           CAST(sum(CASE WHEN part IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_rows,
           CAST(count(DISTINCT part) AS BIGINT)              AS n_distinct_parts
    FROM (
        SELECT s.o_orderkey, u.part
        FROM src s LEFT JOIN (
            SELECT o_orderkey, unnest(parts) AS part FROM src
        ) u USING (o_orderkey)
    )
    """,
)
def array_explode_outer(t: Tables) -> DataFrame:
    """explode_outer vs explode — the silent-row-loss trap: plain
    explode DROPS rows whose array is empty or NULL, so a fan-out over
    a sparsely-populated array column quietly deletes the very entities
    with nothing to fan out (every 5th order's array is emptied here to
    force the case). explode_outer keeps them as a single NULL-element
    row — the LEFT-JOIN-shaped semantics the oracle spells out with an
    actual left join against unnest (DuckDB's unnest drops empties just
    like explode).

    The aggregate pins all three facts: total row count (empties
    preserved), the count of NULL placeholder rows (== the emptied
    population), and the distinct element count (real elements
    unchanged)."""
    src = t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.array().cast("array<string>"))
        .otherwise(F.split("o_orderpriority", "-"))
        .alias("parts"),
    )
    ex = src.select("o_orderkey", F.explode_outer("parts").alias("part"))
    return ex.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("part").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_rows"),
        F.count_distinct("part").cast("long").alias("n_distinct_parts"),
    )


@query(
    "date_fiscal_445",
    oracle="""
    WITH g AS (
        SELECT o_totalprice, fy,
               datediff('day', make_date(fy, 2, 1), CAST(o_orderdate AS DATE)) // 7
                   AS wk
        FROM (SELECT o_totalprice, o_orderdate,
                     CASE WHEN month(o_orderdate) >= 2 THEN year(o_orderdate)
                          ELSE year(o_orderdate) - 1 END AS fy
              FROM orders)
    ),
    p AS (
        SELECT o_totalprice, fy,
               least(wk // 13, 3) * 3
               + CASE WHEN wk % 13 < 4 THEN 1
                      WHEN wk % 13 < 8 THEN 2
                      ELSE 3 END
               + CASE WHEN wk >= 52 THEN 12 - (least(wk // 13, 3) * 3
                      + CASE WHEN wk % 13 < 4 THEN 1
                             WHEN wk % 13 < 8 THEN 2
                             ELSE 3 END) ELSE 0 END AS period
        FROM g
    )
    SELECT fy                                  AS fiscal_year,
           CAST(period AS INT)                 AS fiscal_period,
           CAST(count(*) AS BIGINT)            AS n_orders,
           round(sum(o_totalprice), 2)         AS revenue
    FROM p GROUP BY fy, period
    """,
)
def date_fiscal_445(t: Tables) -> DataFrame:
    """4-4-5 fiscal calendar rollup (the NRF retail calendar, public
    convention): fiscal years start Feb 1; each quarter is a 4-week +
    4-week + 5-week period triple, so every fiscal period contains a
    whole number of weeks and periods compare like-for-like across
    years (a calendar-month February vs March comparison is 28 vs 31
    days — the distortion this calendar exists to remove). Week index =
    days-since-FY-start // 7; period = quarter*3 + {1,2,3} by the
    4/4/5 split of the week-within-quarter; the occasional 53rd week
    folds into period 12 (the standard convention). Revenue and order
    counts roll up per (fiscal_year, fiscal_period). All of it is pure
    integer date arithmetic — identical in both engines, hash-checked.

    Scale: one in-row date computation + one hash agg; no joins, no
    windows — the fiscal mapping is a projection any fact scan absorbs."""
    d = F.col("o_orderdate").cast("date")
    fy = F.when(F.month(d) >= 2, F.year(d)).otherwise(F.year(d) - 1)
    orders = t.orders.select(
        "o_totalprice",
        fy.alias("fy"),
        F.floor(F.datediff(d, F.make_date(fy, F.lit(2), F.lit(1))) / 7).alias("wk"),
    )
    sub = (
        F.when(F.col("wk") % 13 < 4, 1)
        .when(F.col("wk") % 13 < 8, 2)
        .otherwise(3)
    )
    period_raw = F.least(F.floor(F.col("wk") / 13), F.lit(3)).cast("int") * 3 + sub
    period = F.when(F.col("wk") >= 52, F.lit(12)).otherwise(period_raw)
    return (
        orders.select("o_totalprice", "fy", period.cast("int").alias("period"))
        .groupBy(F.col("fy").alias("fiscal_year"), F.col("period").alias("fiscal_period"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
