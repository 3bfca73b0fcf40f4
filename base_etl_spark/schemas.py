"""Explicit schemas for the ten fixture tables (FIXTURES.md, measured).

Policy (SURVEY §1.2): fixed, explicit schemas asserted against the parquet
footer at load time — fail fast on drift instead of silently inferring.

``RAW`` schemas are what `spark.read.parquet` yields with
``nanosAsLong=true`` (events.ts arrives as LongType nanoseconds);
``CANONICAL`` is the post-load engine-facing shape (ts as TimestampType).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

# raw read, ns layout: ts is INT64 TIMESTAMP(NANOS) -> LongType under
# nanosAsLong (the original fixture generation; FIXTURES.md gotcha 1)
EVENTS_RAW = _st(
    ("event_id", LongType()),
    ("ts", LongType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

# raw read, us layout: regenerated fixtures store ts as TIMESTAMP(MICROS),
# which Spark reads natively as TimestampType — no conversion needed.
EVENTS_RAW_US = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType(), True)),
    ("label", IntegerType()),
)

EMBEDDING_DIM = 64  # fixed for all rows (FIXTURES.md, measured)

#: raw on-disk schema per table name (what the reader must see)
RAW_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

#: canonical engine-facing schema per table name (post ns->ts conversion)
CANONICAL_SCHEMAS: dict[str, StructType] = {**RAW_SCHEMAS, "events": EVENTS}

TABLE_NAMES = tuple(RAW_SCHEMAS)

#: tables whose raw on-disk layout legitimately varies across fixture
#: generations; any listed alternative passes the drift gate.
ALT_RAW_SCHEMAS: dict[str, tuple[StructType, ...]] = {
    "events": (EVENTS_RAW_US,),
}


class SchemaDriftError(RuntimeError):
    """Raised when an on-disk parquet footer disagrees with RAW_SCHEMAS."""


def assert_schema(table: str, actual: StructType) -> None:
    """Fail fast if a loaded table's schema drifted from the contract.

    Compares (name, dataType) pairs, ignoring nullability — parquet
    footers round-trip nullability inconsistently across writers.
    """
    got = [(f.name, f.dataType) for f in actual.fields]
    accepted = (RAW_SCHEMAS[table], *ALT_RAW_SCHEMAS.get(table, ()))
    wants = [[(f.name, f.dataType) for f in s.fields] for s in accepted]
    if got not in wants:
        raise SchemaDriftError(
            f"schema drift for table {table!r}:\n  expected {wants[0]}\n  got      {got}"
        )
