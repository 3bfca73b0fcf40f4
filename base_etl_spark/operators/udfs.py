"""UDF / UDAF / UDTF surface (SURVEY §2.11).

The engine's position: UDFs are the slow path — every declared operator
elsewhere is built-in expressions. This module demonstrates each
extension point with the idiomatic tiering:

- scalar Python UDF (row-at-a-time)      — exists, discouraged
- pandas UDF (Arrow-vectorized)          — the acceptable Python path
- applyInPandas grouped map (UDAF)       — custom per-group aggregation
- built-in-expression twin of the UDAF   — the declared, oracle-checked
  variant (udaf_entropy): when the semantics ARE expressible, prefer
  expressions and keep the pandas version as a tested equivalent.
"""

from __future__ import annotations

import math
from typing import Iterator  # module-level: pandas_udf resolves the
# stringified (PEP 563) Iterator[pd.Series] annotation in these globals

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType, LongType

from base_etl_spark.io import Tables
from base_etl_spark.registry import query


@query(
    "udaf_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, sum(n) AS total FROM c GROUP BY user_id)
    SELECT c.user_id,
           round(-sum((n * 1.0 / total) * ln(n * 1.0 / total)), 6) AS entropy
    FROM c JOIN tot ON c.user_id = tot.user_id
    GROUP BY c.user_id
    """,
)
def udaf_entropy(t: Tables) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — a custom
    aggregate expressed as two built-in hash aggs (counts -> -sum(p ln p)).
    udaf_entropy_pandas computes the same thing via applyInPandas; tests
    assert they agree."""
    c = t.events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n") * F.lit(1.0) / F.col("total")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


_ENTROPY_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("entropy", DoubleType())]
)


def _entropy_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    counts = pdf.groupby("event_type").size()
    p = counts / counts.sum()
    h = float(-(p * p.map(math.log)).sum())
    return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "entropy": [round(h, 6)]})


@query(
    "udaf_entropy_pandas",
    # same oracle as the expression twin: the pandas kernel is
    # deterministic (sorted groupby order; 6dp round absorbs float
    # noise), so the grouped-map path is held to the full hash check
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, sum(n) AS total FROM c GROUP BY user_id)
    SELECT c.user_id,
           round(-sum((n * 1.0 / total) * ln(n * 1.0 / total)), 6) AS entropy
    FROM c JOIN tot ON c.user_id = tot.user_id
    GROUP BY c.user_id
    """,
)
def udaf_entropy_pandas(t: Tables) -> DataFrame:
    """The same entropy as a grouped-map UDAF (applyInPandas): each user's
    rows arrive as one pandas DataFrame over Arrow. Hash-checked against
    the SAME oracle as udaf_entropy — the pandas kernel must agree with
    the expression twin bit-for-bit after the 6dp round."""
    return (
        t.events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(_entropy_pdf, schema=_ENTROPY_SCHEMA)
    )


@F.pandas_udf(DoubleType())
def _norm01(v: pd.Series) -> pd.Series:
    # deterministic per-batch-independent normalizer: value -> [0, 1]
    # against the fixture domain (0.01 .. 490.02); pure elementwise.
    return ((v - 0.01) / (490.02 - 0.01)).round(6)


@query(
    "udf_pandas",
    oracle="""
    SELECT event_id,
           round((value - 0.01) / (490.02 - 0.01), 6) AS value_norm,
           round((value - 0.01) / (490.02 - 0.01), 6) AS value_norm_builtin
    FROM events
    """,
)
def udf_pandas(t: Tables) -> DataFrame:
    """Arrow-vectorized pandas UDF (series -> series). The same formula is
    also computed as a built-in expression; tests assert bit-equality and
    the driver hash-checks both columns against the SQL form — the demo
    is the ~10-100x cheaper Python boundary, not new semantics. (pandas
    .round is half-to-even vs HALF_UP elsewhere; no fixture value lands
    on a 0.5e-6 boundary — the equality test would catch it.)"""
    return t.events.select(
        "event_id",
        _norm01(F.col("value")).alias("value_norm"),
        F.round((F.col("value") - 0.01) / (490.02 - 0.01), 6).alias("value_norm_builtin"),
    )


@query(
    "udf_scalar",
    oracle="""
    SELECT event_id,
           CASE WHEN value IS NULL THEN NULL
                ELSE least(value, 100.0) END AS value_clipped
    FROM events
    """,
)
def udf_scalar(t: Tables) -> DataFrame:
    """Row-at-a-time Python UDF — the discouraged path, present for
    surface completeness. Pickles every row across the Python boundary;
    anything hot must use built-ins or pandas UDFs instead.

    NULL contract (fuzz harness, r5): the UDF propagates NULL (None in →
    None out), which is NOT what bare least() does — least/greatest
    IGNORE null arguments on both engines (least(NULL, 100.0) = 100.0),
    so the oracle spells the propagation with CASE WHEN. A clip that
    turns unknown values into 100.0 would invent data."""

    @F.udf(DoubleType())
    def clip100(v: float | None) -> float | None:
        # NULL-safe like the SQL least() it mirrors: a Python UDF sees
        # None for NULL input and must pass it through, not TypeError
        return None if v is None else float(min(v, 100.0))

    return t.events.select("event_id", clip100(F.col("value")).alias("value_clipped"))


@query(
    "udtf_explode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def udtf_explode(t: Tables) -> DataFrame:
    """1-row -> N-rows table function via a generator expression
    (posexplode of a computed array) — the built-in UDTF form. The
    Python @udtf API adds nothing for expressible transforms and costs
    the interpreter boundary. posexplode is 0-based; the oracle shifts
    DuckDB's 1-based subscripts to match."""
    return t.documents.select(
        "doc_id",
        F.posexplode(F.split("text", " ")),
    ).toDF("doc_id", "pos", "token")


@query(
    "udf_arrow",
    oracle="""
    SELECT event_id,
           round(sqrt(value) * 10.0, 6) AS value_scored
    FROM events
    """,
)
def udf_arrow(t: Tables) -> DataFrame:
    """Arrow-optimized Python UDF (`useArrow=True`, Spark 3.5+): scalar
    Python signature, Arrow-batched transfer — the middle tier between
    the pickled row-at-a-time udf_scalar and the pandas-Series udf_pandas
    (same wire format as pandas UDFs, simpler authoring). Hash-checked
    against the SQL twin like the rest of the declared UDF surface; the
    plan node (ArrowEvalPython) is pinned by the Python-boundary audit in
    tests/test_plans.py."""
    import math

    @F.udf(DoubleType(), useArrow=True)
    def score(v: float | None) -> float | None:
        # NULL-safe like the SQL sqrt() it mirrors (NULL in -> NULL out)
        return None if v is None else round(math.sqrt(v) * 10.0, 6)

    return t.events.select("event_id", score(F.col("value")).alias("value_scored"))


@query("udtf_python", oracle=None)  # R: the Python-UDTF boundary itself
def udtf_python(t: Tables) -> DataFrame:
    """Real Python UDTF (`@udtf` class API, Spark 3.5+): one input row →
    variable output rows computed in Python — the boundary for
    generators that no SQL expression covers (API pagination expansion,
    tokenizer-with-state, parser emitting irregular records). Here it
    splits each document into fixed-size token chunks with per-chunk
    spans — deliberately also expressible as slices, so the self-check
    (tests) pins the UDTF output against the pure-expression twin
    row-for-row. Eighth declared Python-boundary key (PythonUDTF plan
    node); everything expressible stays on the udtf_explode built-in
    path — this exists to pin the API and its plan shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, start_tok int, n_toks int, chunk string")
    class ChunkDoc:
        def eval(self, text: str, size: int):  # noqa: ANN001
            toks = text.split(" ")
            for i in range(0, len(toks), size):
                part = toks[i : i + size]
                yield i // size, i, len(part), " ".join(part)

    t.spark.udtf.register("chunk_doc", ChunkDoc)
    return t.spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.start_tok, c.n_toks,
               length(c.chunk) AS chunk_chars
        FROM documents, LATERAL chunk_doc(text, 16) AS c
        """
    )


def _type_stats_arrow(key, tbl):
    """Arrow-native grouped kernel: exact integer-cent revenue stats per
    event type, computed entirely in pyarrow.compute (no pandas
    conversion, no Python per-row loop)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(pc.round(pc.multiply(tbl.column("value"), 100.0)), pa.int64())
    return pa.table(
        {
            "event_type": pa.array([key[0]], pa.string()),
            "n_events": pa.array([tbl.num_rows], pa.int64()),
            "total_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
            "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
        }
    )


@query(
    "udaf_arrow_group",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM events
    GROUP BY event_type
    """,
)
def udaf_arrow_group(t: Tables) -> DataFrame:
    """Grouped-map UDAF through applyInArrow (Spark 4's rawest Python
    boundary): each group arrives as a pyarrow.Table — no pandas
    materialization at all — and the kernel runs in pyarrow.compute.
    This is the tier below applyInPandas (udaf_entropy_pandas): no
    index/dtype conversion overhead, columnar end to end, the shape to
    use when the kernel is expressible in Arrow compute but not in SQL.

    Stats stay in exact integer cents so the Arrow kernel is held to
    the full driver hash check against the relational oracle — the
    boundary itself is what's being certified, not float luck.

    At 100 TB the usual grouped-map caveat applies doubly: one group
    must fit in one task's memory; event_type is low-cardinality, so
    the production variant pre-aggregates per (type, salt) first. Like
    every UDF-surface key, this exists to pin the API; the JVM
    expression twin is strictly faster."""
    return (
        t.events.select("event_type", "value")
        .groupBy("event_type")
        .applyInArrow(_type_stats_arrow, schema="event_type string, n_events long, total_cents long, max_cents long")
    )


@query(
    "udtf_arrow_chunks",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               CAST(i * 16 AS INT) AS start_tok,
               CAST(least(len(ws) - i * 16, 16) AS INT) AS n_toks,
               array_to_string(
                   ws[(CAST(i AS BIGINT)*16+1):(CAST(i AS BIGINT)*16+16)],
                   ' ') AS chunk
        FROM w, unnest(range((len(ws) + 15) // 16)) AS u(i)
    )
    SELECT doc_id, chunk_idx, start_tok, n_toks,
           CAST(length(chunk) AS BIGINT) AS chunk_chars
    FROM c
    """,
)
def udtf_arrow_chunks(t: Tables) -> DataFrame:
    """Arrow-OPTIMIZED Python UDTF (`@udtf(useArrow=True)`, Spark 4):
    the same document-chunking generator as udtf_python but crossing
    the Python boundary in Arrow batches instead of pickled rows — the
    ArrowEvalPythonUDTF plan node (plan-asserted), the serialization
    tier that makes Python UDTFs viable on wide scans. Unlike the R
    udtf_python (which pins the legacy boundary), this key is
    HASH-CHECKED: the chunk spans are recomputed in closed form by the
    oracle, so a batching bug, a dropped partial tail, or an off-by-one
    in the Arrow path flips the driver hash. NULL text emits no rows on
    both engines (the generator returns early; the oracle filters).

    At 100 TB: one corpus scan through the Arrow boundary, output rows
    bounded by tokens/16 per doc; no shuffle at all — the UDTF is a
    pure row-expander (LATERAL), so it pipelines inside the scan
    stage."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_idx int, start_tok int, n_toks int, chunk string",
        useArrow=True,
    )
    class ChunkDocArrow:
        def eval(self, text: str, size: int):  # noqa: ANN001
            if text is None:
                return
            toks = text.split(" ")
            for i in range(0, len(toks), size):
                part = toks[i : i + size]
                yield i // size, i, len(part), " ".join(part)

    t.spark.udtf.register("chunk_doc_arrow", ChunkDocArrow)
    return t.spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.start_tok, c.n_toks,
               CAST(length(c.chunk) AS BIGINT) AS chunk_chars
        FROM documents, LATERAL chunk_doc_arrow(text, 16) AS c
        """
    )


@query(
    "udf_pandas_iter",
    oracle="""
    SELECT event_id,
           round(value * 2.5 + 7.0, 6) AS value_scored,
           round(value * 2.5 + 7.0, 6) AS value_scored_builtin
    FROM events
    """,
)
def udf_pandas_iter(t: Tables) -> DataFrame:
    """Iterator-form pandas UDF (Iterator[Series] -> Iterator[Series],
    SQL_SCALAR_PANDAS_ITER_UDF) — the batch-INFERENCE extension point:
    unlike the plain series form (udf_pandas), the iterator form runs
    its setup code ONCE per executor task and then streams every Arrow
    batch through the initialized state — exactly where a real pipeline
    loads a tokenizer or an ONNX/torch model before scoring millions of
    rows (loading per batch would dominate; loading per row is the
    udf_scalar anti-pattern). Here the 'model' is a deterministic
    (w, b) pair initialized in the setup section; the same affine score
    is computed as a built-in expression twin and both columns
    hash-check against the SQL oracle.

    Scale: Arrow batches stream through one warm state per task; no
    shuffle; the Python boundary cost is amortized exactly like
    udf_pandas.

    Rounding convention (r9 ADVICE): pandas Series.round is half-EVEN
    while F.round and the DuckDB oracle round half-away-from-zero, so
    an exact half-microunit tie would split value_scored from
    value_scored_builtin. The UDF therefore rounds half-away-from-zero
    explicitly (copysign(floor(|x|*1e6 + 0.5), x) / 1e6), which matches
    the DuckDB oracle's binary-double rounding by construction. The
    BUILTIN twin is only domain-matched: Spark's F.round goes through
    BigDecimal.HALF_UP on the shortest-decimal representation, so a
    double lying just off a 6-dp decimal tie can in principle still
    split value_scored_builtin from the UDF/oracle pair — a
    pre-existing, data-dependent hazard not exercised by this
    fixture."""
    @F.pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # setup section: runs once per task, before the first batch —
        # the model-load slot (deterministic stand-in weights here)
        import numpy as np

        w, b = 2.5, 7.0
        for s in batches:
            v = (s * w + b).to_numpy()
            yield pd.Series(np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6)

    return t.events.select(
        "event_id",
        score(F.col("value")).alias("value_scored"),
        F.round(F.col("value") * 2.5 + 7.0, 6).alias("value_scored_builtin"),
    )
