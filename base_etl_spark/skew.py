"""Skew mitigation utilities (task brief: 'skewed keys hurt...salting for
skew').

AQE's skew-join splitting (enabled in build_session) is the first line of
defense — it needs no code changes. Salting is the explicit fallback for
aggregations and joins whose hot keys AQE cannot split (e.g. a single key
holding >½ of the table, or skewed groupBy where there is no join to
split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    reaggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level aggregation for skewed group keys.

    Level 1 groups by (keys + random salt) so a hot key's rows spread over
    n_salts reducers; level 2 merges the partials. `aggs` are the partial
    aggregates, `reaggs` the merge aggregates over the partial columns
    (e.g. partial sum(x) as s -> final sum(s) as s). Only algebraic
    aggregates (sum/count/min/max/avg-via-sum+count) can be salted this way.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*reaggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi join: salt the big side, EXPLODE the small side
    n_salts times, join on (key, salt). The small side grows n_salts-fold
    (it must be broadcast-sized); the big side's hot key spreads across
    n_salts tasks. Use only when AQE's skew split is insufficient.
    """
    big_s = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(F.broadcast(small_s), [key, "_salt"])
    return out.drop("_salt")
