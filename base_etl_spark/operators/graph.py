"""Graph analytics over the trade graph (SURVEY §2.10 iterative family).

The graph is derived from the star schema: an undirected customer↔supplier
edge exists when at least one order line connects them. PageRank here is
the declared-iterative category (like cluster_kmeans): not SQL-expressible,
held to property invariants (mass conservation, fixed point, determinism)
instead of a DuckDB oracle.

Scale posture per round: one edge⋈rank join + one hash agg, both keyed on
node id so AQE reuses the exchange; the driver reads ONE scalar (the max
rank delta) per round; persisted frames swap each round so the lineage
never grows (the dedup_clusters pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from base_etl_spark import iterstats
from base_etl_spark.io import Tables
from base_etl_spark.registry import query

_PR_DAMPING = 0.85
_PR_MAX_ROUNDS = 60  # runaway guard only; raises if hit


@query("graph_pagerank", oracle=None)  # R: iterative — invariants pinned in tests
def graph_pagerank(t: Tables) -> DataFrame:
    """PageRank over the symmetrized customer↔supplier trade graph
    (edge = the pair traded at least once), damping 0.85, converged when
    the max per-node rank change falls under 1% of the uniform mass 1/N.

    Symmetrizing makes every node's out-degree ≥ 1, so there is no
    dangling-mass correction term; total rank mass stays 1 (asserted in
    tests to 1e-9). Each round: contributions = edges ⋈ ranks grouped by
    destination; new rank = (1-d)/N + d·Σ contrib. The convergence probe
    is a max-abs-delta scalar — the only thing the driver ever
    materializes. Raises on non-convergence rather than returning a
    half-iterated vector."""
    orders = t.orders.select("o_orderkey", "o_custkey")
    trade = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = trade.unionByName(
        trade.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(outdeg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()
    if n == 0:
        # PageRank of the empty graph is the empty ranking (an empty
        # orders/lineitem partition is a real shape); without this the
        # tolerance below divides by zero.
        for df in (edges, edges_deg, nodes):
            df.unpersist()
        return t.spark.createDataFrame([], "node string, rank double")
    tol = 0.01 / n  # 1% of uniform mass
    base = (1.0 - _PR_DAMPING) / n

    # localCheckpoint (not persist): each round's plan references BOTH the
    # previous ranks and the new ranks, so without truncation the logical
    # plan doubles per round — AQE's plan stringification alone OOMs the
    # driver near round ~30. Checkpointing pins the round's result and
    # resets the lineage to a leaf; the extra materialization is one
    # N-row frame per round, which the round computes anyway.
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    delta = float("inf")
    rounds_used = 0
    for rounds_used in range(1, _PR_MAX_ROUNDS + 1):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        # carry the previous rank through the round so the convergence
        # probe is a plain agg over the checkpointed frame — no second
        # join, one action per round
        new_ranks = (
            ranks.withColumnRenamed("rank", "old")
            .join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + _PR_DAMPING * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
                "old",
            )
            .localCheckpoint()
        )
        delta = new_ranks.agg(
            F.max(F.abs(F.col("rank") - F.col("old"))).alias("d")
        ).collect()[0].d
        ranks = new_ranks.select("node", "rank")
        if delta < tol:
            break
    edges.unpersist()
    edges_deg.unpersist()
    nodes.unpersist()
    if delta >= tol:
        ranks.unpersist()
        raise RuntimeError(
            f"graph_pagerank: not converged within {_PR_MAX_ROUNDS} rounds "
            f"(delta={delta:.3e}, tol={tol:.3e})"
        )
    iterstats.record("graph_pagerank", rounds_used)
    return ranks.select("node", F.round("rank", 8).alias("rank"))
