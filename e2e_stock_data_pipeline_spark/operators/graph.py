"""Graph centrality over pair graphs (the production twin of q144).

q144_pagerank_copurchase keeps the whole 3-round recursion LAZY so the
DuckDB oracle can replay it — the price (visible in PLANS.md) is that
Catalyst re-executes the edge-construction subtree every round:
66 exchanges for 3 rounds. That is the correct ORACLE form and the
wrong PRODUCTION form. This operator is the production form, built on
the same pattern as dedup.connected_components: materialize the edge
list once (it is joined every round), truncate lineage per round so
the plan stays round-sized, and keep the per-round work at one
data-sized join + one reduce. tests/test_operators.py pins bit-equality
with the lazy unroll (same integer recursion, same constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Integer PageRank constants shared with plans/queries_ext8.pagerank_plan
# (ranks in 1e-6 units; 0.85 damping as integer *85 // 100).
PR_SCALE = 1_000_000
PR_BASE = 150_000


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Integer PageRank over a DIRECTED edge list (symmetrize first for
    undirected graphs). Returns (node, rank) for every node with at
    least one outgoing edge.

    Each round: contribution = rank DIV out-degree, shipped along edges,
    reduced per target, damped with integer arithmetic — identical to
    the q144 recursion, so fixed-round results are bit-comparable. The
    edge list and the degree table are materialized once; per-round
    lineage is truncated (localCheckpoint; swap for checkpoint() on
    durable storage at cluster scale)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            ranks.join(deg, ranks.node == deg.u)
            .select("node", F.expr("rank DIV d").alias("c"))
            .join(e, F.col("node") == e.u)
            .select("v", "c")
        )
        ranks = (
            contrib.groupBy(F.col("v").alias("node"))
            .agg(
                (F.lit(PR_BASE) + F.expr("(85 * sum(c)) DIV 100"))
                .cast("bigint")
                .alias("rank")
            )
            .localCheckpoint(eager=True)
        )
    return ranks
