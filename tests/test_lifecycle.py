"""Session-lifecycle hygiene (VERDICT r11 item 3): iterative operators
leave localCheckpoint blocks behind by design (the final materialized
frame backs the returned DataFrame); registry.release() must reclaim
them between queries and leave the session fully usable."""

from __future__ import annotations

from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.plans import registry
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REGISTRY = load_all_query_modules()


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_reclaims_iterative_residue(spark, sf_dir):
    from e2e_stock_data_pipeline_spark.operators import dedup, graph
    from e2e_stock_data_pipeline_spark.operators.dedup import connected_components

    # no spared memos in this scenario (earlier tests in the session may
    # have populated either session memo — both must be emptied or
    # release() correctly spares their backing rids)
    graph._EDGE_PLAN_CACHE.clear()
    dedup._CLUSTER_PLAN_CACHE.clear()
    registry.release(spark)
    nodes = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 38, 2)], ["doc_a", "doc_b"]
    )
    result = connected_components(nodes, edges)
    assert result.count() == 40
    # the converged edge set is still persisted — the operator cannot
    # release what backs its own return value
    assert _n_persistent(spark) > 0
    stats = registry.release(spark)
    assert stats["rdds_unpersisted"] > 0
    assert _n_persistent(spark) == 0


def test_release_spares_live_session_memo(spark, sf_dir):
    """VERDICT r16 item 4: the co-purchase edge memo (five graph
    consumers) must survive a between-queries release — its DISK_ONLY
    blocks cost scratch disk, not heap — while non-memo checkpoint
    residue in the same session is still reclaimed."""
    from e2e_stock_data_pipeline_spark.operators import graph
    from e2e_stock_data_pipeline_spark.operators.materialize import materialize

    graph._EDGE_PLAN_CACHE.clear()
    registry.release(spark)
    li = spark.createDataFrame(
        [(o, p) for o in range(30) for p in (o % 5, (o + 1) % 5, (o + 2) % 5)],
        ["l_orderkey", "l_partkey"],
    )
    edges = graph.copurchase_edges_plan(li, min_support=2)
    n_edges = edges.count()
    assert n_edges > 0 and len(graph._EDGE_PLAN_CACHE) == 1
    # unrelated checkpoint residue that release MUST still reclaim
    residue = materialize(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert residue.count() == 100
    stats = registry.release(spark)
    assert stats["rdds_spared"], "memo rdd should be spared"
    assert stats["rdds_unpersisted"] > 0, "non-memo residue still reclaimed"
    # the memo hit is served (blocks alive), and the frame still reads
    again = graph.copurchase_edges_plan(li, min_support=2)
    assert again is edges, "live memo must be reused after release"
    assert again.count() == n_edges
    graph._EDGE_PLAN_CACHE.clear()
    registry.release(spark)


def test_release_keeps_session_usable_and_plans_rebuild(spark, sf_dir):
    name = "q01_pricing_summary"
    first = REGISTRY[name].spark(spark, sf_dir).collect()
    registry.release(spark)
    # plan cache was dropped; rebuild must produce identical results
    again = REGISTRY[name].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    # and arbitrary new work still runs
    assert spark.range(10).agg(F.sum("id")).collect()[0][0] == 45


def test_release_is_idempotent(spark):
    a = registry.release(spark)
    b = registry.release(spark)
    assert b["rdds_unpersisted"] == 0
    assert a["plans_dropped"] >= 0

def test_release_spares_live_cluster_memo(spark, sf_dir):
    """r17: the dedup-tier cluster memo (q56/q105/q153/q158) follows the
    graph memo's contract — BOTH backing frames (pairs, labels) survive
    a between-queries release, the memo hit is served afterwards, and a
    dead memo (blocks force-dropped) rebuilds instead of handing out an
    unrecomputable frame."""
    from e2e_stock_data_pipeline_spark.operators import dedup

    dedup._CLUSTER_PLAN_CACHE.clear()
    registry.release(spark)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(6)]
        + [(i, f"unique{i} text{i} body{i} words{i} here{i}") for i in range(6, 12)],
        ["doc_id", "text"],
    )
    pairs, labels = dedup.cluster_labels_plan(docs)
    n_pairs, n_labels = pairs.count(), labels.count()
    assert n_labels == 12 and len(dedup._CLUSTER_PLAN_CACHE) == 1
    # the 6 identical docs share one cluster rooted at the min doc_id
    assert labels.filter("cluster_id = 0").count() == 6
    stats = registry.release(spark)
    assert stats["rdds_spared"], "cluster memo rids should be spared"
    p2, l2 = dedup.cluster_labels_plan(docs)
    assert p2 is pairs and l2 is labels, "live memo must be reused after release"
    assert l2.count() == n_labels and p2.count() == n_pairs
    # kill the blocks WITH the memo entry still present -> the liveness
    # probe must force a rebuild, not hand out an unrecomputable frame
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    assert len(dedup._CLUSTER_PLAN_CACHE) == 1  # stale entry still cached
    p3, l3 = dedup.cluster_labels_plan(docs)
    assert p3 is not pairs and l3 is not labels
    assert l3.count() == n_labels and p3.count() == n_pairs
    dedup._CLUSTER_PLAN_CACHE.clear()
    registry.release(spark)
