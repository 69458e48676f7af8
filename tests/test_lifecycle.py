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
    from e2e_stock_data_pipeline_spark.operators.dedup import connected_components

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
