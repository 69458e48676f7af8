"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``e2e_stock_data_pipeline_spark`` package;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules
from e2e_stock_data_pipeline_spark.session import configure_existing

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (filtered decimal-exact pricing summary) on sf0.001."""
    configure_existing(spark)
    registry = load_all_query_modules()
    return registry["q01_pricing_summary"].spark(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all_query_modules()

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return spec.spark(spark, sf_dir)

        run.__name__ = spec.name
        return run

    return {name: wrap(spec) for name, spec in registry.items()}


def oracle_sql() -> dict[str, str]:
    registry = load_all_query_modules()
    return {name: spec.oracle for name, spec in registry.items() if spec.oracle is not None}
