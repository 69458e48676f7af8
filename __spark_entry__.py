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


# Heaviest queries at sf0.01 (measured: scripts/driver_sim.py), deferred to
# the END of the dict so a budget-limited driver run completes the maximum
# number of queries before any truncation. Round 1's gate stopped mid-registry
# with the whole [EXT] tail unrecorded; cheap-first ordering bounds the blast
# radius of any recurrence to the few most expensive entries.
_RUN_LAST = (
    "q18_normalize_casts",
    "q60_char_ngram_langid",
    "q54_top_bigrams",
    "q44b_winnowing_fingerprints",
    "q47_doc_fingerprint",
    "q51_ann_lsh_buckets",
    "q42_ngram_jaccard",
    "q42b_ngram_jaccard_capped",
    "q90_repetition_stats",
    "q41_minhash_lsh_pairs",
    "q93_heavy_hitter_users",
    "q86_neardup_pipeline",
    "q58_boilerplate_ngrams",
    "q56_dedup_clusters",
)


# configure once per SparkSession, not once per query (the driver runs
# 80+ queries through one session; re-setting conf each call is waste)
_CONFIGURED: set[str] = set()


def _ensure_configured(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app not in _CONFIGURED:
        configure_existing(spark)
        _CONFIGURED.add(app)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all_query_modules()

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_configured(spark)
            return spec.spark(spark, sf_dir)

        run.__name__ = spec.name
        return run

    ordered = [n for n in registry if n not in _RUN_LAST]
    ordered += [n for n in _RUN_LAST if n in registry]
    return {name: wrap(registry[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    registry = load_all_query_modules()
    return {name: spec.oracle for name, spec in registry.items() if spec.oracle is not None}
