"""SparkSession factory.

The reference runs its Spark tier on Databricks with Photon + Auto Loader
(reference: databricks/bronze_prices_auto_loader.ipynb:cell-1); here we
build an OSS session tuned the way a 1000-executor job would be, scaled
down to local[N]:

* AQE on (runtime coalescing, skew-join splitting) — the knob that makes
  one config survive a 100x scale-up.
* shuffle.partitions sized to cores locally; on a real cluster AQE
  coalesces from a high initial number, so we set the *initial* number
  high and let AQE shrink, instead of hand-tuning per query.
* Arrow enabled for the few pandas_udf paths (vectors, multimodal).
* Session timezone pinned to UTC so timestamp semantics match the
  reference's tz-stripped timestamps (ingest_fmp_prices.py:258) and the
  DuckDB oracle's naive timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Streaming state-store provider registry. "rocksdb" is the documented
# choice for large-state streaming jobs: the r13 experiment
# (BENCH_NOTES "RocksDB state store experiment") measured throughput
# within noise (-2%) and resident state 4.3x smaller — the dimension
# that matters at 100 TB key cardinality, where HDFSBackedStateStore
# keeps every version of every key on-heap. The local default stays
# Spark's built-in HDFSBacked for parity with the driver's gate
# process; flip per-session with state_store="rocksdb" or globally with
# SPARK_GRAFT_STATE_STORE=rocksdb (the whole streaming suite is green
# under both — see tests/test_streaming.py).
STATE_STORE_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider",
}


def _state_store_conf(state_store: str | None) -> str | None:
    choice = state_store or os.environ.get("SPARK_GRAFT_STATE_STORE")
    if not choice:
        return None
    try:
        return STATE_STORE_PROVIDERS[choice.lower()]
    except KeyError:
        raise ValueError(
            f"unknown state store {choice!r}; expected one of "
            f"{sorted(STATE_STORE_PROVIDERS)}"
        ) from None


def get_spark(
    app_name: str = "e2e-stock-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Static conf, must be set before the first session in the JVM.
        # Default 100 thrashes on any multi-query workload: the registry's
        # headline set alone generates >100 codegen units (whole-stage
        # bodies, unsafe projections, orderings, predicates all share this
        # LRU), so every repeated run re-runs Janino + HotSpot on freshly
        # evicted classes — measured 15-20 s of compiler-thread time per
        # bench pass that never amortizes. 10k entries holds the whole
        # 171-query registry compiled.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    provider = _state_store_conf(state_store)
    if provider:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to a session we didn't build.

    The driver harness hands us its own SparkSession; static conf
    (memory, master) is fixed by then, but SQL conf is not.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    provider = _state_store_conf(None)
    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    except Exception:
        pass
    return spark
