"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {"q01_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full column
materialization, no driver collect). One untimed warmup query first so
JVM/codegen startup doesn't pollute the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules
from e2e_stock_data_pipeline_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0

    registry = load_all_query_modules()
    headline = {n: s for n, s in sorted(registry.items()) if s.bench}

    spark = get_spark(
        app_name="engine-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: one full untimed pass so timings reflect steady state
    # (JIT + codegen caches), not JVM cold start
    for spec in headline.values():
        force(spec.spark(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        t0 = time.perf_counter()
        force(spec.spark(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
