"""Second bench tier (VERDICT r7 item 4): the [EXT] training-data
heavy shapes the frozen 11-query headline set doesn't cover. Times the
registry's costliest queries Spark-side at sf0.1 with the same
discipline as bench.py (noop-forced full materialization, one untimed
warmup pass, median of N timed passes) and prints ONE JSON line:

    {"metric": "ext_heavy_total", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": 0.1, "runs": N, "totals": [...]}

Run per round and append the line to BENCH_NOTES.md so regressions in
the dedup/ANN/curation tier become visible the way relational ones
already are:

    python scripts/bench_ext.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402

# The top-cost registry queries by the r8 sweeps (scripts/query_costs.json)
# — the engine-side heavy tier (dedup/ANN/graph/affinity/robust-stats).
EXT_HEAVY = [
    "q105_cluster_size_histogram",
    "q56_dedup_clusters",
    "q127_temperature_mixture",
    "q125_ema_unbounded_twin",
    "q126_incremental_dedup",
    "q123_pq_rerank",
    "q128_ivf_rerank",
    "q138_copurchase_pairs",
    "q140_mad_outliers",
    "q144_pagerank_copurchase",
    # round-8 session-3 additions: RRF hybrid retrieval, capped
    # containment, and the cluster-keyed leakage-free split (CC fixpoint)
    "q148_rrf_hybrid_search",
    "q151_containment_pairs",
    "q153_cluster_split",
    # round-8 session-4 additions: canonical selection rides the CC
    # fixpoint (second-costliest sweep query); the sweep-line peak is
    # the new bucketed-prefix-sum shape worth tracking round-over-round
    "q158_cluster_canonicals",
    "q159_peak_concurrency",
    # round-9 session-5 addition: the degree-oriented triangle census is
    # the round's heaviest genuine-work shape (basket-array pair
    # generation + compact-forward wedge join)
    "q170_triangle_census",
    # round-9 session-6 addition: the exact prefix-filtered similarity
    # join — the heaviest text shape (at sf1 Spark answers in 19s where
    # single-node DuckDB needs 362s on the identical algorithm)
    "q184_set_similarity_join",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0

    registry = load_all_query_modules()
    specs = {n: registry[n] for n in EXT_HEAVY}

    spark = get_spark(
        app_name="ext-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    for spec in specs.values():  # untimed warmup
        force(spec.spark(spark, sf_dir))

    samples: dict[str, list[float]] = {name: [] for name in specs}
    totals: list[float] = []
    for _ in range(runs):
        pass_total = 0.0
        for name, spec in specs.items():
            t0 = time.perf_counter()
            force(spec.spark(spark, sf_dir))
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            pass_total += dt
        totals.append(round(pass_total, 3))

    print(
        json.dumps(
            {
                "metric": "ext_heavy_total",
                "value": round(statistics.median(totals), 3),
                "unit": "sec",
                "queries": {n: round(statistics.median(ts), 3) for n, ts in samples.items()},
                "sf": sf,
                "runs": runs,
                "totals": totals,
                "spread": {"min": min(totals), "max": max(totals)},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
