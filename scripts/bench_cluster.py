"""Data-layout (M1 cluster_rewrite) scan-pruning bench at sf10.

The generated lineitem is hash-ordered on l_shipdate, so every row
group spans the whole date range and footer stats prune NOTHING — the
date-filtered scans (q02/q03/q06) decode all 60M rows. This bench
makes the M1 maintenance operator earn its keep at scale:

1. copy the sf dir, cluster_rewrite lineitem by l_shipdate
   (range-partition + sort -> narrow per-file/row-group date spans)
2. report skipping_effectiveness before/after (fraction of files a
   random date point-lookup can skip)
3. time the date-filtered queries on both layouts (warm, noop-forced,
   median of N) — the clustered layout's pushed l_shipdate filters now
   actually skip row groups inside the reader
4. verify exactness: the date-filtered queries on the CLUSTERED copy
   vs the DuckDB oracle on the same copy (row order changed; results
   must not)

    python scripts/bench_cluster.py [src_sf_dir] [work_dir]

Prints one JSON line per step.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from e2e_stock_data_pipeline_spark.pipeline.maintenance import (  # noqa: E402
    cluster_rewrite,
    skipping_effectiveness,
    table_stats,
)
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES, oracle_view_source  # noqa: E402

QUERIES = [
    "q02_filter_project",
    "q03_top_unshipped_revenue",
    "q06_forecast_revenue",
    "q01_pricing_summary",  # control: filter keeps ~100% (<= 1998-09-02)
]


def main(argv: list[str]) -> int:
    src = argv[0] if argv else ".bench_sf1/sf10"
    work = argv[1] if len(argv) > 1 else ".bench_sf1/sf10_clustered"
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if not os.path.exists(os.path.join(work, "lineitem.parquet")):
        os.makedirs(work, exist_ok=True)
        for t in TABLE_NAMES:
            s = os.path.join(src, f"{t}.parquet")
            d = os.path.join(work, f"{t}.parquet")
            if os.path.isdir(s):
                shutil.copytree(s, d, dirs_exist_ok=True)
            else:
                shutil.copy2(s, d)

    spark = get_spark(
        app_name="bench-cluster", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = os.path.join(work, "lineitem.parquet")
    before = skipping_effectiveness(table_stats(li, ["l_shipdate"]), "l_shipdate")
    t0 = time.perf_counter()
    cluster_rewrite(spark, li, ["l_shipdate"])
    rewrite_s = round(time.perf_counter() - t0, 1)
    after = skipping_effectiveness(table_stats(li, ["l_shipdate"]), "l_shipdate")
    print(
        json.dumps(
            {
                "step": "cluster_rewrite",
                "col": "l_shipdate",
                "rewrite_s": rewrite_s,
                "skipping_effectiveness_before": round(before, 3),
                "skipping_effectiveness_after": round(after, 3),
            }
        ),
        flush=True,
    )

    reg = load_all_query_modules()

    def median_time(sf_dir: str, name: str) -> float:
        def force():
            reg[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        force()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3)

    # exactness on the clustered copy (oracle over the same rewritten files)
    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {oracle_view_source(work, t)}")

    for name in QUERIES:
        t_src = median_time(src, name)
        t_clu = median_time(work, name)
        srows = sorted(tuple(r) for r in reg[name].spark(spark, work).collect())
        orows = sorted(con.sql(reg[name].oracle).fetchall())
        print(
            json.dumps(
                {
                    "query": name,
                    "hash_ordered_s": t_src,
                    "clustered_s": t_clu,
                    "speedup": round(t_src / t_clu, 2) if t_clu else None,
                    "exact_on_clustered": srows == orows,
                    "rows": len(srows),
                }
            ),
            flush=True,
        )
    spark.stop()
    con.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
