"""Ad-hoc per-query Spark-vs-DuckDB pair timer: times the named registry
queries on both engines over the same parquet dir (same discipline as
bench.py / bench_oracle.py: noop-forced Spark side, fetchall DuckDB
side, one untimed warmup each, median of N timed passes) and prints one
JSON line per query plus a total line:

    python scripts/time_pair.py <sf_dir> q165_gap_fill_interp [q166_...]

Env: SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES, oracle_view_source  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dir, names = argv[0], argv[1:]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = load_all_query_modules()

    spark = get_spark(
        app_name="time-pair", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {oracle_view_source(sf_dir, t)}")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        spec = registry[name]
        force(spec.spark(spark, sf_dir))  # warmup
        st = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force(spec.spark(spark, sf_dir))
            st.append(time.perf_counter() - t0)
        dt = []
        if spec.oracle:
            con.sql(spec.oracle).fetchall()  # warmup
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(spec.oracle).fetchall()
                dt.append(time.perf_counter() - t0)
        s = round(statistics.median(st), 3)
        d = round(statistics.median(dt), 3) if dt else None
        out[name] = {
            "spark": s,
            "duckdb": d,
            "ratio": round(s / d, 2) if d else None,
        }
        print(json.dumps({"query": name, **out[name]}), flush=True)

    ts = round(sum(v["spark"] for v in out.values()), 3)
    td = round(sum(v["duckdb"] or 0 for v in out.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pair_total",
                "spark": ts,
                "duckdb": td,
                "ratio": round(ts / td, 2) if td else None,
                "sf_dir": sf_dir,
                "runs": runs,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
