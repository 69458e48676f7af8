"""Isolated warm noop timings for named registry queries at any sf dir.

One session; per query: ONE untimed warmup then --runs timed passes
via the noop sink (guide §1.4), reporting each pass and the median.
Floor/canary probes ride along (bench.py's machine-state controls) so a
polluted box is visible in the output.

    python scripts/time_queries.py <sf_dir> q86_... [q126_...] [--runs 3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.plans import registry  # noqa: E402
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__.strip().splitlines()[-1].strip())
        return 2
    sf_dir = argv[0]
    runs = 3
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = argv[1:]
    reg = load_all_query_modules()
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    # machine-state controls (bench.py's probes)
    t0 = time.perf_counter()
    spark.range(32).write.format("noop").mode("overwrite").save()
    floor = time.perf_counter() - t0
    from pyspark.sql import functions as F

    can = (
        spark.range(2_000_000)
        .select((F.col("id") % 9973).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("h"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.min("h").alias("m"))
    )
    t0 = time.perf_counter()
    can.write.format("noop").mode("overwrite").save()
    canary = time.perf_counter() - t0
    print(f"floor={floor:.3f}s canary={canary:.3f}s", flush=True)

    for name in names:
        spec = reg.get(name)
        if spec is None:
            print(f"MISSING {name}")
            continue
        spark.sparkContext.setJobDescription(f"time: {name}")

        def one_pass() -> float:
            # time construction + noop: iterative operators (pagerank,
            # coverage, CC) run their rounds EAGERLY while the plan is
            # being built, so timing only the noop would miss them
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            noop(df)
            return time.perf_counter() - t0

        one_pass()  # warmup
        registry.release(spark)
        ts = []
        for _ in range(runs):
            ts.append(one_pass())
            registry.release(spark)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"{name}: median={med:.2f}s runs={[round(t, 2) for t in ts]}", flush=True)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
