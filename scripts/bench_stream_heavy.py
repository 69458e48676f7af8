"""Streaming heavy-tier throughput at sf1 (VERDICT r9 item 7).

The streaming line so far is sf0.1 (100k rows). This drives the three
streaming shapes over the sf1 events table (1M rows) and records
rows/s plus state-store size:

1. bronze ingest — covered by scripts/bench_stream.py (run it with the
   sf1 dir); this script covers the two stateful shapes on top of it.
2. hourly rollup (foreachBatch merge-ADD with the epoch guard):
   availableNow drain of a 32-file landing zone, verified cell-exact
   against the batch aggregate of the same input.
3. streaming CUSUM (applyInPandasWithState): two time-ordered halves
   with a CHECKPOINT RESTART between them — the exactly-once-at-volume
   leg — verified against the literal Python recursion over all 1M
   rows, with per-batch state-store rows/bytes from query progress.

    python scripts/bench_stream_heavy.py [sf_dir]

Prints ONE JSON line:
    {"metric": "stream_heavy_sf1", "rows": N,
     "rollup": {"sec":, "rows_per_sec":, "exact": true},
     "cusum": {"sec":, "rows_per_sec":, "exact": true,
               "state_rows":, "state_mb":, "restart": true}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources import tables  # noqa: E402
from e2e_stock_data_pipeline_spark.streaming import bronze  # noqa: E402
from e2e_stock_data_pipeline_spark.streaming.rollup import (  # noqa: E402
    hourly_rollup_partial,
    stream_hourly_rollup,
)
from e2e_stock_data_pipeline_spark.streaming.stateful import (  # noqa: E402
    streaming_cusum,
)

MEAN_FP, H_FP = 1_000_000, 2_000_000


def main() -> int:
    argv = sys.argv[1:]
    # --rocksdb: run the stateful legs on the RocksDB state store provider
    # (OSS Spark 4 ships it) instead of the default HDFSBackedStateStore —
    # the VERDICT r12 item-7 experiment: is the CUSUM floor state-store-
    # bound? providerClass is a per-query runtime conf, safe to set here.
    rocksdb = "--rocksdb" in argv
    if rocksdb:
        argv.remove("--rocksdb")
    sf_dir = argv[0] if argv else "/root/repo/.bench_sf1/sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="stream-heavy", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_heavy_")
    out: dict = {
        "metric": "stream_heavy_sf1",
        "sf_dir": sf_dir,
        "state_store": "rocksdb" if rocksdb else "hdfs",
    }
    try:
        ev = tables.load(spark, sf_dir, "events")
        n_rows = ev.count()
        out["rows"] = n_rows
        schema = ev.schema

        # ---- rollup: 32-file landing zone, one availableNow drain ----
        landing = os.path.join(work, "landing")
        ev.repartition(32).write.mode("overwrite").parquet(landing)
        target = os.path.join(work, "rollup")
        ckpt = os.path.join(work, "rollup_ckpt")
        src = bronze.read_file_stream(spark, landing, schema, "parquet")
        t0 = time.perf_counter()
        q = stream_hourly_rollup(src, target, ckpt)
        q.awaitTermination()
        dt = time.perf_counter() - t0
        got = {
            (r.bucket_start, r.event_type): (r.n, r.value_sum)
            for r in spark.read.parquet(target).collect()
        }
        expect = {
            (r.bucket_start, r.event_type): (r.n, r.value_sum)
            for r in hourly_rollup_partial(spark.read.parquet(landing)).collect()
        }
        out["rollup"] = {
            "sec": round(dt, 2),
            "rows_per_sec": int(n_rows / dt),
            "exact": got == expect,
            "cells": len(got),
        }

        # ---- CUSUM: two time-ordered halves + checkpoint restart ----
        ordered = ev.orderBy("ts", "event_id")
        half = ordered.limit(n_rows // 2)
        rest = ordered.subtract(half)
        csrc = os.path.join(work, "cusum_src")
        cckpt = os.path.join(work, "cusum_ckpt")
        cout = os.path.join(work, "cusum_out")
        state_stats: list[dict] = []

        def run_once() -> float:
            stream = bronze.read_file_stream(spark, csrc, schema, "parquet")

            def sink(bdf, bid):
                bdf.withColumn("batch_id", F.lit(bid)).write.mode(
                    "append"
                ).parquet(cout)

            t0 = time.perf_counter()
            q = (
                streaming_cusum(stream, MEAN_FP, H_FP)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", cckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.perf_counter() - t0
            for p in q.recentProgress:
                for so in p.get("stateOperators") or []:
                    state_stats.append(
                        {
                            "rows": so.get("numRowsTotal"),
                            "mb": round(
                                (so.get("stateMemory")
                                 or so.get("memoryUsedBytes") or 0) / 1e6,
                                2,
                            ),
                        }
                    )
            return dt

        half.repartition(8).write.mode("overwrite").parquet(csrc)
        d1 = run_once()
        rest.repartition(8).write.mode("append").parquet(csrc)
        d2 = run_once()  # restart from checkpoint; state must survive

        # literal recursion over all rows (the q174 semantics)
        expect_c = {}
        rows = ev.select(
            "user_id", "ts", "event_id",
            (F.col("value").cast("decimal(18,4)") * 10000)
            .cast("bigint").alias("x_fp"),
        ).collect()
        for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
            s, mx, alarms = expect_c.get(r.user_id, (0, 0, 0))
            s = max(0, s + (r.x_fp - MEAN_FP))
            mx = max(mx, s)
            if s > H_FP:
                alarms += 1
            expect_c[r.user_id] = (s, mx, alarms)

        got_c = {}
        for r in sorted(
            spark.read.parquet(cout).collect(), key=lambda r: r.batch_id
        ):
            got_c[r.user_id] = (r.cusum_fp, r.max_cusum_fp, r.n_alarms)

        total = d1 + d2
        last_state = state_stats[-1] if state_stats else {}
        out["cusum"] = {
            "sec": round(total, 2),
            "rows_per_sec": int(n_rows / total),
            "exact": got_c == expect_c,
            "users": len(got_c),
            "state_rows": last_state.get("rows"),
            "state_mb": last_state.get("mb"),
            "restart": True,
        }
        print(json.dumps(out))
        ok = out["rollup"]["exact"] and out["cusum"]["exact"]
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
