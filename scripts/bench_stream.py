"""Streaming throughput bench (VERDICT r7 item 5): the bronze
files->parquet path has exactly-once and restart tests but carried no
recorded rows/sec number. This measures the reference's Auto Loader
shape (databricks/bronze_prices_auto_loader.ipynb:cell-1..cell-3) as
the engine runs it: a landing zone of parquet files, an availableNow
file-stream append through run_bronze_stream, with and without the
lineage columns (_processing_time + _metadata.file_path).

    python scripts/bench_stream.py [sf_dir] [n_files]

Prints ONE JSON line:
    {"metric": "bronze_stream_rows_per_sec", "rows": N, "files": F,
     "with_lineage": {"sec": s, "rows_per_sec": r},
     "without_lineage": {"sec": s, "rows_per_sec": r}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources import tables  # noqa: E402
from e2e_stock_data_pipeline_spark.streaming.bronze import (  # noqa: E402
    read_file_stream,
    run_bronze_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(
        app_name="stream-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # landing zone: the sf events table split into n_files parquet
        # files — the many-small-files regime Auto Loader targets
        landing = os.path.join(work, "landing")
        ev = tables.load(spark, sf_dir, "events")
        ev.repartition(n_files).write.mode("overwrite").parquet(landing)
        schema = spark.read.parquet(landing).schema
        n_rows = ev.count()

        out = {
            "metric": "bronze_stream_rows_per_sec",
            "rows": n_rows,
            "files": n_files,
            "sf": sf,
        }
        # untimed warmup on a small slice so JVM/codegen startup doesn't
        # pollute the first variant's number
        warm_src = read_file_stream(spark, landing, schema)
        run_bronze_stream(
            warm_src,
            os.path.join(work, "warm"),
            os.path.join(work, "warm_ckpt"),
        )
        variants = [
            # availableNow drains the whole backlog in one micro-batch
            ("with_lineage", True, None),
            ("without_lineage", False, None),
            # per-trigger file cap -> n_files/4 micro-batches: the
            # steady-state Auto Loader regime, pays WAL/commit per batch
            ("micro_batches_4_files", True, 4),
        ]
        for label, lineage, max_files in variants:
            dest = os.path.join(work, f"bronze_{label}")
            ckpt = os.path.join(work, f"ckpt_{label}")
            src = read_file_stream(
                spark, landing, schema, max_files_per_trigger=max_files
            )
            t0 = time.perf_counter()
            run_bronze_stream(src, dest, ckpt, lineage=lineage)
            dt = time.perf_counter() - t0
            got = spark.read.parquet(dest).count()
            assert got == n_rows, f"{label}: wrote {got} of {n_rows} rows"
            out[label] = {"sec": round(dt, 2), "rows_per_sec": int(n_rows / dt)}
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
