"""Constrained-memory resilience smoke (VERDICT r9 item 4).

100 TB means spill, not headroom: per-partition working sets must
degrade to disk instead of OOMing the executor. This runs the heavy
tier Spark-side (noop-forced) under a deliberately small driver heap
(local mode: driver heap IS the executor heap) with the event log on,
then parses per-query memory/disk spill bytes and peak execution
memory out of the SparkListenerTaskEnd records.

    SPARK_DRIVER_MEMORY=4g python scripts/mem_smoke.py <sf_dir> q41_... q56_...

Prints one JSON line per query:
    {"query": ..., "sec": ..., "rows": ..., "spill_mem_mb": ...,
     "spill_disk_mb": ..., "peak_exec_mb": ..., "failed_tasks": N}
and a closing {"metric": "mem_smoke", "heap": ..., "oom": false, ...}.
A query that throws (OOM or otherwise) is recorded with "error" and the
harness moves on — the smoke's pass condition is zero errors.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402

EVDIR = ".tmp/eventlog"


def _event_lines(path: str):
    # Spark 4 writes a rolling eventlog_v2_<app> DIRECTORY of events_* files
    files = (
        sorted(glob.glob(os.path.join(path, "events_*")))
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp) as f:
            yield from f


def _spill_from_eventlog(path: str) -> dict[str, float]:
    mem = disk = peak = 0.0
    failed = 0
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        if ev.get("Task End Reason", {}).get("Reason") != "Success":
            failed += 1
        tm = ev.get("Task Metrics") or {}
        mem += tm.get("Memory Bytes Spilled", 0)
        disk += tm.get("Disk Bytes Spilled", 0)
        peak = max(peak, tm.get("Peak Execution Memory", 0))
    return {
        "spill_mem_mb": round(mem / 1e6, 1),
        "spill_disk_mb": round(disk / 1e6, 1),
        "peak_exec_task_mb": round(peak / 1e6, 1),
        "failed_tasks": failed,
    }


def main(argv: list[str]) -> int:
    sf_dir, names = argv[0], argv[1:]
    heap = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(EVDIR, exist_ok=True)
    registry = load_all_query_modules()

    errors = 0
    # One session per query: a fresh event log per query makes the
    # per-query attribution exact, and a fresh heap means one query's
    # cached leftovers can't mask another's pressure.
    for name in names:
        for old in glob.glob(f"{EVDIR}/*"):
            shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
        spark = get_spark(
            app_name=f"mem-smoke-{name}",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": os.path.abspath(EVDIR),
                # plain-text logs: the parser reads them directly
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        rec: dict = {"query": name, "heap": heap}
        t0 = time.perf_counter()
        try:
            df = registry[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            rec["sec"] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # OOM shows up here as a Py4J error
            rec["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
            errors += 1
        spark.stop()
        time.sleep(1.0)
        logs = glob.glob(f"{EVDIR}/*")
        if logs:
            rec.update(_spill_from_eventlog(max(logs, key=os.path.getmtime)))
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "metric": "mem_smoke",
                "heap": heap,
                "sf_dir": sf_dir,
                "queries": len(names),
                "errors": errors,
                "oom": errors > 0,
            }
        ),
        flush=True,
    )
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
