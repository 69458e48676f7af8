"""Stage-level wall-clock decomposition for the aggregation-floor queries
(VERDICT r10 item 3).

At sf10 the q01/q03/q05/q29 tier sits at 7-13x a sub-second DuckDB
denominator. The claim to prove or refute: the residue is fixed dispatch
cost (driver planning, DAG scheduling, task launch) rather than plan
cost. This harness runs one registry query with the event log on, does
one untimed warmup, then decomposes ONE timed pass into:

  * pre-first-job driver time (Catalyst analyze/optimize + noop setup)
  * per-stage wall time, with each stage's summed task metrics split
    into executor compute (run time), deserialize/serialize, and
    scheduler delay (task wall - all metrics), plus a core-utilization
    ratio (task compute / (stage wall * cores))
  * inter-stage / inter-job gaps (AQE replanning + DAG scheduling)
  * post-last-job tail (driver commit)

    python scripts/profile_floor.py <sf_dir> q05_... [q29_...] [--conf k=v ...]

Prints one JSON line per query with the decomposition table.
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

EVDIR = ".tmp/eventlog_prof"


def _event_lines(path: str):
    files = (
        sorted(glob.glob(os.path.join(path, "events_*")))
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp) as f:
            yield from f


def decompose(path: str, t_start_ms: float, t_end_ms: float, cores: int) -> dict:
    """Parse the event log, keep jobs submitted inside [t_start, t_end],
    and build the wall-clock decomposition."""
    jobs = []  # (submit_ms, end_ms)
    stages = {}  # sid -> dict
    # TaskEnd events precede their StageCompleted event in the log, so
    # buffer task metrics per stage id and join at the end.
    tasks: dict[int, list] = {}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            if t_start_ms <= ev["Submission Time"] <= t_end_ms:
                jobs.append([ev["Job ID"], ev["Submission Time"], None])
        elif e == "SparkListenerJobEnd":
            for j in jobs:
                if j[0] == ev["Job ID"]:
                    j[2] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            if sub is None or not (t_start_ms <= sub <= t_end_ms):
                continue
            stages[si["Stage ID"]] = {
                "stage": si["Stage ID"],
                "name": si["Stage Name"].split(" at ")[0][:40],
                "tasks": si["Number of Tasks"],
                "sub_ms": sub,
                "end_ms": si["Completion Time"],
                "run_ms": 0.0,
                "deser_ms": 0.0,
                "ser_ms": 0.0,
                "sched_ms": 0.0,
                "launch_spread_ms": 0.0,
                "first_launch": None,
            }
        elif e == "SparkListenerTaskEnd":
            ti, tm = ev.get("Task Info", {}), ev.get("Task Metrics") or {}
            tasks.setdefault(ev["Stage ID"], []).append((ti, tm))

    for sid, st in stages.items():
        for ti, tm in tasks.get(sid, []):
            dur = ti["Finish Time"] - ti["Launch Time"]
            run = tm.get("Executor Run Time", 0)
            deser = tm.get("Executor Deserialize Time", 0)
            ser = tm.get("Result Serialization Time", 0)
            st["run_ms"] += run
            st["deser_ms"] += deser
            st["ser_ms"] += ser
            st["sched_ms"] += max(0, dur - run - deser - ser)
            fl = st["first_launch"]
            st["first_launch"] = ti["Launch Time"] if fl is None else min(fl, ti["Launch Time"])
            st["launch_spread_ms"] = max(st["launch_spread_ms"], ti["Launch Time"])

    slist = sorted(stages.values(), key=lambda s: s["sub_ms"])
    wall_ms = t_end_ms - t_start_ms
    first_job = min((j[1] for j in jobs), default=t_end_ms)
    last_job_end = max((j[2] or j[1] for j in jobs), default=t_start_ms)
    # time inside some stage (union of stage windows; stages can overlap)
    ivs = sorted((s["sub_ms"], s["end_ms"]) for s in slist)
    in_stage = 0.0
    cur_a = cur_b = None
    for a, b in ivs:
        if cur_a is None:
            cur_a, cur_b = a, b
        elif a <= cur_b:
            cur_b = max(cur_b, b)
        else:
            in_stage += cur_b - cur_a
            cur_a, cur_b = a, b
    if cur_a is not None:
        in_stage += cur_b - cur_a

    out_stages = []
    for s in slist:
        sw = s["end_ms"] - s["sub_ms"]
        out_stages.append(
            {
                "stage": s["stage"],
                "name": s["name"],
                "tasks": s["tasks"],
                "wall_s": round(sw / 1e3, 3),
                "compute_s": round(s["run_ms"] / 1e3, 3),
                "deser_s": round(s["deser_ms"] / 1e3, 3),
                "sched_delay_s": round(s["sched_ms"] / 1e3, 3),
                "launch_spread_s": round(
                    (s["launch_spread_ms"] - (s["first_launch"] or 0)) / 1e3, 3
                ),
                "core_util": round(s["run_ms"] / max(1.0, sw * cores), 2),
            }
        )
    return {
        "wall_s": round(wall_ms / 1e3, 3),
        "pre_first_job_s": round((first_job - t_start_ms) / 1e3, 3),
        "in_stage_s": round(in_stage / 1e3, 3),
        "gaps_between_stages_s": round(
            max(0.0, (last_job_end - first_job) - in_stage) / 1e3, 3
        ),
        "post_last_job_s": round((t_end_ms - last_job_end) / 1e3, 3),
        "n_jobs": len(jobs),
        "stages": out_stages,
    }


def main(argv: list[str]) -> int:
    extra = {}
    while "--conf" in argv:
        i = argv.index("--conf")
        k, v = argv[i + 1].split("=", 1)
        extra[k] = v
        argv = argv[:i] + argv[i + 2 :]
    sf_dir, names = argv[0], argv[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = load_all_query_modules()
    os.makedirs(EVDIR, exist_ok=True)

    for name in names:
        for old in glob.glob(f"{EVDIR}/*"):
            shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
        spark = get_spark(
            app_name=f"profile-{name}",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": os.path.abspath(EVDIR),
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
                **extra,
            },
        )
        spark.sparkContext.setLogLevel("ERROR")

        def force():
            registry[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        force()  # warmup: codegen, footers, broadcast relations
        # epoch-ms clock pairs with the event log's timestamps
        t0 = time.time() * 1e3
        force()
        t1 = time.time() * 1e3
        spark.stop()
        time.sleep(1.0)
        logs = glob.glob(f"{EVDIR}/*")
        rec = {"query": name, "sf_dir": sf_dir, "cores": cpus, "conf": extra}
        if logs:
            rec.update(decompose(max(logs, key=os.path.getmtime), t0, t1, cpus))
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
