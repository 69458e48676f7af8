"""Skewed-dataset straggler bench (VERDICT r10 item 5).

The salted/bucketed skew operators are property-tested at synthetic
90%-head skew; this measures them on DATA-level skew — the zipf
dataset from scripts/gen_skewed.py — with and without the skew-safe
path, and records straggler ratios from the event log:

  straggler_ratio = max task duration / median task duration
                    on the variant's dominant (longest-max-task) stage

Variant pairs (each runs in a fresh session, warmup + 1 timed pass,
noop-forced):

  * type_topk      : per-event_type top-20 by value — 5-key zipf head
                     (~32% of rows in one group). naive = one Window
                     partitionBy(event_type); salted = salted_group_topk.
                     FINDING (r11): Spark 4 inserts Partial+Final
                     WindowGroupLimit for LITERAL rank<=k filters, so
                     the "naive" window is already map-side-limited and
                     skew-safe — both variants measure equal. Kept as
                     the exhibit for that optimizer behavior.
  * user_topk      : per-user_id top-5 — 15k*mult-key zipf. Same
                     WindowGroupLimit result.
  * source_sample  : q150's weighted bottom-k per source — ditto.
  * dyn_keep       : per-lang keep of a DYNAMIC per-group target
                     (rank <= joined n_target — q127's shape).
                     WindowGroupLimit needs a literal limit, so the
                     naive window REALLY sorts the 90% head lang in one
                     task; the bucketed keep is the skew-safe path.
                     This is the pair that shows the straggler.
  * part_join      : lineitem JOIN part ON l_partkey (SMJ-forced,
                     broadcast off) + per-brand agg — AQE skew-join
                     split OFF vs ON (thresholds sized to the local
                     shuffle: 32 MB skew threshold / 8 MB advisory).

    python scripts/bench_skew.py <skew_sf_dir> [pair ...]

Prints one JSON line per variant and a closing summary comparing each
pair (wall + straggler ratio, with/without).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from e2e_stock_data_pipeline_spark.operators import ranking as R  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources import tables  # noqa: E402

EVDIR = ".tmp/eventlog_skew"


def _event_lines(path: str):
    files = (
        sorted(glob.glob(os.path.join(path, "events_*")))
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp) as f:
            yield from f


def straggler(path: str, t0_ms: float, t1_ms: float) -> dict:
    """Per-stage task durations inside [t0, t1]; report the stage whose
    max task is the wall-clock bottleneck."""
    per_stage: dict[int, list[float]] = {}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        ti = ev.get("Task Info", {})
        if not (t0_ms <= ti.get("Launch Time", 0) <= t1_ms):
            continue
        per_stage.setdefault(ev["Stage ID"], []).append(
            (ti["Finish Time"] - ti["Launch Time"]) / 1e3
        )
    if not per_stage:
        return {}
    sid, durs = max(per_stage.items(), key=lambda kv: max(kv[1]))
    mx, md = max(durs), statistics.median(durs)
    return {
        "hot_stage": sid,
        "n_tasks": len(durs),
        "max_task_s": round(mx, 3),
        "p50_task_s": round(md, 3),
        "straggler_ratio": round(mx / md, 1) if md > 0.0005 else None,
    }


# ---------------------------------------------------------------- variants


def _events_keyed(spark, sf):
    return tables.load(spark, sf, "events").select(
        "event_id", "event_type", "user_id", "value"
    )


def type_topk_naive(spark, sf):
    e = _events_keyed(spark, sf)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return e.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 20)


def type_topk_salted(spark, sf):
    return R.salted_group_topk(
        _events_keyed(spark, sf),
        ["event_type"],
        [F.desc("value"), F.col("event_id")],
        k=20,
    )


def user_topk_naive(spark, sf):
    e = _events_keyed(spark, sf)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return e.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


def user_topk_salted(spark, sf):
    return R.salted_group_topk(
        _events_keyed(spark, sf),
        ["user_id"],
        [F.desc("value"), F.col("event_id")],
        k=5,
    )


_WS_SEED, _WS_SCALE, _WS_K = 7, 1 << 20, 10


def _ws_keyed(spark, sf):
    from e2e_stock_data_pipeline_spark.functions.hashing import portable_hash64

    docs = tables.load(spark, sf, "documents")
    h32 = F.pmod(portable_hash64(F.col("doc_id"), seed=_WS_SEED), F.lit(4294967296))
    return docs.select(
        "source",
        "doc_id",
        "n_chars",
        h32.alias("h32"),
        F.greatest(F.col("n_chars"), F.lit(1)).alias("w"),
    ).select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(f"CAST((h32 * {_WS_SCALE}) DIV w AS BIGINT)").alias("key_fp"),
    )


def source_sample_naive(spark, sf):
    k = _ws_keyed(spark, sf)
    w = Window.partitionBy("source").orderBy("key_fp", "doc_id")
    return k.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= _WS_K)


def source_sample_salted(spark, sf):
    return R.salted_group_topk(
        _ws_keyed(spark, sf), ["source"], [F.col("key_fp"), F.col("doc_id")], k=_WS_K
    )


def _lang_targets(spark, sf):
    docs = tables.load(spark, sf, "documents")
    return docs.groupBy("lang").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_target")
    )


def dyn_keep_naive(spark, sf):
    from e2e_stock_data_pipeline_spark.plans.queries_ext6 import naive_window_keep

    return naive_window_keep(
        tables.load(spark, sf, "documents"), _lang_targets(spark, sf)
    )


def dyn_keep_bucketed(spark, sf):
    return R.bucketed_group_keep(
        tables.load(spark, sf, "documents"), ["lang"], _lang_targets(spark, sf)
    )


def _type_targets(spark, sf):
    ev = tables.load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_target")
    )


def dyn_keep_events_naive(spark, sf):
    from pyspark.sql import Window as W

    from e2e_stock_data_pipeline_spark.functions.hashing import portable_hash64

    ev = tables.load(spark, sf, "events")
    wr = W.partitionBy("event_type").orderBy(
        portable_hash64("event_id", seed=11), F.col("event_id")
    )
    return (
        ev.select("event_id", "event_type", F.row_number().over(wr).alias("rnk"))
        .join(F.broadcast(_type_targets(spark, sf)), "event_type")
        .filter(F.col("rnk") <= F.col("n_target"))
        .select("event_id", "event_type")
    )


def dyn_keep_events_bucketed(spark, sf):
    return R.bucketed_group_keep(
        tables.load(spark, sf, "events"),
        ["event_type"],
        _type_targets(spark, sf),
        id_col="event_id",
    )


def part_join(spark, sf):
    li = tables.load(spark, sf, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    p = tables.load(spark, sf, "part").select("p_partkey", "p_brand")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("rev"),
        )
    )


_SMJ_BASE = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # size the skew trigger to the local shuffle (defaults assume 256MB
    # cluster partitions; the principle — split when partition >> median
    # — is what's under test, not the absolute threshold)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}

PAIRS: dict[str, list[tuple[str, object, dict]]] = {
    "type_topk": [
        ("type_topk_naive", type_topk_naive, {}),
        ("type_topk_salted", type_topk_salted, {}),
    ],
    "user_topk": [
        ("user_topk_naive", user_topk_naive, {}),
        ("user_topk_salted", user_topk_salted, {}),
    ],
    "source_sample": [
        ("source_sample_naive", source_sample_naive, {}),
        ("source_sample_salted", source_sample_salted, {}),
    ],
    "dyn_keep": [
        ("dyn_keep_naive", dyn_keep_naive, {}),
        ("dyn_keep_bucketed", dyn_keep_bucketed, {}),
    ],
    "dyn_keep_events": [
        ("dyn_keep_events_naive", dyn_keep_events_naive, {}),
        ("dyn_keep_events_bucketed", dyn_keep_events_bucketed, {}),
    ],
    "part_join": [
        (
            "part_join_skew_off",
            part_join,
            {**_SMJ_BASE, "spark.sql.adaptive.skewJoin.enabled": "false"},
        ),
        (
            "part_join_skew_on",
            part_join,
            {**_SMJ_BASE, "spark.sql.adaptive.skewJoin.enabled": "true"},
        ),
    ],
}


def main(argv: list[str]) -> int:
    sf_dir = argv[0]
    names = argv[1:] or list(PAIRS)
    unknown = [n for n in names if n not in PAIRS]
    if unknown:
        print(
            f"unknown pair(s) {unknown}; valid: {sorted(PAIRS)}",
            file=sys.stderr,
        )
        return 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(EVDIR, exist_ok=True)
    results: dict[str, dict] = {}

    for pair in names:
        for label, build, conf in PAIRS[pair]:
            for old in glob.glob(f"{EVDIR}/*"):
                shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
            spark = get_spark(
                app_name=f"skew-{label}",
                master=f"local[{cpus}]",
                shuffle_partitions=cpus,
                extra_conf={
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": os.path.abspath(EVDIR),
                    "spark.eventLog.compress": "false",
                    "spark.eventLog.rolling.enabled": "false",
                    **conf,
                },
            )
            spark.sparkContext.setLogLevel("ERROR")

            def force():
                build(spark, sf_dir).write.format("noop").mode("overwrite").save()

            force()  # warmup
            t0 = time.time() * 1e3
            force()
            t1 = time.time() * 1e3
            n_rows = build(spark, sf_dir).count()
            spark.stop()
            time.sleep(1.0)
            logs = glob.glob(f"{EVDIR}/*")
            rec = {"variant": label, "wall_s": round((t1 - t0) / 1e3, 3), "rows": n_rows}
            if logs:
                rec.update(straggler(max(logs, key=os.path.getmtime), t0, t1))
            results[label] = rec
            print(json.dumps(rec), flush=True)

    summary = {"metric": "skew_bench", "sf_dir": sf_dir, "pairs": {}}
    for pair in names:
        (la, _, _), (lb, _, _) = PAIRS[pair]
        a, b = results.get(la, {}), results.get(lb, {})
        summary["pairs"][pair] = {
            "without": {k: a.get(k) for k in ("wall_s", "max_task_s", "straggler_ratio")},
            "with": {k: b.get(k) for k in ("wall_s", "max_task_s", "straggler_ratio")},
            "rows_match": a.get("rows") == b.get("rows"),
        }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
