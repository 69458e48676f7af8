"""Simulate the driver's correctness gate, in the driver's order, with timing.

The round-1 driver run truncated after the 48th query (q40) — everything
later in registry order got no CORRECTNESS row. This script reproduces the
driver's loop shape (iterate ``queries()`` in insertion order, run the Spark
query, collect, run the DuckDB oracle, compare) and prints per-query wall
time plus a cumulative clock, so we can prove the whole registry fits any
plausible budget and spot pathological startup costs at the truncation point.

    python scripts/driver_sim.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES, oracle_view_source  # noqa: E402


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = None
    if "--json" in argv:
        out_path = argv[argv.index("--json") + 1]
    # --shard K/N: run only queries whose position (driver order) % N == K.
    # Lets a long sweep (e.g. sf1) split across bounded process windows.
    shard_k, shard_n = 0, 1
    if "--shard" in argv:
        shard_k, shard_n = map(int, argv[argv.index("--shard") + 1].split("/"))
    # --only q1,q2,...: run just the named queries (skew-dir spot checks)
    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))

    t_start = time.perf_counter()
    import os

    par = os.environ.get("DRIVER_SIM_PARALLELISM", "16")
    builder = (
        SparkSession.builder.master(f"local[{par}]")
        .config("spark.sql.shuffle.partitions", par)
        .config("spark.ui.enabled", "false")
    )
    # big-sf sweeps (sf1 = 100x the gate) need a real heap; default stays
    # unset for parity with the driver's own gate process. Measured r14:
    # a one-process FULL-registry sweep at sf0.1 OOMs the 1g default
    # around query ~99 (accumulated codegen classes + broadcast blocks —
    # no release() between queries, by design: the real gate doesn't
    # either) — run sweeps above sf0.01 with DRIVER_SIM_MEMORY=8g+ or
    # use --shard.
    mem = os.environ.get("DRIVER_SIM_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()

    # Queries whose oracle embeds a literal path (pinned_sf_dir) are only
    # valid at that sf: run BOTH sides there regardless of the sweep dir,
    # so a cross-sf sweep stays a true apples-to-apples comparison.
    from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

    pinned = {
        n: s.pinned_sf_dir
        for n, s in load_all_query_modules().items()
        if s.pinned_sf_dir
    }

    _cons: dict[str, duckdb.DuckDBPyConnection] = {}

    def con_for(d: str) -> duckdb.DuckDBPyConnection:
        if d not in _cons:
            c = duckdb.connect()
            for t in TABLE_NAMES:
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM {oracle_view_source(d, t)}")
            _cons[d] = c
        return _cons[d]

    con = con_for(sf_dir)
    # warm up JVM/codegen and the table-load memo (ns->us cache, parquet
    # footers) with one untimed touch per table, so the first-ordered
    # queries' recorded costs aren't cold-start-contaminated — these
    # numbers feed scripts/query_costs.json and hence the gate ORDER:
    # an inflated first-query cost would push that query to the back of
    # its group on the next round, the opposite of cheapest-first.
    from e2e_stock_data_pipeline_spark.sources import tables as _tables

    for t in TABLE_NAMES:
        _tables.load(spark, sf_dir, t).limit(1).collect()
    t_setup = time.perf_counter() - t_start
    print(f"setup: {t_setup:.2f}s  ({len(qs)} queries, {len(osql)} oracles)")

    results = {}
    bad = []
    cum = t_setup
    # Driver order: dict insertion order, exactly as queries() yields it.
    for i, name in enumerate(qs, 1):
        if (i - 1) % shard_n != shard_k:
            continue
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        err = None
        q_dir = pinned.get(name, sf_dir)
        try:
            sdf = qs[name](spark, q_dir)
            srows = [tuple(r) for r in sdf.collect()]
            t_spark = time.perf_counter() - t0
            if name in osql:
                rel = con_for(q_dir).sql(osql[name])
                orows = rel.fetchall()
                ok = len(srows) == len(orows) and norm(srows, sdf.columns) == norm(
                    orows, list(rel.columns)
                )
            else:
                ok = None
            t_total = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            t_spark = t_total = time.perf_counter() - t0
            ok, err = False, f"{type(e).__name__}: {e}"
        if ok is False:
            bad.append(name)
        cum += t_total
        results[name] = {
            "ok": ok,
            "spark_s": round(t_spark, 3),
            "total_s": round(t_total, 3),
            "cum_s": round(cum, 1),
            "err": err,
        }
        print(
            f"[{i:2d}/{len(qs)}] {name:38s} {t_total:6.2f}s  cum={cum:7.1f}s"
            + ("" if ok in (True, None) else "  **MISMATCH**")
            + (f"  {err}" if err else "")
        )

    print(f"\nTOTAL: {cum:.1f}s  mismatches: {bad or 'NONE'}")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["total_s"])[:10]
    print("slowest:", ", ".join(f"{n}={r['total_s']}s" for n, r in slow))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()
    for c in _cons.values():  # release view-backed file handles (ADVICE r7)
        c.close()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
