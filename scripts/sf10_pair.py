"""Single-pass Spark-vs-DuckDB pair timing PLUS exact result compare for
the sf10 tier, where the DuckDB side of the heavy queries runs minutes
to hours and the 3-run-median discipline of time_pair.py is infeasible.

Per query: one noop-forced timed Spark pass (warm: one untimed warmup
first), one timed DuckDB fetchall, then a collect of the Spark result
(warm, untimed) compared row-exactly (repr-normalized, column-sorted)
against the fetched oracle rows — the driver gate's comparison at sf10.

Oversized outputs (> _COLLECT_LIMIT rows — the synthetic corpus's tiny
vocabulary makes near-dup pair counts explode at sf10) switch to an
AGGREGATE compare: COUNT(*) plus an exact BIGINT sum per integer column
on both engines (still exact evidence — an extra, missing, or altered
pair moves the count or a key sum), and the DuckDB side is timed on
that aggregate over its oracle subquery (forces full evaluation without
materializing hundreds of millions of rows through fetchall, matching
what the noop sink does for Spark).

    python scripts/sf10_pair.py <sf_dir> q41_... [q56_...] [--duckdb-timeout SEC]

Env: SPARK_GRAFT_CPUS (default 32). A query whose oracle exceeds
--duckdb-timeout is recorded as oracle_timeout (Spark time + row count
still recorded); exactness for it must come from Spark-side invariants.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES, oracle_view_source  # noqa: E402


_COLLECT_LIMIT = 2_000_000


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def _int_cols(df):
    from pyspark.sql.types import IntegerType, LongType, ShortType

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (IntegerType, LongType, ShortType))
    ]


def _run_oracle(sf_dir: str, sql: str, cpus: int, q: "mp.Queue", passes: int = 1) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    # cap spill so a blow-up oracle (e.g. the textbook wedge join at
    # sf10) errors cleanly instead of filling the disk under everyone
    con.execute("SET temp_directory='.tmp/duck_spill'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {oracle_view_source(sf_dir, t)}")
    # passes > 1 = the symmetric warm protocol: one untimed warmup (the
    # mirror of Spark's), then the median of `passes` timed evaluations
    if passes > 1:
        con.sql(sql).fetchall()
    secs = []
    for _ in range(max(1, passes)):
        t0 = time.perf_counter()
        res = con.sql(sql)
        rows = res.fetchall()
        secs.append(time.perf_counter() - t0)
    secs.sort()
    q.put((secs[len(secs) // 2], rows, list(res.columns)))


def main(argv: list[str]) -> int:
    dto = 7200.0
    if "--duckdb-timeout" in argv:
        i = argv.index("--duckdb-timeout")
        dto = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # --passes K: the r13 warm protocol — BOTH engines get one untimed
    # warmup then the median of K timed passes. K=1 (default) is the
    # legacy r11/r12 protocol (one Spark warmup, single timed pass, cold
    # DuckDB) kept for cross-round comparability. The fresh-session
    # single-pass ratio mixes JIT/codegen warmup into the Spark number
    # and cache state into the DuckDB number (measured r13: Spark pass1
    # -> pass5 drops ~2x; DuckDB cross-session absolutes drift 2-3x) —
    # a multi-query deployment amortizes both, which K>=3 models.
    passes = 1
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf_dir, names = argv[0], argv[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = load_all_query_modules()

    spark = get_spark(
        app_name="sf10-pair", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    from pyspark.sql import functions as F

    # Same-session machine-condition controls, one per ENGINE (the r12
    # lesson generalized: Spark's floor/canary caught a 22% slower
    # machine, but r13 found the DuckDB side drifting 2-4x with page-
    # cache state while Spark held — ratio deltas across rounds are
    # uninterpretable without a control on BOTH sides). The canary is
    # the same fixed scan-agg on each engine: SUM/COUNT over lineitem.
    canary_df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
        F.sum("l_extendedprice"), F.count(F.lit(1))
    )
    canary_df.collect()  # warm both page cache and codegen
    t0 = time.perf_counter()
    canary_df.collect()
    spark_canary = time.perf_counter() - t0
    _c = duckdb.connect()
    _c.execute(f"SET threads TO {cpus}")
    _sql = (
        "SELECT SUM(l_extendedprice), COUNT(*) FROM "
        f"'{sf_dir}/lineitem.parquet'"
    )
    _c.sql(_sql).fetchall()
    t0 = time.perf_counter()
    _c.sql(_sql).fetchall()
    duck_canary = time.perf_counter() - t0
    _c.close()

    total_s = total_d = 0.0
    for name in names:
        spec = registry[name]
        try:
            df = spec.spark(spark, sf_dir)
            force(df)  # warmup
            s_times = []
            for _ in range(max(1, passes)):
                t0 = time.perf_counter()
                force(spec.spark(spark, sf_dir))
                s_times.append(time.perf_counter() - t0)
            s_times.sort()
            s_sec = s_times[len(s_times) // 2]

            n_rows = df.count()
        except Exception as exc:  # one query's OOM must not kill the table
            print(
                json.dumps(
                    {
                        "query": name,
                        "spark": None,
                        "error": f"{type(exc).__name__}: {str(exc)[:300]}",
                    }
                ),
                flush=True,
            )
            continue
        agg_mode = n_rows > _COLLECT_LIMIT
        oracle_sql = spec.oracle
        if agg_mode:
            ints = _int_cols(df)
            srow = tuple(
                df.agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(c).cast("long").alias(f"s_{c}") for c in ints],
                ).collect()[0]
            )
            sums = ", ".join(f'CAST(SUM("{c}") AS BIGINT)' for c in ints)
            oracle_sql = (
                f"SELECT COUNT(*) AS n{', ' + sums if sums else ''} "
                f"FROM ({spec.oracle}) _q"
            )
            srows = [srow]
        else:
            srows = [tuple(r) for r in df.collect()]

        rec = {
            "query": name,
            "spark": round(s_sec, 3),
            "spark_rows": n_rows,
            "compare": "aggregate" if agg_mode else "full",
        }
        if passes > 1:
            rec["passes"] = passes
            rec["spark_spread"] = [round(t, 3) for t in s_times]
        # oracle in a subprocess so a timeout is enforceable (DuckDB has
        # no interrupt API usable from a blocking fetchall)
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_run_oracle, args=(sf_dir, oracle_sql, cpus, q, passes))
        p.start()
        deadline = time.time() + dto
        got = None
        while time.time() < deadline:
            try:
                got = q.get(timeout=5.0)
                break
            except Exception:
                if not p.is_alive():
                    try:
                        got = q.get(timeout=5.0)
                    except Exception:
                        pass
                    break
        if got is None:
            p.terminate()
            p.join()
            rec["oracle"] = "timeout" if p.exitcode in (-15, None) else "error"
            rec["duckdb"] = None
        else:
            p.join()
            d_sec, orows, ocols = got
            rec["duckdb"] = round(d_sec, 3)
            rec["oracle_rows"] = len(orows)
            if agg_mode:
                # positional compare: both sides emit (count, sums...) in
                # the same construction order; names differ by design
                rec["match"] = [tuple(r) for r in orows] == srows
            else:
                rec["match"] = _norm(srows, df.columns) == _norm(orows, ocols)
            rec["ratio"] = round(s_sec / d_sec, 3) if d_sec else None
            total_d += d_sec
        total_s += s_sec
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "metric": "sf10_pair_total",
                "spark": round(total_s, 3),
                "duckdb": round(total_d, 3),
                "ratio": round(total_s / total_d, 3) if total_d else None,
                "passes": passes,
                "spark_canary_sec": round(spark_canary, 3),
                "duck_canary_sec": round(duck_canary, 3),
                "sf_dir": sf_dir,
                "heap": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
