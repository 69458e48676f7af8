"""Ad-hoc oracle compare for a named subset of registry queries.

    python scripts/check_new.py q159 q160 ... [--sf /root/testdata/sf0.001]

Runs each query Spark-side and oracle-side (DuckDB) on the given sf dir
and prints rows/schema/hash match — the driver gate's comparison, scoped
to the queries under development.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES, oracle_view_source  # noqa: E402


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    prefixes = tuple(argv) or ("q",)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM {oracle_view_source(sf_dir, t)}"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if not name.startswith(prefixes):
            continue
        t0 = time.perf_counter()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = sdf.collect()
        cur = con.execute(oracles[name])
        ocols = [c[0] for c in cur.description]
        orows = cur.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        a, b = norm(srows, scols), norm(orows, ocols)
        ok = ok_cols and a == b
        dt = time.perf_counter() - t0
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} "
            f"spark_rows={len(srows)} oracle_rows={len(orows)} "
            f"cols_match={ok_cols} {dt:.1f}s"
        )
        if not ok:
            failures += 1
            if not ok_cols:
                print(f"  spark cols: {scols}\n  oracle cols: {ocols}")
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print(f"  spark-only: {r}")
            for r in list(sb - sa)[:3]:
                print(f"  oracle-only: {r}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
