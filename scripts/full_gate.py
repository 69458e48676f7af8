"""Run the driver-style correctness gate over the whole registry:
every query vs its DuckDB oracle at the given sf (default sf0.01).

    python scripts/full_gate.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES, oracle_view_source  # noqa: E402


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {oracle_view_source(sf_dir, t)}")
    bad = []
    for name in sorted(qs):
        if name not in osql:
            continue
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(osql[name])
        orows = rel.fetchall()
        ok = len(srows) == len(orows) and norm(srows, sdf.columns) == norm(
            orows, list(rel.columns)
        )
        if not ok:
            bad.append(name)
    print(f"GATE {sf_dir}: {len(qs)} queries, {len(osql)} oracles, mismatches: {bad or 'NONE'}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
