"""Write a Hive-partitioned copy of an sf dir — the reference's
dt=/symbol= layout (reference: ingest_fmp_prices.py:92-105,
docs/databricks_setup.md:94) applied to the driver tables:

  * events   -> events.parquet/dt=YYYY-MM-DD/   (day of ts)
  * lineitem -> lineitem.parquet/ship_month=YYYY-MM/ (month of l_shipdate)
  * all other tables copied unchanged

Values are bit-identical to the source (the ns->us timestamp cast is the
one the engine/DuckDB apply on read anyway); only layout and row order
change. Used by the partitioned-layout sweep: the engine must produce
exactly the same answers over this layout, and date predicates must
skip whole partition files via footer stats.

    python scripts/gen_partitioned.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as ds
import pyarrow.parquet as pq


def _us(tbl: pa.Table) -> pa.Table:
    fields = [
        f.with_type(pa.timestamp("us", tz=f.type.tz))
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        else f
        for f in tbl.schema
    ]
    return tbl.cast(pa.schema(fields), safe=False)


def _write_partitioned(tbl: pa.Table, part_col: str, out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    ds.write_dataset(
        tbl,
        out,
        format="parquet",
        partitioning=ds.partitioning(
            pa.schema([(part_col, pa.string())]), flavor="hive"
        ),
        existing_data_behavior="overwrite_or_ignore",
    )


def main(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)

    ev = _us(pq.read_table(os.path.join(src, "events.parquet")))
    ev = ev.append_column("dt", pc.strftime(ev["ts"], "%Y-%m-%d"))
    _write_partitioned(ev, "dt", os.path.join(out, "events.parquet"))
    print("events: partitioned by dt")

    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    li = li.append_column("ship_month", pc.strftime(li["l_shipdate"], "%Y-%m"))
    _write_partitioned(li, "ship_month", os.path.join(out, "lineitem.parquet"))
    print("lineitem: partitioned by ship_month")

    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "documents",
        "embeddings",
    ):
        shutil.copy2(
            os.path.join(src, f"{name}.parquet"), os.path.join(out, f"{name}.parquet")
        )
    print("dims/facts copied; layout at", out)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_sf1/sf0.1_part"
    main(src, out)
