"""Batch table loaders for the synthetic warehouse.

One parquet file per table under an sf directory (TESTDATA.md). Loaders
go through ``spark.read.parquet`` so Catalyst gets native filter
pushdown + column pruning; never collect driver-side.

Nanosecond-timestamp compat: some driver tables (``events``) are
written with parquet TIMESTAMP(NANOS), which Spark rejects outright
(PARQUET_TYPE_ILLEGAL). DuckDB silently truncates ns -> us (its native
unit), so we do exactly the same conversion once via pyarrow into a
local cache dir and read the cached file. Values are bit-identical to
what the DuckDB oracle sees.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (fixed
# size or sublinear growth in TPC-H-style generators). customer/part/
# orders grow linearly — those are left to AQE.
BROADCAST_DIMS = {"region", "nation", "supplier"}

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".testdata_cache")


def path_for(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_NS_PROBE_CACHE: dict[str, bool] = {}


def _needs_ns_downcast(src: str) -> bool:
    if src not in _NS_PROBE_CACHE:
        schema = pq.read_schema(src)
        _NS_PROBE_CACHE[src] = any(
            pa.types.is_timestamp(t) and t.unit == "ns" for t in schema.types
        )
    return _NS_PROBE_CACHE[src]


def _us_schema(schema: pa.Schema) -> pa.Schema:
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            fields.append(f.with_type(pa.timestamp("us", tz=f.type.tz)))
        else:
            fields.append(f)
    return pa.schema(fields)


def spark_readable_path(sf_dir: str, name: str) -> str:
    """Return a path Spark can read, converting ns timestamps to us once."""
    src = path_for(sf_dir, name)
    if not _needs_ns_downcast(src):
        return src
    tag = os.path.basename(os.path.normpath(sf_dir))
    dst = os.path.join(_CACHE_ROOT, tag, f"{name}.parquet")
    if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
        return dst
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tbl = pq.read_table(src)
    # safe=False: truncate sub-microsecond digits, exactly as DuckDB does
    # when it reads ns timestamps into its native us representation.
    tbl = tbl.cast(_us_schema(tbl.schema), safe=False)
    pq.write_table(tbl, dst, compression="snappy")
    return dst


# Analyzed-DataFrame memo: repeated loads of the same table in the same
# session (75 registry queries in one driver run) skip re-listing files and
# re-reading parquet footers. Keyed by applicationId so a restarted session
# never sees a stale DataFrame. No persist()/cache() — that would swap
# parquet scans for InMemoryTableScan and hide pushdown from the plans the
# engine asserts on.
_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def invalidate_cache(path: str | None = None) -> None:
    """Drop memoized DataFrames whose file index may be stale.

    Must be called after any in-place rewrite of a parquet dir that may
    have been loaded in this session (maintenance does this itself);
    with no argument the whole memo is cleared.
    """
    if path is None:
        _DF_CACHE.clear()
        return
    norm = os.path.normpath(path)
    for key in [k for k in _DF_CACHE if os.path.normpath(k[1]) == norm]:
        del _DF_CACHE[key]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = spark_readable_path(sf_dir, name)
    key = (spark.sparkContext.applicationId, path)
    df = _DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _DF_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries run."""
    for n in TABLE_NAMES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
