"""Bucketed table layout — co-located joins without shuffle.

The reference partitions Delta tables by symbol and Z-orders for scan
locality (docs/databricks_setup.md:94, bronze notebook cell-4); for the
100 TB join path the engine adds hash BUCKETING: two tables bucketed by
the same key into the same bucket count join with NO Exchange — the
shuffle is paid once at write time and amortized over every subsequent
join/aggregate on that key. This is the single biggest lever for the
repeated fact-fact joins (prices x fundamentals) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)
