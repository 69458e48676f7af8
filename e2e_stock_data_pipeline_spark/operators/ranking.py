"""Distributed global ranking.

`Window.orderBy(...)` with no partition key collapses the whole table
into ONE task (Spark even warns) — fine at 60k rows, fatal at 100 TB.
The scalable equivalent is the classic two-pass:

  1. range-partition + sort on the order key (distributed sort — the
     same machinery as orderBy);
  2. count rows per partition, prefix-sum the tiny per-partition counts
     driver-side;
  3. global rank = partition offset + intra-partition row_number
     (a window PARTITIONED by the sorted partition id — distributed).

global_ntile derives tiles from the rank arithmetically with exactly
SQL NTILE's distribution (first `total % n` tiles one row larger).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[Column | str], rank_col: str = "rank") -> DataFrame:
    """Dense global row_number over an arbitrary ordering, distributed."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parted = df.repartitionByRange(*cols).sortWithinPartitions(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # repartitionByRange SAMPLES its boundaries per job — pin the computed
    # partitioning so the count pass and the output pass see the SAME
    # partitions (otherwise offsets are garbage at scale).
    parted = parted.localCheckpoint(eager=True)
    counts = {r._pid: r.cnt for r in parted.groupBy("_pid").count().withColumnRenamed("count", "cnt").collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.coalesce(
        *[F.when(F.col("_pid") == pid, F.lit(off)) for pid, off in offsets.items()],
        F.lit(0),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        parted.withColumn(rank_col, (offset_col + F.row_number().over(w)).cast("bigint"))
        .drop("_pid")
    )


def global_ntile(
    df: DataFrame, order_cols: list[Column | str], n: int, tile_col: str = "tile"
) -> DataFrame:
    """NTILE(n) over a global ordering without a single-partition window.

    SQL NTILE semantics exactly: base = total div n rows per tile, the
    first total mod n tiles take one extra row (front-loaded).
    """
    ranked = global_rank(df, order_cols, "_grank")
    total = ranked.count()
    base, rem = divmod(total, n)
    boundary = (base + 1) * rem  # last rank inside the bigger tiles
    r = F.col("_grank")
    if base == 0:  # more tiles than rows: tile == rank
        tile = r.cast("int")
    else:
        tile = (
            F.when(r <= boundary, F.ceil(r / (base + 1)))
            .otherwise(rem + F.ceil((r - boundary) / base))
            .cast("int")
        )
    return ranked.withColumn(tile_col, tile).drop("_grank")
