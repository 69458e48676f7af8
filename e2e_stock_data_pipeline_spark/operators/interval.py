"""Interval (range) join: points joined to containing intervals.

Catalyst executes an inequality-only join as BroadcastNestedLoopJoin —
O(n*m) and undistributable when neither side broadcasts. The scale path
here CHUNKS time: each point maps to one chunk, each interval to every
chunk it overlaps, and the join becomes an EQUI join on chunk id
followed by the exact containment filter. Shuffle is keyed on chunk, so
work distributes; chunk width trades replication of long intervals
against chunk cardinality (pick ~ the median interval length).

(Same rewrite DuckDB/Trino perform internally for range joins; Spark
has no built-in, so the engine provides it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    chunk: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with start <= point < end.

    All three columns must be numeric (cast timestamps to epoch first).
    ``chunk`` is the bucket width in the same units.
    """
    p = points.withColumn("_chunk", F.floor(F.col(point_col) / chunk).cast("bigint"))
    iv = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / chunk).cast("bigint"),
                F.floor((F.col(end_col) - 1) / chunk).cast("bigint"),
            )
        ),
    )
    joined = p.join(iv, "_chunk", how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_chunk")
