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

    The containment predicate lives IN the join condition (not a
    post-filter), so outer semantics survive: with how='left' a point
    inside no interval comes back once with null interval columns, and a
    point is never duplicated (it lives in exactly one chunk; an
    interval's replicas sit in distinct chunks).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    p = points.alias("p").withColumn(
        "_chunk", F.floor(F.col(point_col) / chunk).cast("bigint")
    )
    iv = intervals.alias("iv").withColumn(
        "_ichunk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / chunk).cast("bigint"),
                F.floor((F.col(end_col) - 1) / chunk).cast("bigint"),
            )
        ),
    )
    cond = (
        (F.col("_chunk") == F.col("_ichunk"))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return p.join(iv, cond, how).drop("_chunk", "_ichunk")
