"""Watermarked stream-stream joins (SURVEY.md §2.10) — the enrichment
pattern the reference's batch tier approximates with its silver joins
(docs/databricks_setup.md silver build), expressed as a true
two-stream join with bounded state.

Structured Streaming buffers both sides in state until the watermark
says no more matches can arrive; the TIME-BOUND in the join condition
is what makes that state finite — without it the state store grows
unboundedly and a 100 TB/day stream OOMs. The bound here is the classic
"right event within [left_ts, left_ts + max_delay]" enrichment window,
so state per key is O(events inside one delay window).

Outer variants emit the null-matched row only when the watermark passes
the end of its match window (correct-by-construction lateness handling;
nothing is emitted early and retracted later).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on `key` with a bounded time window:
    right.right_ts in [left.left_ts, left.left_ts + max_delay].

    Both sides get the same watermark; Spark derives the state-eviction
    horizon from watermark + the time bound. how may be inner /
    leftOuter / rightOuter / fullOuter (Spark requires the time bound +
    both watermarks for the outer forms).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, how)
