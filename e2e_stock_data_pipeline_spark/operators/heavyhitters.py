"""Distributed heavy hitters [EXT]: find every value with frequency
> theta * N over a column whose cardinality is too large to groupBy.

Two passes, both bounded-memory:

1. per-partition Misra-Gries summaries (k = ceil(1/theta) counters) via
   mapInPandas — each partition emits at most k candidate values, and
   the MG guarantee transfers: any value with GLOBAL frequency >
   theta * N survives in at least one partition's summary (its count
   can be decremented at most (n_p / k) times per partition, and
   summing across partitions keeps every true heavy hitter's net count
   positive somewhere);
2. one exact counting pass RESTRICTED to the union of candidates
   (broadcast semi-join) — at most k * n_partitions distinct keys, so
   the groupBy state is tiny regardless of the column's true
   cardinality.

Output is exact counts for exactly the true heavy hitters — the
classic sketch-then-verify contract. A plain groupBy(col).count()
needs state proportional to the column cardinality; this needs
O(n_partitions / theta).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summary(values: pd.Series, k: int) -> dict:
    counters: dict = {}
    # dropna, not a None check: pandas renders numeric nulls as NaN, and
    # NaN != NaN defeats dict-key equality (each occurrence would become a
    # distinct counter key, corrupting decrements and emitting NaN rows)
    for v in values.dropna():
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def heavy_hitters(
    df: DataFrame, col: str, theta: float = 0.01
) -> DataFrame:
    """Exact (value, n) for every value with n > theta * count(df)."""
    if not 0 < theta < 1:
        raise ValueError(f"theta must be in (0, 1), got {theta}")
    k = max(int(1.0 / theta) + 1, 2)

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for v, c in _mg_summary(pdf[col], k).items():
                counters[v] = counters.get(v, 0) + c
        # keep this partition's k strongest candidates
        top = sorted(counters.items(), key=lambda kv: -kv[1])[:k]
        yield pd.DataFrame({col: [v for v, _ in top]})

    candidates = (
        df.select(col).mapInPandas(partials, schema=f"{col} {df.schema[col].dataType.simpleString()}")
        .distinct()
    )
    total = df.count()
    exact = (
        df.join(F.broadcast(candidates), col, "leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.filter(F.col("n") > theta * total)
