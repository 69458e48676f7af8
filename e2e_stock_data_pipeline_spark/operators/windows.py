"""Gold-layer feature windows (SURVEY.md §2.6, W1–W5).

The reference's Gold layer is a SQL view of rolling features over
(symbol, trade_date) — ma_20/ma_50, 20-day volatility, lag-based daily
returns, ROW_NUMBER keep-latest (reference: docs/databricks_setup.md:
206-241, 183-186). Here they are generic over any (key, time, value)
frame so the same operator serves prices, events, or any series.

Scale notes: one `Window.partitionBy(key).orderBy(time)` spec is shared
by every feature so Catalyst computes them all in ONE shuffle + sort
(a single WindowExec); per-key cardinality bounds state, so the plan
holds at 1000 executors as long as keys outnumber cores.

Numeric parity: rolling sums/avgs go through DECIMAL (exact in both
engines); only stddev stays in double space (guarded to frames >= 2
rows, matching stddev_samp NULL semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _ordered_window(key: str | list[str], time: str | list[str]):
    keys = [key] if isinstance(key, str) else list(key)
    times = [time] if isinstance(time, str) else list(time)
    return Window.partitionBy(*keys).orderBy(*times)


def moving_avg(key, time, value: str, n: int) -> Column:
    """n-row trailing moving average (W1/W2), exact decimal arithmetic."""
    w = _ordered_window(key, time).rowsBetween(-(n - 1), 0)
    return F.sum(F.col(value).cast(DEC)).over(w).cast("double") / F.count(F.col(value)).over(w)


def rolling_stddev(key, time, value: str, n: int) -> Column:
    """n-row trailing sample stddev (W3); NULL for frames of < 2 rows."""
    w = _ordered_window(key, time).rowsBetween(-(n - 1), 0)
    cnt = F.count(F.col(value)).over(w)
    return F.when(cnt > 1, F.stddev_samp(F.col(value)).over(w))


def pct_change(key, time, value: str) -> Column:
    """Lag-based one-step fractional change (W4); NULL on first row / zero lag."""
    w = _ordered_window(key, time)
    prev = F.lag(F.col(value), 1).over(w)
    return F.when(prev != 0, (F.col(value) - prev) / prev)


def row_number_desc(key, order: str | list[str]) -> Column:
    """ROW_NUMBER newest-first (W5) — the keep-latest dedup rank."""
    orders = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(*([key] if isinstance(key, str) else list(key))).orderBy(
        *[F.col(c).desc() for c in orders]
    )
    return F.row_number().over(w)


def keep_last(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Keep the newest row per key (U2/W5).

    Spark's dropDuplicates keeps an *arbitrary* row, so keep-"last"
    semantics (reference: polars ``unique(keep="last")``,
    ingest_fmp_prices.py:273; MERGE row_num=1 pattern,
    docs/databricks_setup.md:183-186) always go through ROW_NUMBER.
    """
    rn = row_number_desc(keys, order_cols)
    return df.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
