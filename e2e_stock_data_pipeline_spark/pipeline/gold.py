"""Gold feature layer (reference: docs/databricks_setup.md:206-241 —
the price_features VIEW): ma_20 / ma_50 / 20-day volatility / daily
returns over (symbol, trade_date). One shared window spec -> one
shuffle + sort for all four features (single WindowExec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import moving_avg, pct_change, rolling_stddev


def price_features(
    silver: DataFrame, key: str = "symbol", time: str = "trade_date", value: str = "close"
) -> DataFrame:
    return silver.select(
        "*",
        moving_avg(key, time, value, 20).alias("ma_20"),
        moving_avg(key, time, value, 50).alias("ma_50"),
        rolling_stddev(key, time, value, 20).alias("volatility_20d"),
        pct_change(key, time, value).alias("daily_return"),
    )
