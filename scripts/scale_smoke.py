"""Scale smoke: run the engine's custom operators on ~10M generated rows
(100x the sf0.1 events table) on local[32] to demonstrate headroom —
the shapes that must survive a 1000-executor cluster, exercised at the
largest size this box holds comfortably.

    python scripts/scale_smoke.py [n_rows]

Not part of pytest (runtime ~minutes); results are recorded in
BENCH_NOTES.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.operators.asof import asof_join  # noqa: E402
from e2e_stock_data_pipeline_spark.operators.windows import keep_last, moving_avg  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    print(f"{label}: {n:,} rows in {time.perf_counter() - t0:.1f}s")


def main(n_rows: int = 10_000_000) -> None:
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic event stream: 10k keys, monotone-ish timestamps, 2-dec values
    ev = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            # 9999 is coprime to the %5 event-type split below, so purchase
            # and view rows share user_ids (10000 would partition them apart)
            (F.col("id") % 9_999).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000 + (F.xxhash64("id") % 997)
            ).alias("ts"),
            (F.round(F.abs(F.xxhash64("id", F.lit(1)) % 100_000) / 100.0, 2)).alias("value"),
        )
    )

    timed(
        f"moving averages (2 frames, {n_rows/1e6:.0f}M rows, 10k keys)",
        lambda: ev.select(
            "event_id", moving_avg("user_id", ["ts", "event_id"], "value", 20).alias("ma")
        ).count(),
    )

    timed(
        "keep-last dedup to 10k keys",
        lambda: keep_last(ev, ["user_id"], ["ts", "event_id"]).count(),
    )

    purchases = ev.filter(F.col("event_id") % 5 == 0)
    views = ev.filter(F.col("event_id") % 5 == 1).select("user_id", "ts", "value")
    timed(
        f"as-of join ({n_rows/5e6:.0f}M x {n_rows/5e6:.0f}M, 10k keys)",
        lambda: asof_join(
            purchases, views, on="user_id", left_time="ts", right_time="ts",
            value_cols=["value"],
        ).count(),
    )

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
