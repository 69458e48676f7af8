"""Semantics + property tests for queries_ext11 (q167 conversion lag,
q168 exact group quantiles): hand-computed funnel fixtures, the
lower-quantile definition on a known ladder, and the generalized
two-pass quantile plan's bit-equality with the naive one-window form
plus bucket-width invariance."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.plans.queries_ext11 import (
    exact_group_quantiles_plan,
)
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _write(tmp_path, table, rows) -> str:
    d = str(tmp_path)
    pd.DataFrame([r.asDict() for r in rows]).to_parquet(
        os.path.join(d, f"{table}.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return d


def _ev(eid, day, h, m, etype, user, value=1.0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day, h, m, 0),
        user_id=user,
        event_type=etype,
        value=value,
        props="{}",
    )


class TestConversionLag:
    def test_lag_and_dow_hand_computed(self, spark, tmp_path):
        # 2024-01-05 is a Friday -> portable dow 5; purchase 30 min after
        rows = [
            _ev(1, 5, 10, 0, "click", 1),
            _ev(2, 5, 10, 30, "purchase", 1),
        ]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q167_conversion_lag"].spark(spark, d).collect()
        assert (r.dow, r.n_conversions, r.median_lag_s) == (5, 1, 1800)

    def test_purchase_before_click_ignored(self, spark, tmp_path):
        rows = [
            _ev(1, 5, 9, 0, "purchase", 1),  # before the first click
            _ev(2, 5, 10, 0, "click", 1),
            _ev(3, 5, 12, 0, "purchase", 1),
        ]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q167_conversion_lag"].spark(spark, d).collect()
        assert r.median_lag_s == 7200

    def test_no_purchase_after_click_drops_user(self, spark, tmp_path):
        rows = [
            _ev(1, 5, 9, 0, "purchase", 1),
            _ev(2, 5, 10, 0, "click", 1),
            _ev(3, 5, 10, 0, "click", 2),
            _ev(4, 5, 11, 0, "purchase", 2),
        ]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q167_conversion_lag"].spark(spark, d).collect()
        assert (r.n_conversions, r.median_lag_s) == (1, 3600)

    def test_median_is_middle_conversion(self, spark, tmp_path):
        rows = []
        for u, mins in [(1, 10), (2, 30), (3, 120)]:
            rows.append(_ev(u * 10, 5, 10, 0, "click", u))
            rows.append(
                Row(
                    event_id=u * 10 + 1,
                    ts=dt.datetime(2024, 1, 5, 10, 0) + dt.timedelta(minutes=mins),
                    user_id=u,
                    event_type="purchase",
                    value=1.0,
                    props="{}",
                )
            )
        d = _write(tmp_path, "events", rows)
        [r] = REG["q167_conversion_lag"].spark(spark, d).collect()
        assert (r.n_conversions, r.median_lag_s) == (3, 1800)


class TestExactQuantiles:
    def test_known_ladder(self, spark, tmp_path):
        # values 1..100 once each: lower quantile p is exactly value p
        rows = [
            _ev(i, 5, 10, 0, "view", i, value=float(i)) for i in range(1, 101)
        ]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q168_exact_quantiles"].spark(spark, d).collect()
        assert (r.n_events, r.p50_fp, r.p90_fp, r.p99_fp) == (
            100,
            500000,
            900000,
            990000,
        )

    def test_types_independent(self, spark, tmp_path):
        rows = [_ev(1, 5, 10, 0, "view", 1, 5.0), _ev(2, 5, 10, 0, "click", 2, 9.0)]
        d = _write(tmp_path, "events", rows)
        out = {
            r.event_type: r.p50_fp
            for r in REG["q168_exact_quantiles"].spark(spark, d).collect()
        }
        assert out == {"view": 50000, "click": 90000}


def _qframe(spark, n=20_000):
    """Skewed groups, heavy value duplication (mass at exact quantile
    crossings), small weights."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 8, F.lit("g0"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 2 + 1)))
        .alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(997)).alias("pc"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).alias("w"),
    )


class TestExactGroupQuantilesPlan:
    PS = (1, 37, 50, 90, 99, 100)

    def _naive(self, df, ps):
        pp = df.groupBy("g", "pc").agg(F.sum("w").alias("w"))
        c = pp.select(
            "g",
            "pc",
            F.sum("w")
            .over(
                Window.partitionBy("g").orderBy("pc").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cw"),
            F.sum("w").over(Window.partitionBy("g")).alias("tw"),
        )
        aggs = [F.max("tw").cast("bigint").alias("tw")] + [
            F.min(F.when(100 * F.col("cw") >= p * F.col("tw"), F.col("pc")))
            .cast("bigint")
            .alias(f"q_{p}")
            for p in ps
        ]
        return {r.g: tuple(r)[1:] for r in c.groupBy("g").agg(*aggs).collect()}

    def test_bit_equals_naive_one_window_form(self, spark):
        df = _qframe(spark)
        got = {
            r.g: tuple(r)[1:]
            for r in exact_group_quantiles_plan(df, "g", self.PS, bucket=100).collect()
        }
        assert got == self._naive(df, self.PS)

    @pytest.mark.parametrize("bucket", [1, 77, 10_000_000])
    def test_bucket_width_invariance(self, spark, bucket):
        df = _qframe(spark, n=5_000)
        base = {
            r.g: tuple(r)[1:]
            for r in exact_group_quantiles_plan(df, "g", self.PS, bucket=100).collect()
        }
        got = {
            r.g: tuple(r)[1:]
            for r in exact_group_quantiles_plan(
                df, "g", self.PS, bucket=bucket
            ).collect()
        }
        assert got == base

    def test_p100_is_max_and_quantiles_monotone(self, spark):
        df = _qframe(spark, n=3_000)
        rows = exact_group_quantiles_plan(df, "g", self.PS, bucket=50).collect()
        maxes = {r.g: r.mx for r in df.groupBy("g").agg(F.max("pc").alias("mx")).collect()}
        for r in rows:
            qs = [getattr(r, f"q_{p}") for p in self.PS]
            assert qs == sorted(qs)
            assert r.q_100 == maxes[r.g]
