"""Semantic properties of the session-4 operators (q159–q166) that the
oracle's value-hash equality cannot express: the two-pass weighted
median's bucket-width invariance and bit-equality with the naive
one-window form, the linear skyline vs brute-force dominance, the
sweep-line peak vs a literal interval-overlap count, and the
interpolation's neighbor bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.plans.queries_ext10 import (
    peak_concurrency_plan,
    weighted_median_plan,
)
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _skewed_wm_frame(spark, n=20_000):
    """3 groups, zipf-ish: group g0 holds ~80% of rows; values clustered
    so bucket boundaries land mid-mass."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 8, F.lit("g0"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 2 + 1)))
        .alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("pc"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(9)) + 1).alias("w"),
    )


class TestWeightedMedian:
    def _naive(self, df):
        """The direct one-window formulation (the oracle's shape)."""
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
        return {
            (r.g): (r.total_weight, r.median_cents)
            for r in c.filter(2 * F.col("cw") >= F.col("tw"))
            .groupBy("g")
            .agg(
                F.max("tw").cast("bigint").alias("total_weight"),
                F.min("pc").cast("bigint").alias("median_cents"),
            )
            .collect()
        }

    def test_bit_equals_naive_one_window_form(self, spark):
        df = _skewed_wm_frame(spark)
        got = {
            r.g: (r.total_weight, r.median_cents)
            for r in weighted_median_plan(df, "g").collect()
        }
        assert got == self._naive(df)

    @pytest.mark.parametrize("bucket", [7, 100, 5_000, 10_000_000])
    def test_bucket_width_invariance(self, spark, bucket):
        """The histogram granularity is an execution knob, not a
        semantic one — any width (including one swallowing everything
        into bucket 0) must yield identical medians."""
        df = _skewed_wm_frame(spark, n=5_000)
        base = {
            r.g: (r.total_weight, r.median_cents)
            for r in weighted_median_plan(df, "g").collect()
        }
        got = {
            r.g: (r.total_weight, r.median_cents)
            for r in weighted_median_plan(df, "g", bucket=bucket).collect()
        }
        assert got == base


class TestParetoFrontier:
    def test_matches_bruteforce_dominance(self, spark, tmp_path):
        import os

        import pandas as pd

        pts = [
            (i, int(i * 2_654_435_761 % 37) + 1, float(900 + (i * 48_271 % 2000) / 100))
            for i in range(500)
        ]
        pd.DataFrame(
            [
                {
                    "p_partkey": k,
                    "p_name": "p",
                    "p_brand": "B",
                    "p_type": "T",
                    "p_size": s,
                    "p_retailprice": pr,
                }
                for k, s, pr in pts
            ]
        ).to_parquet(os.path.join(str(tmp_path), "part.parquet"))

        cents = [(s, round(pr * 100)) for _, s, pr in pts]
        brute = {}
        for s, pc in cents:
            dominated = any(
                s2 >= s and pc2 <= pc and (s2 > s or pc2 < pc) for s2, pc2 in cents
            )
            if not dominated:
                brute[(s, pc)] = brute.get((s, pc), 0) + 1
        got = {
            (r.p_size, r.price_cents): r.n_parts
            for r in REG["q163_pareto_frontier"].spark(spark, str(tmp_path)).collect()
        }
        assert got == brute


class TestPeakConcurrency:
    def _events(self, spark, n=3_000):
        # irregular timestamps across ~4 days, heavy collisions at the
        # minute grain so many intervals genuinely overlap
        return spark.range(n).select(
            F.concat(F.lit("t"), (F.col("id") % 2)).alias("event_type"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.pmod(F.xxhash64("id"), F.lit(350_000)) * 1_000_000)
            ).alias("ts"),
        )

    def test_matches_bruteforce_sweep(self, spark):
        ev = self._events(spark)
        rows = ev.collect()
        import collections

        best = {}
        for etype in {r.event_type for r in rows}:
            deltas = collections.Counter()
            for r in rows:
                if r.event_type != etype:
                    continue
                deltas[r.ts] += 1
                end = r.ts + __import__("datetime").timedelta(minutes=30)
                deltas[end] -= 1
            run, peak, peak_ts = 0, 0, None
            for t in sorted(deltas):
                run += deltas[t]
                if run > peak:
                    peak, peak_ts = run, t
            best[etype] = (peak, peak_ts)
        got = {
            r.event_type: (r.peak_concurrency, r.peak_ts)
            for r in peak_concurrency_plan(ev).collect()
        }
        assert got == best

    def test_partitioning_invariance(self, spark):
        ev = self._events(spark, n=2_000)
        a = sorted(map(tuple, peak_concurrency_plan(ev).collect()))
        b = sorted(map(tuple, peak_concurrency_plan(ev.repartition(17)).collect()))
        assert a == b


class TestGapFillInterp:
    def test_filled_values_bounded_by_neighbors(self, spark, sf_dir):
        out = REG["q165_gap_fill_interp"].spark(spark, sf_dir)
        w = Window.partitionBy("user_id").orderBy("day")
        pv = F.last(
            F.when(~F.col("is_filled"), F.col("value_fp")), ignorenulls=True
        ).over(w.rowsBetween(Window.unboundedPreceding, 0))
        nv = F.first(
            F.when(~F.col("is_filled"), F.col("value_fp")), ignorenulls=True
        ).over(w.rowsBetween(0, Window.unboundedFollowing))
        bad = (
            out.withColumn("_pv", pv)
            .withColumn("_nv", nv)
            .filter(F.col("is_filled"))
            .filter(
                (F.col("value_fp") < F.least("_pv", "_nv"))
                | (F.col("value_fp") > F.greatest("_pv", "_nv"))
            )
            .count()
        )
        assert bad == 0

    def test_span_endpoints_are_observed(self, spark, sf_dir):
        out = REG["q165_gap_fill_interp"].spark(spark, sf_dir)
        edges = out.groupBy("user_id").agg(
            F.min_by("is_filled", "day").alias("first_filled"),
            F.max_by("is_filled", "day").alias("last_filled"),
        )
        assert edges.filter(F.col("first_filled") | F.col("last_filled")).count() == 0

    def test_calendar_is_dense(self, spark, sf_dir):
        out = REG["q165_gap_fill_interp"].spark(spark, sf_dir)
        spans = out.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            (F.datediff(F.max("day"), F.min("day")) + 1).alias("want"),
        )
        assert spans.filter(F.col("n") != F.col("want")).count() == 0


class TestVocabGrowth:
    def test_cumulative_reaches_total_distinct(self, spark, sf_dir):
        from e2e_stock_data_pipeline_spark.operators.dedup import exploded_shingles
        from e2e_stock_data_pipeline_spark.sources import tables

        rows = sorted(
            REG["q166_vocab_growth"].spark(spark, sf_dir).collect(),
            key=lambda r: r.decile,
        )
        total = (
            exploded_shingles(tables.load(spark, sf_dir, "documents"))
            .select("shingle")
            .distinct()
            .count()
        )
        assert rows[-1].cum_shingles == total
        acc = 0
        for r in rows:
            acc += r.n_new_shingles
            assert r.cum_shingles == acc
