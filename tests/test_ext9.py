"""Semantics tests for the round-8 session-3 queries (queries_ext9):
hand-computed fixtures for the rolling distinct-user window, the
portable day-of-week arithmetic, canonical selection determinism, the
OLS slope closed form, and the weighted-sample key's weight bias."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules
from e2e_stock_data_pipeline_spark.sources import tables

SF = "/root/testdata/sf0.001"

REG = load_all_query_modules()


def _write_events(tmp_path, rows) -> str:
    d = str(tmp_path)
    pd.DataFrame([r.asDict() for r in rows]).to_parquet(
        os.path.join(d, "events.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return d


def _ev(eid, day, hour, user):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day, hour, 0, 0),
        user_id=user,
        event_type="view",
        value=1.0,
        props="{}",
    )


class TestRollingDistinctUsers:
    def test_hand_computed_window(self, spark, tmp_path):
        # user 1 active day 1; user 2 active days 1 and 9; user 3 day 8.
        rows = [
            _ev(1, 1, 9, 1),
            _ev(2, 1, 10, 2),
            _ev(3, 9, 9, 2),
            _ev(4, 8, 9, 3),
        ]
        d = _write_events(tmp_path, rows)
        out = {
            r.day.day: r.users_7d
            for r in REG["q156_rolling_distinct_users"].spark(spark, d).collect()
        }
        # observed days only: 1, 8, 9. Day 1 window covers day 1 (users
        # 1,2); day 8 covers days 2-8 (user 3 only — day-1 activity aged
        # out); day 9 covers 3-9 (users 2, 3).
        assert out == {1: 2, 8: 1, 9: 2}

    def test_user_counted_once_across_window(self, spark, tmp_path):
        # same user active on 3 consecutive days: every window counts 1
        rows = [_ev(i, i, 9, 7) for i in (1, 2, 3)]
        d = _write_events(tmp_path, rows)
        out = {
            r.day.day: r.users_7d
            for r in REG["q156_rolling_distinct_users"].spark(spark, d).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1}


class TestSeasonalAnomalies:
    def test_portable_dow_is_sunday_zero(self, spark):
        # 2024-01-07 was a Sunday: (epoch_days + 4) % 7 must give 0
        row = (
            spark.range(1)
            .select(
                F.pmod(
                    F.datediff(
                        F.lit("2024-01-07").cast("date"),
                        F.lit("1970-01-01").cast("date"),
                    )
                    + 4,
                    F.lit(7),
                ).alias("dow")
            )
            .collect()[0]
        )
        assert row.dow == 0

    def test_spike_ranks_first(self, spark, tmp_path):
        # 3 Mondays at 9am: counts 1, 1, 4 -> the spike day leads the report
        rows = [_ev(1, 1, 9, 1), _ev(2, 8, 9, 1)] + [
            _ev(10 + i, 15, 9, i) for i in range(4)
        ]
        d = _write_events(tmp_path, rows)
        out = REG["q157_seasonal_anomalies"].spark(spark, d).collect()
        top = out[0]
        assert top.day == dt.date(2024, 1, 15) and top.n_events == 4
        # ratio = 4 * 3days * 1e6 DIV 6 total = 2_000_000 (2x the mean)
        assert top.ratio_fp == 2_000_000


class TestClusterCanonicals:
    def test_longest_doc_wins_ties_to_smallest_id(self, spark, tmp_path):
        # docs 1/2/3 near-identical (one cluster); 2 and 3 tie on length.
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            Row(doc_id=1, text=base + " one", lang="en", source="s", n_chars=10),
            Row(doc_id=2, text=base + " two", lang="en", source="s", n_chars=50),
            Row(doc_id=3, text=base + " six", lang="en", source="s", n_chars=50),
            Row(doc_id=9, text="totally different words entirely here now", lang="en", source="s", n_chars=7),
        ]
        d = str(tmp_path)
        pd.DataFrame([r.asDict() for r in rows]).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {
            r.cluster_id: (r.rep_doc_id, r.cluster_size, r.rep_n_chars)
            for r in REG["q158_cluster_canonicals"].spark(spark, d).collect()
        }
        # cluster of 1-3: longest n_chars (50) held by 2 and 3 -> smaller id 2
        assert out[1] == (2, 3, 50)
        assert out[9] == (9, 1, 7)


class TestNationRevenueTrend:
    def test_closed_form_on_perfect_lines(self, spark, tmp_path):
        # two customers in two nations; nation A revenue rises 100.00/day,
        # nation B falls 50.00/day -> slopes exactly +-1e8 micro-cents/day
        orders, custs = [], []
        nations = [Row(n_nationkey=0, n_name="A", n_regionkey=0),
                   Row(n_nationkey=1, n_name="B", n_regionkey=0)]
        custs = [Row(c_custkey=1, c_name="a", c_nationkey=0, c_acctbal=0.0, c_mktsegment="M"),
                 Row(c_custkey=2, c_name="b", c_nationkey=1, c_acctbal=0.0, c_mktsegment="M")]
        for i in range(5):
            day = dt.datetime(1995, 1, 1 + i)
            orders.append(Row(o_orderkey=10 + i, o_custkey=1, o_orderstatus="F",
                              o_totalprice=100.0 * (i + 1), o_orderdate=day,
                              o_orderpriority="1"))
            orders.append(Row(o_orderkey=20 + i, o_custkey=2, o_orderstatus="F",
                              o_totalprice=1000.0 - 50.0 * i, o_orderdate=day,
                              o_orderpriority="1"))
        d = str(tmp_path)
        pd.DataFrame([r.asDict() for r in orders]).to_parquet(
            os.path.join(d, "orders.parquet"), coerce_timestamps="us",
            allow_truncated_timestamps=True)
        pd.DataFrame([r.asDict() for r in custs]).to_parquet(os.path.join(d, "customer.parquet"))
        pd.DataFrame([r.asDict() for r in nations]).to_parquet(os.path.join(d, "nation.parquet"))
        out = {r.n_name: (r.n_days, r.slope_fp)
               for r in REG["q149_nation_revenue_trend"].spark(spark, d).collect()}
        # +100 dollars/day = +10000 cents/day = +1e10 micro-cents/day
        assert out["A"] == (5, 10_000 * 1_000_000)
        assert out["B"] == (5, -5_000 * 1_000_000)


class TestWeightedSampleKey:
    def test_key_monotone_decreasing_in_weight(self, spark):
        # same hash, heavier weight -> strictly smaller (or equal) key:
        # the inclusion bias that makes the sample weighted.
        df = spark.range(1).select(
            F.lit(123456789).cast("bigint").alias("h32"),
            F.lit(100).cast("bigint").alias("w_small"),
            F.lit(400).cast("bigint").alias("w_big"),
        )
        r = df.select(
            F.expr("(h32 * 1048576) DIV w_small").alias("k_small"),
            F.expr("(h32 * 1048576) DIV w_big").alias("k_big"),
        ).collect()[0]
        assert r.k_big < r.k_small

    def test_sample_is_reproducible(self, spark):
        a = REG["q150_weighted_sample"].spark(spark, SF).collect()
        b = REG["q150_weighted_sample"].spark(spark, SF).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestPartitioningInvariance:
    """Session-3 plans must not depend on physical layout: the shared
    constructors re-run on a repartitioned clone of their inputs (ext8
    convention); registry queries without a constructor get the weaker
    run-to-run determinism check."""

    def test_bigram_pmi_invariant(self, spark):
        from e2e_stock_data_pipeline_spark.plans.queries_ext9 import bigram_pmi_plan

        docs = tables.load(spark, SF, "documents")
        base = sorted(map(tuple, bigram_pmi_plan(docs).collect()))
        again = sorted(map(tuple, bigram_pmi_plan(docs.repartition(13)).collect()))
        assert base == again

    def test_containment_invariant(self, spark):
        from e2e_stock_data_pipeline_spark.operators.dedup import (
            containment_pairs,
            exploded_shingles,
        )

        sh = exploded_shingles(tables.load(spark, SF, "documents"), distinct=True)
        base = sorted(map(tuple, containment_pairs(sh, max_doc_freq=5).collect()))
        again = sorted(
            map(tuple, containment_pairs(sh.repartition(13), max_doc_freq=5).collect())
        )
        assert base == again

    @pytest.mark.parametrize(
        "name", ["q150_weighted_sample", "q155_minhash_calibration"]
    )
    def test_stable_across_runs(self, spark, name):
        spec = REG[name]
        a = sorted(map(tuple, spec.spark(spark, SF).collect()))
        b = sorted(map(tuple, spec.spark(spark, SF).collect()))
        assert a == b
