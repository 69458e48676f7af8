"""Semantics tests for the round-8 session-2 queries (queries_ext8):
hand-computed fixtures for gap-fill, VWAP, drawdown, MAD outliers, and
cross-checks proving the apriori pruning (q138) and the forward as-of
direction (q139) change nothing about the answer, only the cost."""

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
    """Write rows as a single-file events.parquet (the testdata layout):
    us timestamps so tables.load takes the direct read path, no cache."""
    d = str(tmp_path)
    pd.DataFrame([r.asDict() for r in rows]).to_parquet(
        os.path.join(d, "events.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return d


def _ts(day: int, hour: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


class TestGapFill:
    def test_holes_filled_with_previous_close(self, spark, tmp_path):
        # user 1: days 1, 2, 5 observed (two ticks on day 2 — last wins).
        rows = [
            Row(event_id=1, ts=_ts(1), user_id=1, event_type="view", value=10.0, props="{}"),
            Row(event_id=2, ts=_ts(2, 9), user_id=1, event_type="view", value=20.0, props="{}"),
            Row(event_id=3, ts=_ts(2, 18), user_id=1, event_type="view", value=25.0, props="{}"),
            Row(event_id=4, ts=_ts(5), user_id=1, event_type="view", value=40.0, props="{}"),
        ]
        d = _write_events(tmp_path, rows)
        out = REG["q135_gap_fill_ffill"].spark(spark, d).orderBy("day").collect()
        got = [(r.day.day, r.value, r.is_filled) for r in out]
        assert got == [
            (1, 10.0, False),
            (2, 25.0, False),  # last tick of the day wins
            (3, 25.0, True),   # hole -> previous close
            (4, 25.0, True),
            (5, 40.0, False),
        ]

    def test_no_rows_outside_key_span(self, spark, tmp_path):
        rows = [
            Row(event_id=1, ts=_ts(3), user_id=7, event_type="view", value=1.0, props="{}"),
            Row(event_id=2, ts=_ts(4), user_id=7, event_type="view", value=2.0, props="{}"),
        ]
        d = _write_events(tmp_path, rows)
        out = REG["q135_gap_fill_ffill"].spark(spark, d).collect()
        assert {r.day.day for r in out} == {3, 4}
        assert all(not r.is_filled for r in out)


class TestVwap:
    def test_hand_computed(self, spark, tmp_path):
        rows = [
            Row(event_id=1, ts=_ts(1, 9), user_id=1, event_type="view",
                value=10.0, props='{"k": 3}'),
            Row(event_id=2, ts=_ts(1, 10), user_id=1, event_type="view",
                value=20.0, props='{"k": 1}'),
            # zero-volume-only day is dropped by HAVING SUM(k) > 0
            Row(event_id=3, ts=_ts(2), user_id=1, event_type="view",
                value=99.0, props='{"k": 0}'),
        ]
        d = _write_events(tmp_path, rows)
        out = REG["q136_vwap"].spark(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_ticks, r.total_qty) == (2, 4)
        assert r.vwap == pytest.approx((10.0 * 3 + 20.0 * 1) / 4)


class TestMaxDrawdown:
    def test_hand_computed(self, spark, tmp_path):
        # peak runs 100, 100, 120, 120, 120; worst drop 120 -> 60.
        vals = [100.0, 80.0, 120.0, 60.0, 110.0]
        rows = [
            Row(event_id=i, ts=_ts(1, 9 + i), user_id=1, event_type="view",
                value=v, props="{}")
            for i, v in enumerate(vals)
        ]
        d = _write_events(tmp_path, rows)
        r = REG["q137_max_drawdown"].spark(spark, d).collect()[0]
        assert r.max_abs_drawdown == 60.0
        assert r.max_drawdown == pytest.approx(0.5)
        assert r.peak_value == 120.0

    def test_monotone_series_has_zero_drawdown(self, spark, tmp_path):
        rows = [
            Row(event_id=i, ts=_ts(1, 9 + i), user_id=1, event_type="view",
                value=float(i + 1), props="{}")
            for i in range(4)
        ]
        d = _write_events(tmp_path, rows)
        r = REG["q137_max_drawdown"].spark(spark, d).collect()[0]
        assert r.max_drawdown == 0.0 and r.max_abs_drawdown == 0.0


class TestCopurchasePruning:
    def test_apriori_prune_is_lossless(self, spark):
        """Dropping parts with <2 distinct orders cannot change pair counts
        with support >= 2 — verify on real data against the unpruned join."""
        li = tables.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
        a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
        b = li.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_b"))
        naive = (
            a.join(b, (a.l_orderkey == b._ok) & (F.col("part_a") < F.col("part_b")))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders") >= 2)
            .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
            .limit(50)
        )
        pruned = REG["q138_copurchase_pairs"].spark(spark, SF)
        assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, pruned.collect()))


class TestAsofForward:
    def test_matches_naive_earliest_at_or_after(self, spark):
        e = tables.load(spark, SF, "events")
        clicks = e.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        )
        purchases = e.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        naive = (
            clicks.join(
                purchases,
                (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") >= F.col("ts")),
            )
            .groupBy("event_id", "user_id", "ts", "value")
            .agg(
                F.min("p_ts").alias("asof_ts"),
                F.min_by("p_value", "p_ts").alias("asof_value"),
            )
        )
        got = REG["q139_asof_forward"].spark(spark, SF)
        assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, got.collect()))


class TestMadOutliers:
    def test_single_spike_flagged_and_mad_robust(self, spark, tmp_path):
        # 9 calm ticks at 10±1 plus one wild spike: the spike is the only
        # outlier and the MAD ignores it (a stddev gate would be dragged).
        vals = [9.0, 10.0, 11.0, 10.0, 9.0, 11.0, 10.0, 10.0, 9.0, 500.0]
        rows = [
            Row(event_id=i, ts=_ts(1, 8 + i), user_id=1, event_type="view",
                value=v, props="{}")
            for i, v in enumerate(vals)
        ]
        d = _write_events(tmp_path, rows)
        r = REG["q140_mad_outliers"].spark(spark, d).collect()[0]
        assert r.n_rows == 10
        assert r.med_value == 10.0
        assert r.mad <= 1.0  # robust: untouched by the 500 spike
        assert r.n_outliers == 1

    def test_constant_series_has_no_outliers(self, spark, tmp_path):
        rows = [
            Row(event_id=i, ts=_ts(1, 8 + i), user_id=1, event_type="view",
                value=5.0, props="{}")
            for i in range(6)
        ]
        d = _write_events(tmp_path, rows)
        r = REG["q140_mad_outliers"].spark(spark, d).collect()[0]
        assert r.mad == 0.0 and r.n_outliers == 0


class TestStreaks:
    def test_hand_computed_islands(self, spark, tmp_path):
        # days 1,2,3 then 5,6 then 9 -> streaks 3,2,1; duplicate ticks on
        # day 2 must not inflate anything (distinct-day reduction).
        days = [1, 2, 2, 3, 5, 6, 9]
        rows = [
            Row(event_id=i, ts=_ts(d), user_id=1, event_type="view",
                value=1.0, props="{}")
            for i, d in enumerate(days)
        ]
        d = _write_events(tmp_path, rows)
        r = REG["q141_longest_streak"].spark(spark, d).collect()[0]
        assert (r.longest_streak, r.n_streaks, r.active_days) == (3, 3, 6)


class TestTwap:
    def test_hand_computed_weights(self, spark, tmp_path):
        # two ticks: 6h at 10.0 (06:00->12:00), 12h at 20.0 (12:00->24:00)
        rows = [
            Row(event_id=1, ts=_ts(1, 6), user_id=1, event_type="view",
                value=10.0, props="{}"),
            Row(event_id=2, ts=_ts(1, 12), user_id=1, event_type="view",
                value=20.0, props="{}"),
        ]
        d = _write_events(tmp_path, rows)
        r = REG["q142_twap"].spark(spark, d).collect()[0]
        assert r.n_ticks == 2
        assert r.twap == pytest.approx((10.0 * 6 + 20.0 * 12) / 18)

    def test_single_tick_day_is_its_own_twap(self, spark, tmp_path):
        rows = [Row(event_id=1, ts=_ts(1, 6), user_id=1, event_type="view",
                    value=42.5, props="{}")]
        d = _write_events(tmp_path, rows)
        r = REG["q142_twap"].spark(spark, d).collect()[0]
        assert r.twap == pytest.approx(42.5)


class TestWeeklyGrowth:
    def test_lag_nulls_and_ratio(self, spark, tmp_path):
        # 2024-01-01 and 2024-01-08 are both Mondays: two clean weeks.
        rows = [
            Row(event_id=1, ts=_ts(2), user_id=1, event_type="view",
                value=100.0, props="{}"),
            Row(event_id=2, ts=_ts(9), user_id=1, event_type="view",
                value=150.0, props="{}"),
        ]
        d = _write_events(tmp_path, rows)
        out = {r.week_start.day: r for r in REG["q143_weekly_growth"].spark(spark, d).collect()}
        assert out[1].wow_delta is None and out[1].wow_ratio is None
        assert out[8].wow_delta == 50.0
        assert out[8].wow_ratio == pytest.approx(1.5)


class TestPagerank:
    def test_matches_python_reference_on_toy_graph(self, spark, tmp_path):
        """Triangle 1-2-3 plus pendant 4 attached to 3: replicate the
        integer recursion in plain Python and expect bit-equality."""
        import pandas as pd2

        baskets = [(100, 1), (100, 2), (101, 2), (101, 3), (102, 1), (102, 3),
                   (103, 3), (103, 4)]
        d = str(tmp_path)
        pd2.DataFrame(baskets, columns=["l_orderkey", "l_partkey"]).to_parquet(
            os.path.join(d, "lineitem.parquet")
        )
        from e2e_stock_data_pipeline_spark.plans.queries_ext8 import (
            _PR_BASE, _PR_ITERS, _PR_SCALE, pagerank_plan,
        )

        li = tables.load(spark, d, "lineitem")
        got = {r.part_id: r.pagerank for r in pagerank_plan(li).collect()}

        edges = set()
        for ok, grp in pd2.DataFrame(baskets, columns=["o", "p"]).groupby("o"):
            ps = sorted(grp["p"])
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    edges.add((ps[i], ps[j])); edges.add((ps[j], ps[i]))
        deg = {}
        for u, _v in edges:
            deg[u] = deg.get(u, 0) + 1
        rank = {u: _PR_SCALE for u in deg}
        for _ in range(_PR_ITERS):
            nxt = {u: 0 for u in deg}
            for u, v in edges:
                nxt[v] += rank[u] // deg[u]
            rank = {v: _PR_BASE + (85 * s) // 100 for v, s in nxt.items()}
        assert got == rank
        # the hub (node 3: degree 3) must outrank the pendant (node 4)
        assert got[3] > got[4]


class TestPartitioningInvariance:
    """The oracle hash-equality already pins one execution; these pin that
    the answers don't depend on the INPUT's physical layout (the invariance
    a cluster repartition must not break — the q113/q127 convention)."""

    def _events_parted(self, spark, n):
        return tables.load(spark, SF, "events").repartition(n, "event_type")

    def test_gap_fill_invariant(self, spark):
        from e2e_stock_data_pipeline_spark.plans.queries_ext8 import gap_fill_plan

        a = sorted(map(tuple, gap_fill_plan(self._events_parted(spark, 1)).collect()))
        b = sorted(map(tuple, gap_fill_plan(self._events_parted(spark, 13)).collect()))
        assert a == b

    def test_twap_invariant(self, spark):
        from e2e_stock_data_pipeline_spark.plans.queries_ext8 import twap_plan

        a = sorted(map(tuple, twap_plan(self._events_parted(spark, 1)).collect()))
        b = sorted(map(tuple, twap_plan(self._events_parted(spark, 13)).collect()))
        assert a == b

    def test_mad_outliers_invariant(self, spark):
        from e2e_stock_data_pipeline_spark.plans.queries_ext8 import mad_outliers_plan

        a = sorted(map(tuple, mad_outliers_plan(self._events_parted(spark, 1)).collect()))
        b = sorted(map(tuple, mad_outliers_plan(self._events_parted(spark, 13)).collect()))
        assert a == b

    def test_pagerank_invariant(self, spark):
        from e2e_stock_data_pipeline_spark.plans.queries_ext8 import pagerank_plan

        li = tables.load(spark, SF, "lineitem")
        a = sorted(map(tuple, pagerank_plan(li.coalesce(1)).collect()))
        b = sorted(map(tuple, pagerank_plan(li.repartition(13, "l_partkey")).collect()))
        assert a == b


class TestScd2:
    def test_state_runs_collapse_to_intervals(self, spark, tmp_path):
        # stream: view view click view -> intervals view/click/view,
        # run-internal rows collapse, last interval open
        types = ["view", "view", "click", "view"]
        rows = [
            Row(event_id=i, ts=_ts(1, 8 + i), user_id=1, event_type=t,
                value=1.0, props="{}")
            for i, t in enumerate(types)
        ]
        d = _write_events(tmp_path, rows)
        out = REG["q146_scd2_intervals"].spark(spark, d).orderBy("valid_from").collect()
        assert [r.event_type for r in out] == ["view", "click", "view"]
        assert [r.is_current for r in out] == [False, False, True]
        assert out[0].valid_to == out[1].valid_from
        assert out[1].valid_to == out[2].valid_from
        assert out[2].valid_to is None


class TestEventTrigrams:
    def test_hand_computed_paths(self, spark, tmp_path):
        types = ["a", "b", "a", "b", "a"]  # trigrams: aba, bab, aba
        rows = [
            Row(event_id=i, ts=_ts(1, 8 + i), user_id=1, event_type=t,
                value=1.0, props="{}")
            for i, t in enumerate(types)
        ]
        d = _write_events(tmp_path, rows)
        out = {r.path: r.n for r in REG["q147_event_trigrams"].spark(spark, d).collect()}
        assert out == {"a>b>a": 2, "b>a>b": 1}

    def test_streams_do_not_cross_users(self, spark, tmp_path):
        # two users with 2 events each: no trigram can form
        rows = [
            Row(event_id=i, ts=_ts(1, 8 + i), user_id=i % 2, event_type="a",
                value=1.0, props="{}")
            for i in range(4)
        ]
        d = _write_events(tmp_path, rows)
        assert REG["q147_event_trigrams"].spark(spark, d).count() == 0
