"""Semantics tests for the round-9 session-5 queries (queries_ext12):
hand-computed fixtures for the Markov transition probabilities, the
degree-oriented triangle census, the winsorized/trimmed cut points,
the leave-one-out encoding arithmetic, dwell-time gap extraction, and
a pure-Python CUSUM reference replay."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import Row

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


def _ev(eid, minute, etype="view", user=1, value=1.0, second=0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 5, 10, minute, second),
        user_id=user,
        event_type=etype,
        value=value,
        props="{}",
    )


def _li(okey, pkey):
    return Row(
        l_orderkey=okey,
        l_partkey=pkey,
        l_suppkey=1,
        l_linenumber=1,
        l_quantity=1.0,
        l_extendedprice=100.0,
        l_discount=0.0,
        l_tax=0.0,
        l_returnflag="N",
        l_linestatus="O",
        l_shipdate=dt.datetime(2024, 1, 5),
    )


class TestMarkovTransitions:
    def test_counts_and_ppm_probabilities(self, spark, tmp_path):
        # user 1: A -> B -> A   user 2: B -> B
        d = _write(
            tmp_path,
            "events",
            [
                _ev(1, 0, "A", user=1),
                _ev(2, 1, "B", user=1),
                _ev(3, 2, "A", user=1),
                _ev(4, 0, "B", user=2),
                _ev(5, 1, "B", user=2),
            ],
        )
        rows = {
            (r.from_type, r.to_type): r
            for r in REG["q169_markov_transitions"].spark(spark, d).collect()
        }
        assert rows[("A", "B")].n == 1 and rows[("A", "B")].p_fp == 1_000_000
        assert rows[("B", "A")].n == 1 and rows[("B", "A")].p_fp == 500_000
        assert rows[("B", "B")].n == 1 and rows[("B", "B")].p_fp == 500_000
        assert len(rows) == 3

    def test_ts_tie_broken_by_event_id(self, spark, tmp_path):
        # same ts: event_id orders the chain A(1) -> B(2) -> C(3)
        d = _write(
            tmp_path,
            "events",
            [_ev(2, 0, "B"), _ev(1, 0, "A"), _ev(3, 0, "C")],
        )
        got = {
            (r.from_type, r.to_type)
            for r in REG["q169_markov_transitions"].spark(spark, d).collect()
        }
        assert got == {("A", "B"), ("B", "C")}


class TestTriangleCensus:
    def test_one_triangle_exact_counts(self, spark, tmp_path):
        # parts 1,2,3 co-occur in two orders -> 3 edges, 1 triangle;
        # part 4 shares only ONE order with part 1 -> no edge (n >= 2)
        rows = [
            _li(101, 1), _li(101, 2), _li(101, 3),
            _li(102, 1), _li(102, 2), _li(102, 3),
            _li(103, 1), _li(103, 4),
        ]
        d = _write(tmp_path, "lineitem", rows)
        [r] = REG["q170_triangle_census"].spark(spark, d).collect()
        assert r.n_nodes == 3
        assert r.n_edges == 3
        assert r.n_wedges == 3  # each node has degree 2 -> C(2,2)=1 each
        assert r.n_triangles == 1
        assert r.transitivity_fp == 1_000_000  # 3*1 / 3 wedges

    def test_open_wedge_not_counted(self, spark, tmp_path):
        # path 1-2-3 (no closing 1-3 edge): 1 wedge, 0 triangles
        rows = [
            _li(101, 1), _li(101, 2),
            _li(102, 1), _li(102, 2),
            _li(103, 2), _li(103, 3),
            _li(104, 2), _li(104, 3),
        ]
        d = _write(tmp_path, "lineitem", rows)
        [r] = REG["q170_triangle_census"].spark(spark, d).collect()
        assert r.n_edges == 2
        assert r.n_wedges == 1
        assert r.n_triangles == 0
        assert r.transitivity_fp == 0


class TestWinsorizedMeans:
    def test_values_1_to_20(self, spark, tmp_path):
        rows = [_ev(i, i, "A", value=float(i)) for i in range(1, 21)]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q171_winsorized_means"].spark(spark, d).collect()
        # lower-quantile definition: p05 is the 1st of 20, p95 the 19th
        assert r.lo_fp == 10_000
        assert r.hi_fp == 190_000
        assert r.n_events == 20
        # winsorized: 1..19 unchanged, 20 clipped to 19
        assert r.winsor_mean_fp == (sum(range(1, 20)) + 19) * 10_000 // 20
        # trimmed: rows 1..19 kept
        assert r.n_kept == 19
        assert r.trim_mean_fp == sum(range(1, 20)) * 10_000 // 19


class TestTargetEncoding:
    def test_loo_excludes_own_row(self, spark, tmp_path):
        cust = [
            Row(c_custkey=1, c_name="a", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="SEG_A"),
            Row(c_custkey=2, c_name="b", c_nationkey=1, c_acctbal=0.0,
                c_mktsegment="SEG_A"),
        ]
        orders = [
            Row(o_orderkey=10, o_custkey=1, o_orderstatus="F",
                o_totalprice=10.0, o_orderdate=dt.datetime(2024, 1, 1),
                o_orderpriority="1-URGENT"),
            Row(o_orderkey=11, o_custkey=2, o_orderstatus="F",
                o_totalprice=20.0, o_orderdate=dt.datetime(2024, 1, 2),
                o_orderpriority="1-URGENT"),
        ]
        d = _write(tmp_path, "customer", cust)
        _write(tmp_path, "orders", orders)
        [r] = REG["q172_target_encoding"].spark(spark, d).collect()
        assert r.segment == "SEG_A" and r.n_orders == 2
        assert r.seg_mean_fp == 150_000
        # LOO of the 10.0 order sees only 20.0 and vice versa
        assert r.loo_min_fp == 100_000
        assert r.loo_max_fp == 200_000
        assert r.loo_avg_fp == 150_000


class TestDwellQuantiles:
    def test_gap_belongs_to_first_events_type(self, spark, tmp_path):
        # user: A @10:00 -> B @10:10 -> A @10:30; gaps: A->10min, B->20min
        d = _write(
            tmp_path,
            "events",
            [_ev(1, 0, "A"), _ev(2, 10, "B"), _ev(3, 30, "A")],
        )
        rows = {
            r.event_type: r
            for r in REG["q173_dwell_quantiles"].spark(spark, d).collect()
        }
        assert rows["A"].n_gaps == 1
        assert rows["A"].p50_us == 10 * 60 * 1_000_000
        assert rows["A"].p99_us == 10 * 60 * 1_000_000
        assert rows["B"].n_gaps == 1
        assert rows["B"].p50_us == 20 * 60 * 1_000_000


def _cusum_reference(values: list[float]):
    """Pure-Python replay of q174's integer definitions for one user."""
    x = [int(round(v * 10_000)) for v in values]
    n = len(x)
    mean = sum(x) // n
    mad = sum(abs(v - mean) for v in x) // n
    h = 6 * mad
    s = 0
    max_s, alarms, first_alarm_idx = 0, 0, None
    for i, v in enumerate(x):
        s = max(0, s + (v - mean))
        max_s = max(max_s, s)
        if s > h:
            alarms += 1
            if first_alarm_idx is None:
                first_alarm_idx = i
    return mean, mad, max_s, alarms, first_alarm_idx


class TestCusumAlarms:
    VALUES = [1.0, 1.2, 0.9, 1.1, 1.0, 1.05, 0.95, 1.0, 9.0, 9.5, 9.2, 9.4]

    def test_matches_pure_python_recursion(self, spark, tmp_path):
        rows = [
            _ev(i + 1, i, "view", value=v) for i, v in enumerate(self.VALUES)
        ]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q174_cusum_alarms"].spark(spark, d).collect()
        mean, mad, max_s, alarms, first_idx = _cusum_reference(self.VALUES)
        assert r.n_events == len(self.VALUES)
        assert r.mean_fp == mean
        assert r.mad_fp == mad
        assert r.max_cusum_fp == max_s
        assert r.n_alarms == alarms
        # the sustained 9.x shift must actually alarm for this test to
        # carry evidence
        assert alarms > 0
        assert r.first_alarm_ts == dt.datetime(2024, 1, 5, 10, first_idx, 0)

    def test_stable_series_never_alarms(self, spark, tmp_path):
        vals = [1.0, 1.01, 0.99, 1.0, 1.02, 0.98]
        rows = [_ev(i + 1, i, "view", value=v) for i, v in enumerate(vals)]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q174_cusum_alarms"].spark(spark, d).collect()
        assert r.n_alarms == 0
        assert r.first_alarm_ts is None
