"""Semantics tests for the round-9 session-5c queries (queries_ext14):
attribution conservation + remainder placement, the exact decay fold
values, and mode tie-breaking."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
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


def _ev(eid, minute, etype, value=1.0, user=1):
    return Row(
        event_id=eid, ts=dt.datetime(2024, 1, 5, 10 + minute // 60, minute % 60),
        user_id=user, event_type=etype, value=float(value), props="{}",
    )


class TestLinearAttribution:
    def test_remainder_goes_to_last_click_and_conserves(self, spark, tmp_path):
        # 3 clicks then a purchase of 1.0001 (10001 fp units):
        # 10001 DIV 3 = 3333 each, remainder 2 -> last click
        d = _write(
            tmp_path,
            "events",
            [
                _ev(1, 0, "click"),
                _ev(2, 10, "click"),
                _ev(3, 20, "click"),
                _ev(4, 30, "purchase", value=1.0001),
            ],
        )
        [r] = REG["q179_linear_attribution"].spark(spark, d).collect()
        assert r.n_purchases == 1
        assert r.n_credits == 3
        assert r.credited_fp == 10_001  # conservation, to the unit

    def test_click_outside_hour_excluded(self, spark, tmp_path):
        d = _write(
            tmp_path,
            "events",
            [
                _ev(1, 0, "click"),
                _ev(2, 70, "click"),
                _ev(3, 75, "purchase", value=2.0),
            ],
        )
        [r] = REG["q179_linear_attribution"].spark(spark, d).collect()
        # only the in-window click (id 2) is credited, with all the value
        assert r.n_credits == 1
        assert r.credited_fp == 20_000

    def test_purchase_with_no_clicks_absent(self, spark, tmp_path):
        d = _write(tmp_path, "events", [_ev(1, 0, "purchase", value=5.0)])
        assert REG["q179_linear_attribution"].spark(spark, d).collect() == []


class TestDecayedPopularity:
    def test_fold_values_exact(self, spark, tmp_path):
        # part 1 ordered this week (w=0), part 2 three weeks ago (w=3):
        # weights 1_000_000 and 970_299 (99^3 // 100^3 folded)
        orders = [
            Row(o_orderkey=1, o_custkey=1, o_orderstatus="F", o_totalprice=1.0,
                o_orderdate=dt.datetime(2024, 2, 1), o_orderpriority="1"),
            Row(o_orderkey=2, o_custkey=1, o_orderstatus="F", o_totalprice=1.0,
                o_orderdate=dt.datetime(2024, 1, 11), o_orderpriority="1"),
        ]
        li = [
            Row(l_orderkey=1, l_partkey=1, l_suppkey=1, l_linenumber=1,
                l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                l_returnflag="N", l_linestatus="O",
                l_shipdate=dt.datetime(2024, 2, 1)),
            Row(l_orderkey=2, l_partkey=2, l_suppkey=1, l_linenumber=1,
                l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                l_returnflag="N", l_linestatus="O",
                l_shipdate=dt.datetime(2024, 1, 11)),
        ]
        d = _write(tmp_path, "orders", orders)
        _write(tmp_path, "lineitem", li)
        rows = {r.partkey: r for r in REG["q180_decayed_popularity"].spark(spark, d).collect()}
        assert rows[1].decayed_fp == 1_000_000
        # ((1e6*99)//100 *99)//100 *99)//100 = 970299
        w = 1_000_000
        for _ in range(3):
            w = (w * 99) // 100
        assert rows[2].decayed_fp == w == 970_299


class TestGroupMode:
    def test_tie_goes_to_smallest_value(self, spark, tmp_path):
        # values 1.0 x2 and 2.0 x2 tie; mode must be the smaller (1.0)
        d = _write(
            tmp_path,
            "events",
            [
                _ev(1, 0, "A", 1.0), _ev(2, 1, "A", 1.0),
                _ev(3, 2, "A", 2.0), _ev(4, 3, "A", 2.0),
                _ev(5, 4, "A", 3.0),
            ],
        )
        [r] = REG["q181_group_mode"].spark(spark, d).collect()
        assert r.mode_fp == 10_000
        assert r.mode_count == 2
        assert r.n_distinct == 3
