"""Semantics tests for the round-9 session-5b queries (queries_ext13):
hand-computed triple supports, exact decile edges on 1..100, the
square-graph Jaccard case, and a worked Hamilton apportionment."""

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


def _li(okey, pkey):
    return Row(
        l_orderkey=okey, l_partkey=pkey, l_suppkey=1, l_linenumber=1,
        l_quantity=1.0, l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
        l_returnflag="N", l_linestatus="O",
        l_shipdate=dt.datetime(2024, 1, 5),
    )


def _ev(eid, minute, value):
    return Row(
        event_id=eid, ts=dt.datetime(2024, 1, 5, 10, minute % 60, minute // 60),
        user_id=1, event_type="view", value=float(value), props="{}",
    )


def _doc(did, lang):
    return Row(doc_id=did, text="x", lang=lang, source="s", n_chars=1)


class TestFrequentTriples:
    def test_support_counts_and_order(self, spark, tmp_path):
        rows = []
        # orders 1-3 all contain {1,2,3}; orders 1-2 additionally 4
        for k in (101, 102, 103):
            rows += [_li(k, 1), _li(k, 2), _li(k, 3)]
        rows += [_li(101, 4), _li(102, 4)]
        d = _write(tmp_path, "lineitem", rows)
        got = [
            (r.pa, r.pb, r.pc, r.n_orders)
            for r in REG["q175_frequent_triples"].spark(spark, d).collect()
        ]
        # (1,2,3) support 3 first; the four triples containing part 4
        # each have support 2, ordered lexicographically
        assert got[0] == (1, 2, 3, 3)
        assert set(got[1:]) == {
            (1, 2, 4, 2), (1, 3, 4, 2), (2, 3, 4, 2),
        }

    def test_duplicate_lines_counted_once(self, spark, tmp_path):
        rows = [_li(101, 1), _li(101, 1), _li(101, 2), _li(101, 3),
                _li(102, 1), _li(102, 2), _li(102, 3)]
        d = _write(tmp_path, "lineitem", rows)
        got = [
            (r.pa, r.pb, r.pc, r.n_orders)
            for r in REG["q175_frequent_triples"].spark(spark, d).collect()
        ]
        assert got == [(1, 2, 3, 2)]


class TestEquiDepthBins:
    def test_values_1_to_100(self, spark, tmp_path):
        d = _write(tmp_path, "events", [_ev(i, i, i) for i in range(1, 101)])
        rows = {r.bin: r for r in REG["q176_equi_depth_bins"].spark(spark, d).collect()}
        assert sorted(rows) == list(range(1, 11))
        for b in range(1, 11):
            assert rows[b].n_rows == 10
            assert rows[b].lo_fp == ((b - 1) * 10 + 1) * 10_000
            assert rows[b].hi_fp == b * 10 * 10_000


class TestNeighborJaccard:
    def test_square_graph_diagonals(self, spark, tmp_path):
        # square 1-2-3-4-1, every edge in two orders
        rows = []
        k = 100
        for (a, b) in [(1, 2), (2, 3), (3, 4), (1, 4)]:
            for _ in range(2):
                k += 1
                rows += [_li(k, a), _li(k, b)]
        d = _write(tmp_path, "lineitem", rows)
        got = {
            (r.pa, r.pb): (r.n_common, r.jaccard_fp)
            for r in REG["q177_neighbor_jaccard"].spark(spark, d).collect()
        }
        # diagonals share BOTH neighbors: jaccard 2/2 = 1.0
        assert got[(1, 3)] == (2, 1_000_000)
        assert got[(2, 4)] == (2, 1_000_000)
        # adjacent pairs share no neighbor -> never emitted
        assert (1, 2) not in got and (3, 4) not in got
        assert len(got) == 2


class TestHamiltonAllocation:
    def test_worked_example(self, spark, tmp_path):
        docs = (
            [_doc(i, "aa") for i in range(3)]
            + [_doc(10 + i, "bb") for i in range(3)]
            + [_doc(20, "cc")]
        )
        d = _write(tmp_path, "documents", docs)
        rows = {r.lang: r for r in REG["q178_strat_allocation"].spark(spark, d).collect()}
        # total 7 docs, budget 10000: aa/bb floor 4285 r5, cc floor 1428 r4
        assert rows["aa"].floor_alloc == 4285 and rows["aa"].remainder == 5
        assert rows["bb"].floor_alloc == 4285 and rows["bb"].remainder == 5
        assert rows["cc"].floor_alloc == 1428 and rows["cc"].remainder == 4
        # leftover 2 -> the two largest remainders (aa, bb) get +1
        assert rows["aa"].alloc == 4286
        assert rows["bb"].alloc == 4286
        assert rows["cc"].alloc == 1428
        assert sum(r.alloc for r in rows.values()) == 10_000

    def test_sum_equals_budget_on_real_data(self, spark, sf_dir):
        rows = REG["q178_strat_allocation"].spark(spark, sf_dir).collect()
        assert sum(r.alloc for r in rows) == 10_000
