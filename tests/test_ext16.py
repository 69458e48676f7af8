"""Semantics tests for the round-10 queries (queries_ext16): greedy
max-coverage on constructed set systems, Theil-Sen medians against
hand-computed pairwise slopes, and the deterministic Poisson bootstrap
against a literal Python replay of the LCG-weight recursion."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
from pyspark.sql import Row

from e2e_stock_data_pipeline_spark.operators.coverage import greedy_max_coverage
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _write(tmp_path, table, rows) -> str:
    d = str(tmp_path)
    pd.DataFrame([r.asDict() if isinstance(r, Row) else r for r in rows]).to_parquet(
        os.path.join(d, f"{table}.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return d


class TestGreedyMaxCoverage:
    def _pairs(self, spark, sets: dict[int, list[int]]):
        rows = [Row(s=k, i=i) for k, items in sets.items() for i in items]
        return spark.createDataFrame(rows)

    def test_greedy_order_and_marginal_gains(self, spark):
        # A covers 4, B covers 3 (2 overlap A), C covers 2 fresh.
        # Greedy: A(4), then C(2) beats B's marginal 1, then B(1).
        got = greedy_max_coverage(
            self._pairs(
                spark, {1: [10, 11, 12, 13], 2: [12, 13, 20], 3: [30, 31]}
            ),
            "s",
            "i",
            k=5,
        ).orderBy("pick_order").collect()
        assert [(r.s, r.new_items, r.covered_total) for r in got] == [
            (1, 4, 4),
            (3, 2, 6),
            (2, 1, 7),
        ]

    def test_tie_breaks_on_smallest_set_key(self, spark):
        got = greedy_max_coverage(
            self._pairs(spark, {7: [1, 2], 3: [3, 4], 5: [5, 6]}),
            "s",
            "i",
            k=1,
        ).collect()
        assert [(r.pick_order, r.s) for r in got] == [(1, 3)]

    def test_zero_gain_sets_never_picked(self, spark):
        # B is a subset of A: after A there is nothing left to gain.
        got = greedy_max_coverage(
            self._pairs(spark, {1: [10, 11], 2: [10]}), "s", "i", k=3
        ).collect()
        assert len(got) == 1 and got[0].s == 1

    def test_duplicate_pairs_count_once(self, spark):
        rows = [Row(s=1, i=10), Row(s=1, i=10), Row(s=1, i=11)]
        got = greedy_max_coverage(
            spark.createDataFrame(rows), "s", "i", k=1
        ).collect()
        assert got[0].new_items == 2


def _ev(eid, day, value, user=1):
    return Row(
        event_id=eid, ts=dt.datetime(2024, 1, day, 12, 0),
        user_id=user, event_type="view", value=float(value), props="{}",
    )


class TestTheilSen:
    def test_exact_line_gives_slope(self, spark, tmp_path):
        # daily totals 100,200,300,400,500 cents on days 1..5:
        # every pairwise slope is exactly 10000 cents-ppm... wait:
        # slope = dv*1e6/dd = 100*1e6/1 = 1e8 ppm for adjacent days.
        d = _write(tmp_path, "events", [_ev(i, i + 1, (i + 1) * 1.0) for i in range(5)])
        [r] = REG["q188_theilsen_trend"].spark(spark, d).collect()
        assert r.n_days == 5
        assert r.n_pairs == 10
        assert r.theilsen_ppm == 100 * 1_000_000

    def test_median_resists_outlier_day(self, spark, tmp_path):
        # days 1..4 linear (+100 cents/day) plus day 20 spike 100x:
        # most pairwise slopes stay near 100/day; OLS would not.
        rows = [_ev(i, i + 1, (i + 1) * 1.0) for i in range(4)]
        rows.append(_ev(9, 20, 400.0))
        d = _write(tmp_path, "events", rows)
        [r] = REG["q188_theilsen_trend"].spark(spark, d).collect()
        vals = {1: 100, 2: 200, 3: 300, 4: 400, 20: 40000}
        days = sorted(vals)
        slopes = sorted(
            (vals[b] - vals[a]) * 1_000_000 // (b - a)
            for idx, a in enumerate(days)
            for b in days[idx + 1:]
        )
        n = len(slopes)
        expect = (slopes[n // 2 - 1] + slopes[n // 2]) // 2 if n % 2 == 0 else slopes[n // 2]
        assert r.n_pairs == n
        assert r.theilsen_ppm == expect

    def test_min_days_filter(self, spark, tmp_path):
        d = _write(tmp_path, "events", [_ev(i, i + 1, 1.0) for i in range(4)])
        assert REG["q188_theilsen_trend"].spark(spark, d).count() == 0

    def test_same_day_events_aggregate_first(self, spark, tmp_path):
        # two events on each day must collapse to one daily point:
        # C(5,2)=10 pairs, not C(10,2).
        rows = [_ev(2 * i + j, i + 1, 0.5, user=1) for i in range(5) for j in range(2)]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q188_theilsen_trend"].spark(spark, d).collect()
        assert r.n_days == 5 and r.n_pairs == 10 and r.theilsen_ppm == 0


def _lcg_pois(x: int) -> int:
    POIS = (367879, 735759, 919699, 981012, 996340, 999406, 999917)
    u = ((x % 2**31) * 1103515245 + 12345) % 2**31 % 1_000_000
    for k, p in enumerate(POIS):
        if u < p:
            return k
    return 7


class TestBootstrapCI:
    def _tables(self, tmp_path, orders):
        _write(tmp_path, "orders", orders)
        _write(
            tmp_path,
            "customer",
            [
                Row(c_custkey=c, c_name="x", c_nationkey=1, c_acctbal=0.0,
                    c_mktsegment=seg)
                for c, seg in [(1, "A"), (2, "A"), (3, "B")]
            ],
        )
        return str(tmp_path)

    def _order(self, key, cust, price):
        return Row(
            o_orderkey=key, o_custkey=cust, o_orderstatus="F",
            o_totalprice=float(price),
            o_orderdate=dt.datetime(2024, 1, 1), o_orderpriority="1",
        )

    def test_matches_python_replay(self, spark, tmp_path):
        orders = [self._order(k, 1 + (k % 2), 10.0 + k) for k in range(1, 21)]
        orders += [self._order(k, 3, 5.0 * k) for k in range(21, 31)]
        d = self._tables(tmp_path, orders)
        got = {r.segment: r for r in REG["q189_bootstrap_ci"].spark(spark, d).collect()}
        # literal replay of the documented construction
        by_seg: dict[str, list[tuple[int, int]]] = {}
        seg_of = {1: "A", 2: "A", 3: "B"}
        for o in orders:
            by_seg.setdefault(seg_of[o.o_custkey], []).append(
                (o.o_orderkey, int(o.o_totalprice * 100))
            )
        for seg, rows in by_seg.items():
            means = []
            for b in range(1, 41):
                sw = sum(_lcg_pois(k * 40 + b) * v for k, v in rows)
                nw = sum(_lcg_pois(k * 40 + b) for k, v in rows)
                if nw > 0:
                    means.append(sw // nw)
            means.sort()
            r = got[seg]
            assert r.n_orders == len(rows)
            assert r.mean_cents == sum(v for _, v in rows) // len(rows)
            assert r.n_reps == len(means)
            assert r.boot_lo_cents == means[1]
            assert r.boot_hi_cents == means[-2]

    def test_point_mass_has_degenerate_ci(self, spark, tmp_path):
        # all orders identical value: every replicate mean is that value
        d = self._tables(tmp_path, [self._order(k, 1, 42.0) for k in range(1, 31)])
        [r] = REG["q189_bootstrap_ci"].spark(spark, d).collect()
        assert r.mean_cents == 4200
        assert r.boot_lo_cents == 4200 and r.boot_hi_cents == 4200
