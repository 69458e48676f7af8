"""Semantics tests for the round-10 part-2 queries (queries_ext17):
peak concurrency on constructed session layouts (incl. overnight
carry and simultaneous start/end netting), rolling 7-day distinct on
hand-enumerable activity patterns, and CUPED against a literal Python
replay of the integer formulas."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
from pyspark.sql import Row

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


def _ev(eid, ts, user=1, value=10.0):
    return Row(
        event_id=eid, ts=ts, user_id=user,
        event_type="view", value=float(value), props="{}",
    )


def _day(d):
    return (dt.date(2024, 1, d) - dt.date(2024, 1, 1)).days


class TestPeakConcurrency:
    def test_two_overlapping_users_peak_two(self, spark, tmp_path):
        # u1 session [10:00, 10:40), u2 [10:20, 10:50): overlap 10:20-10:40
        rows = [
            _ev(1, dt.datetime(2024, 1, 5, 10, 0), user=1),
            _ev(2, dt.datetime(2024, 1, 5, 10, 10), user=1),
            _ev(3, dt.datetime(2024, 1, 5, 10, 20), user=2),
        ]
        sf = _write(tmp_path, "events", rows)
        got = {
            r.day: r.peak_concurrent
            for r in REG["q190_peak_concurrency"].spark(spark, sf).collect()
        }
        assert got == {_day(5): 2}

    def test_overnight_session_counts_for_next_day_peak(self, spark, tmp_path):
        # u1 event 23:50 -> session [23:50, 00:20 next day). Day 6 has a
        # single change point (the end, conc 0) but the day-START
        # baseline is 1 — the peak must be 1, not 0.
        rows = [_ev(1, dt.datetime(2024, 1, 5, 23, 50), user=1)]
        sf = _write(tmp_path, "events", rows)
        got = {
            r.day: (r.peak_concurrent, r.n_change_points)
            for r in REG["q190_peak_concurrency"].spark(spark, sf).collect()
        }
        assert got == {_day(5): (1, 1), _day(6): (1, 1)}

    def test_simultaneous_start_and_end_net_to_zero(self, spark, tmp_path):
        # u1 [10:00, 10:30); u2 starts exactly at 10:30. Netting at
        # 10:30 means the -1 and +1 cancel: concurrency never exceeds 1.
        rows = [
            _ev(1, dt.datetime(2024, 1, 5, 10, 0), user=1),
            _ev(2, dt.datetime(2024, 1, 5, 10, 30), user=2),
        ]
        sf = _write(tmp_path, "events", rows)
        got = {
            r.day: r.peak_concurrent
            for r in REG["q190_peak_concurrency"].spark(spark, sf).collect()
        }
        assert got == {_day(5): 1}

    def test_gap_splits_sessions_no_overlap(self, spark, tmp_path):
        # Same user, events 60 min apart: two disjoint sessions, peak 1.
        rows = [
            _ev(1, dt.datetime(2024, 1, 5, 10, 0), user=1),
            _ev(2, dt.datetime(2024, 1, 5, 11, 0), user=1),
        ]
        sf = _write(tmp_path, "events", rows)
        got = {
            r.day: (r.peak_concurrent, r.n_change_points)
            for r in REG["q190_peak_concurrency"].spark(spark, sf).collect()
        }
        # four distinct instants: s1 +1, e1 -1, s2 +1, e2 -1
        assert got == {_day(5): (1, 4)}


class TestRollingDistinctUsers:
    def test_window_covers_and_trims(self, spark, tmp_path):
        # u1 active day 1; u2 active day 5. u1 covers days 1-7, u2 5-11
        # but the span is trimmed at the last ACTIVE day (5).
        rows = [
            _ev(1, dt.datetime(2024, 1, 1, 9, 0), user=1),
            _ev(2, dt.datetime(2024, 1, 5, 9, 0), user=2),
        ]
        sf = _write(tmp_path, "events", rows)
        got = {
            r.day: (r.distinct_users_7d, r.distinct_users_today)
            for r in REG["q191_rolling_distinct_users"].spark(spark, sf).collect()
        }
        assert got == {
            _day(1): (1, 1),
            _day(2): (1, 0),
            _day(3): (1, 0),
            _day(4): (1, 0),
            _day(5): (2, 1),
        }

    def test_multiple_events_one_user_count_once(self, spark, tmp_path):
        rows = [
            _ev(1, dt.datetime(2024, 1, 3, 9, 0), user=7),
            _ev(2, dt.datetime(2024, 1, 3, 10, 0), user=7),
            _ev(3, dt.datetime(2024, 1, 3, 11, 0), user=7),
        ]
        sf = _write(tmp_path, "events", rows)
        got = {
            r.day: (r.distinct_users_7d, r.distinct_users_today)
            for r in REG["q191_rolling_distinct_users"].spark(spark, sf).collect()
        }
        assert got == {_day(3): (1, 1)}


def _lcg_arm(uid: int) -> int:
    return (((uid % 2**31) * 1103515245 + 12345) % 2**31) % 2


def _tdiv(n: int, d: int):
    if d == 0:
        return None
    return -((-n) // d) if n < 0 else n // d


class TestCupedLift:
    def test_matches_literal_integer_replay(self, spark, tmp_path):
        # A few users with spend in both halves of the month; expected
        # output computed by replaying the exact integer formulas.
        # dollar values large enough that the staged denominator
        # (n*Sxx - Sx^2) DIV 1e6 is non-zero (the q185 staged-scaling
        # small-input caveat, documented in the query doc)
        users = {11: (12050.5, 20000.0), 12: (8025.25, 6075.0),
                 13: (1000.0, 9000.0), 14: (30000.0, 31050.5),
                 15: (0.0, 4500.0)}
        rows, eid = [], 0
        for uid, (pre, post) in users.items():
            eid += 1
            rows.append(_ev(eid, dt.datetime(2024, 1, 10, 9, 0), user=uid, value=pre))
            eid += 1
            rows.append(_ev(eid, dt.datetime(2024, 1, 20, 9, 0), user=uid, value=post))
        sf = _write(tmp_path, "events", rows)
        got = REG["q192_cuped_lift"].spark(spark, sf).collect()[0]

        ud = {
            uid: (_lcg_arm(uid),
                  int(round(pre * 100)) // 100,
                  int(round(post * 100)) // 100)
            for uid, (pre, post) in users.items()
        }
        n = len(ud)
        sx = sum(x for _, x, _ in ud.values())
        sy = sum(y for _, _, y in ud.values())
        sxx = sum(x * x for _, x, _ in ud.values())
        sxy = sum(x * y for _, x, y in ud.values())
        theta = _tdiv(n * sxy - sx * sy, (n * sxx - sx * sx) // 1000000)
        xbar = _tdiv(sx, n)
        sums = {0: [0, 0], 1: [0, 0]}
        for arm, x, y in ud.values():
            sums[arm][0] += y * 1000000 - theta * (x - xbar)
            sums[arm][1] += 1
        mean_a = _tdiv(sums[0][0], sums[0][1])
        mean_b = _tdiv(sums[1][0], sums[1][1])
        assert got.theta_ppm == theta
        assert (got.n_users_a, got.n_users_b) == (sums[0][1], sums[1][1])
        assert got.mean_adj_a_mic == mean_a
        assert got.mean_adj_b_mic == mean_b
        assert got.lift_mic == mean_b - mean_a

    def test_zero_variance_pre_period_null_theta(self, spark, tmp_path):
        # identical x for every user -> var(x)=0 -> theta NULL -> means NULL
        rows = [
            _ev(1, dt.datetime(2024, 1, 10, 9, 0), user=21, value=50.0),
            _ev(2, dt.datetime(2024, 1, 20, 9, 0), user=21, value=70.0),
            _ev(3, dt.datetime(2024, 1, 10, 9, 0), user=22, value=50.0),
            _ev(4, dt.datetime(2024, 1, 20, 9, 0), user=22, value=90.0),
        ]
        sf = _write(tmp_path, "events", rows)
        got = REG["q192_cuped_lift"].spark(spark, sf).collect()[0]
        assert got.theta_ppm is None
