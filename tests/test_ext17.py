"""Semantics tests for the round-10 part-2 query (queries_ext17):
CUPED against a literal Python replay of the integer formulas."""

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
