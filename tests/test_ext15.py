"""Semantics tests for the round-9 session-5d queries (queries_ext15):
a hand-computed regression line, the zero-variance NULL guard, and the
centroid-distance outlier ranking on constructed vectors."""

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


def _ev(eid, day, value, user=1):
    return Row(
        event_id=eid, ts=dt.datetime(2024, 1, day, 12, 0),
        user_id=user, event_type="view", value=float(value), props="{}",
    )


class TestPerKeyTrend:
    def test_exact_line_slope(self, spark, tmp_path):
        # y = 2.0 * x + 1.0 on days 1..4 -> slope 2.0/day = 20000 fp
        # units/day = 20_000_000 in thousandths
        d = _write(
            tmp_path, "events",
            [_ev(i, i + 1, 1.0 + 2.0 * i) for i in range(4)],
        )
        [r] = REG["q182_per_key_trend"].spark(spark, d).collect()
        assert r.n == 4
        assert r.slope_fp == 20_000 * 1000

    def test_single_day_user_gets_null(self, spark, tmp_path):
        d = _write(
            tmp_path, "events",
            [_ev(1, 5, 1.0), _ev(2, 5, 9.0)],  # both on day 5
        )
        [r] = REG["q182_per_key_trend"].spark(spark, d).collect()
        assert r.slope_fp is None

    def test_negative_slope_truncates_symmetrically(self, spark, tmp_path):
        # y decreasing: slope exactly -1 value/day -> -10_000_000
        d = _write(
            tmp_path, "events",
            [_ev(i, i + 1, 10.0 - 1.0 * i) for i in range(3)],
        )
        [r] = REG["q182_per_key_trend"].spark(spark, d).collect()
        assert r.slope_fp == -10_000 * 1000


class TestEmbeddingOutliers:
    def test_planted_outlier_ranks_first(self, spark, tmp_path):
        base = [0.1] * 8
        rows = [
            Row(vec_id=i, embedding=base, label=1) for i in range(1, 5)
        ] + [Row(vec_id=99, embedding=[0.9] * 8, label=1)]
        d = _write(tmp_path, "embeddings", rows)
        got = REG["q183_embedding_outliers"].spark(spark, d).collect()
        assert got[0].vec_id == 99
        # centroid coord = (4*1000 + 9000) // 5 = 2600; outlier diff
        # 9000-2600=6400 per dim -> 8 * 6400^2
        assert got[0].dist2 == 8 * 6400 * 6400
        # the identical base vectors tie at 8 * (1000-2600)^2, vec_id asc
        assert [r.vec_id for r in got[1:]] == [1, 2, 3, 4]
        assert all(r.dist2 == 8 * 1600 * 1600 for r in got[1:])

    def test_labels_isolated(self, spark, tmp_path):
        rows = [
            Row(vec_id=1, embedding=[0.0, 0.0], label=1),
            Row(vec_id=2, embedding=[0.0, 0.0], label=1),
            Row(vec_id=3, embedding=[0.9, 0.9], label=2),
            Row(vec_id=4, embedding=[0.9, 0.9], label=2),
        ]
        d = _write(tmp_path, "embeddings", rows)
        got = REG["q183_embedding_outliers"].spark(spark, d).collect()
        # each label's members sit ON their centroid: all distances 0
        assert all(r.dist2 == 0 for r in got)
        assert len(got) == 4
