"""Semantics tests for the round-8 session-4 queries (queries_ext10):
hand-computed fixtures for the sweep-line peak (half-open intervals,
cross-hour-bucket offsets), the Benford digit table, the int8
round-trip error, the weighted median's boundary-bucket selection, the
skyline dominance cases, and the DF-drift rate arithmetic."""

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


def _ev(eid, h, m, etype="view", user=1):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, 5, h, m, 0),
        user_id=user,
        event_type=etype,
        value=1.0,
        props="{}",
    )


class TestPeakConcurrency:
    def test_three_overlapping_sessions(self, spark, tmp_path):
        d = _write(tmp_path, "events", [_ev(1, 10, 0), _ev(2, 10, 10), _ev(3, 10, 20)])
        [r] = REG["q159_peak_concurrency"].spark(spark, d).collect()
        assert r.peak_concurrency == 3
        assert r.peak_ts == dt.datetime(2024, 1, 5, 10, 20)

    def test_half_open_boundary_does_not_overlap(self, spark, tmp_path):
        # second session starts exactly when the first's 30 min expire:
        # [10:00, 10:30) and [10:30, 11:00) never coexist
        d = _write(tmp_path, "events", [_ev(1, 10, 0), _ev(2, 10, 30)])
        [r] = REG["q159_peak_concurrency"].spark(spark, d).collect()
        assert r.peak_concurrency == 1
        assert r.peak_ts == dt.datetime(2024, 1, 5, 10, 0)

    def test_overlap_across_hour_buckets(self, spark, tmp_path):
        # starts in different hour buckets; overlap peaks in the second —
        # exercises the exclusive-prefix bucket offset
        d = _write(tmp_path, "events", [_ev(1, 9, 50), _ev(2, 10, 5)])
        [r] = REG["q159_peak_concurrency"].spark(spark, d).collect()
        assert r.peak_concurrency == 2
        assert r.peak_ts == dt.datetime(2024, 1, 5, 10, 5)

    def test_types_counted_independently(self, spark, tmp_path):
        d = _write(
            tmp_path,
            "events",
            [_ev(1, 10, 0, "view"), _ev(2, 10, 1, "view"), _ev(3, 10, 2, "click")],
        )
        out = {
            r.event_type: r.peak_concurrency
            for r in REG["q159_peak_concurrency"].spark(spark, d).collect()
        }
        assert out == {"view": 2, "click": 1}


def _order(key, price):
    return Row(
        o_orderkey=key,
        o_custkey=1,
        o_orderstatus="F",
        o_totalprice=price,
        o_orderdate=dt.datetime(1995, 6, 1),
        o_orderpriority="1-URGENT",
    )


class TestBenfordAudit:
    def test_digit_counts_and_ppm(self, spark, tmp_path):
        d = _write(
            tmp_path, "orders", [_order(1, 1.00), _order(2, 25.00), _order(3, 123.45)]
        )
        rows = {r.digit: r for r in REG["q160_benford_audit"].spark(spark, d).collect()}
        assert set(rows) == {1, 2}
        # digit 1: cents 100 and 12345 -> 2 of 3
        assert rows[1].n == 2
        assert rows[1].observed_ppm == 666666
        # floor(log10(2) * 1e6)
        assert rows[1].benford_ppm == 301029
        assert rows[1].dev_ppm == 666666 - 301029
        assert rows[2].n == 1
        assert rows[2].observed_ppm == 333333

    def test_benford_expectations_sum_to_one(self, spark, tmp_path):
        # all nine digits present: expectation column covers ~1e6 ppm
        d = _write(
            tmp_path, "orders", [_order(i, float(i)) for i in range(1, 10)]
        )
        rows = REG["q160_benford_audit"].spark(spark, d).collect()
        total = sum(r.benford_ppm for r in rows)
        assert len(rows) == 9
        assert 999990 <= total <= 1000000  # nine floors lose < 9 ppm


def _vec(vid, emb, label=0):
    return Row(vec_id=vid, embedding=emb, label=label)


class TestInt8Quantization:
    def test_round_trip_error_hand_computed(self, spark, tmp_path):
        # q = [10000, 5000]: 10000 -> code 127 -> exact; 5000 -> code 63
        # -> recon 4960 -> err 40 -> sse 1600
        d = _write(tmp_path, "embeddings", [_vec(1, [1.0, 0.5])])
        [r] = REG["q161_int8_quantization"].spark(spark, d).collect()
        assert (r.n_vecs, r.sum_sse, r.max_sse) == (1, 1600, 1600)

    def test_negative_components_symmetric(self, spark, tmp_path):
        # mirrored vector must carry the identical error mass
        d = _write(tmp_path, "embeddings", [_vec(1, [-0.5, 1.0])])
        [r] = REG["q161_int8_quantization"].spark(spark, d).collect()
        assert r.sum_sse == 1600

    def test_zero_vector_excluded(self, spark, tmp_path):
        d = _write(
            tmp_path, "embeddings", [_vec(1, [0.0, 0.0]), _vec(2, [1.0, 1.0], label=3)]
        )
        rows = REG["q161_int8_quantization"].spark(spark, d).collect()
        assert [(r.label, r.n_vecs, r.sum_sse) for r in rows] == [(3, 1, 0)]


def _li(okey, flag, price, qty):
    return Row(
        l_orderkey=okey,
        l_partkey=1,
        l_suppkey=1,
        l_linenumber=1,
        l_quantity=float(qty),
        l_extendedprice=price,
        l_discount=0.0,
        l_tax=0.0,
        l_returnflag=flag,
        l_linestatus="O",
        l_shipdate=dt.datetime(1995, 6, 1),
    )


class TestWeightedMedian:
    def test_unweighted_median_is_middle(self, spark, tmp_path):
        d = _write(
            tmp_path,
            "lineitem",
            [_li(1, "A", 1.00, 1), _li(2, "A", 2.00, 1), _li(3, "A", 3.00, 1)],
        )
        [r] = REG["q162_weighted_median"].spark(spark, d).collect()
        assert (r.total_weight, r.median_cents) == (3, 200)

    def test_weight_drags_median_down(self, spark, tmp_path):
        # price 1.00 holds 3 of 4 weight units -> it is the median
        d = _write(
            tmp_path, "lineitem", [_li(1, "A", 1.00, 3), _li(2, "A", 100.00, 1)]
        )
        [r] = REG["q162_weighted_median"].spark(spark, d).collect()
        assert (r.total_weight, r.median_cents) == (4, 100)

    def test_median_crosses_bucket_boundary(self, spark, tmp_path):
        # bucket width is 100000 cents: these three prices land in
        # buckets 0, 1 and 2 — the boundary-bucket offset must place the
        # median at the middle price, not the first bucket's
        d = _write(
            tmp_path,
            "lineitem",
            [_li(1, "A", 500.00, 1), _li(2, "A", 1500.00, 1), _li(3, "A", 2500.00, 1)],
        )
        [r] = REG["q162_weighted_median"].spark(spark, d).collect()
        assert (r.total_weight, r.median_cents) == (3, 150000)

    def test_groups_independent(self, spark, tmp_path):
        d = _write(
            tmp_path,
            "lineitem",
            [_li(1, "A", 1.00, 1), _li(2, "R", 9.00, 1)],
        )
        out = {
            r.l_returnflag: r.median_cents
            for r in REG["q162_weighted_median"].spark(spark, d).collect()
        }
        assert out == {"A": 100, "R": 900}


def _part(key, size, price):
    return Row(
        p_partkey=key,
        p_name="p",
        p_brand="B",
        p_type="T",
        p_size=size,
        p_retailprice=price,
    )


class TestParetoFrontier:
    def test_dominated_point_dropped(self, spark, tmp_path):
        d = _write(
            tmp_path,
            "part",
            [_part(1, 1, 10.00), _part(2, 2, 5.00), _part(3, 3, 7.00)],
        )
        rows = REG["q163_pareto_frontier"].spark(spark, d).collect()
        assert sorted((r.p_size, r.price_cents) for r in rows) == [(2, 500), (3, 700)]

    def test_equal_price_larger_size_dominates(self, spark, tmp_path):
        d = _write(tmp_path, "part", [_part(1, 1, 5.00), _part(2, 2, 5.00)])
        rows = REG["q163_pareto_frontier"].spark(spark, d).collect()
        assert [(r.p_size, r.price_cents) for r in rows] == [(2, 500)]

    def test_exact_duplicates_both_survive(self, spark, tmp_path):
        # neither identical part strictly dominates the other
        d = _write(tmp_path, "part", [_part(1, 2, 5.00), _part(2, 2, 5.00)])
        [r] = REG["q163_pareto_frontier"].spark(spark, d).collect()
        assert (r.p_size, r.price_cents, r.n_parts) == (2, 500, 2)


def _doc(did, text):
    return Row(doc_id=did, text=text, lang="en", source="s", n_chars=len(text))


class TestDfDrift:
    def test_rates_and_drift(self, spark, tmp_path):
        # "drift" in all 4 even docs, 1 of 4 odd docs (combined df 5
        # passes the min-df gate); filler words stay below it
        rows = [_doc(i, "drift common" if i % 2 == 0 else "other") for i in range(8)]
        rows[1] = _doc(1, "drift here")
        d = _write(tmp_path, "documents", rows)
        out = {r.word: r for r in REG["q164_df_drift"].spark(spark, d).collect()}
        assert "drift" in out
        r = out["drift"]
        assert (r.df_a, r.df_b) == (4, 1)
        assert (r.rate_a_ppm, r.rate_b_ppm) == (1000000, 250000)
        assert r.drift_ppm == 750000

    def test_word_counted_once_per_doc(self, spark, tmp_path):
        # repetition inside a doc must not inflate document frequency
        rows = [_doc(i, "echo echo echo echo") for i in range(10)]
        d = _write(tmp_path, "documents", rows)
        out = {r.word: r for r in REG["q164_df_drift"].spark(spark, d).collect()}
        assert (out["echo"].df_a, out["echo"].df_b) == (5, 5)
        assert out["echo"].drift_ppm == 0


class TestGapFillInterp:
    def test_linear_interior_holes(self, spark, tmp_path):
        # observed 10.00 on day 1 and 16.00 on day 4: holes get the line
        rows = [
            Row(event_id=1, ts=dt.datetime(2024, 1, 1, 10, 0), user_id=1,
                event_type="view", value=10.0, props="{}"),
            Row(event_id=2, ts=dt.datetime(2024, 1, 4, 10, 0), user_id=1,
                event_type="view", value=16.0, props="{}"),
        ]
        d = _write(tmp_path, "events", rows)
        out = {
            r.day.day: (r.value_fp, r.is_filled)
            for r in REG["q165_gap_fill_interp"].spark(spark, d).collect()
        }
        assert out == {
            1: (100000, False),
            2: (120000, True),
            3: (140000, True),
            4: (160000, False),
        }

    def test_truncating_step_and_negative_slope(self, spark, tmp_path):
        # 10.01 -> 10.00 over 2 days: num = -100, step = -(100 DIV 2) = -50
        rows = [
            Row(event_id=1, ts=dt.datetime(2024, 1, 1, 10, 0), user_id=1,
                event_type="view", value=10.01, props="{}"),
            Row(event_id=2, ts=dt.datetime(2024, 1, 3, 10, 0), user_id=1,
                event_type="view", value=10.00, props="{}"),
        ]
        d = _write(tmp_path, "events", rows)
        out = {
            r.day.day: r.value_fp
            for r in REG["q165_gap_fill_interp"].spark(spark, d).collect()
        }
        assert out == {1: 100100, 2: 100050, 3: 100000}

    def test_last_tick_of_day_wins(self, spark, tmp_path):
        rows = [
            Row(event_id=1, ts=dt.datetime(2024, 1, 1, 9, 0), user_id=1,
                event_type="view", value=5.0, props="{}"),
            Row(event_id=2, ts=dt.datetime(2024, 1, 1, 17, 0), user_id=1,
                event_type="view", value=7.0, props="{}"),
        ]
        d = _write(tmp_path, "events", rows)
        [r] = REG["q165_gap_fill_interp"].spark(spark, d).collect()
        assert (r.value_fp, r.is_filled) == (70000, False)


class TestVocabGrowth:
    def test_shingle_charged_to_first_decile(self, spark, tmp_path):
        # 10 docs = 10 deciles; doc 5 repeats doc 0's text, so decile 5
        # introduces nothing and is absent from the per-decile rows
        rows = [_doc(i, f"a{i} b{i} c{i}") for i in range(10)]
        rows[5] = _doc(5, "a0 b0 c0")
        d = _write(tmp_path, "documents", rows)
        out = {
            r.decile: (r.n_new_shingles, r.cum_shingles)
            for r in REG["q166_vocab_growth"].spark(spark, d).collect()
        }
        assert 5 not in out
        assert out[0] == (1, 1)
        assert out[9] == (1, 9)
        assert len(out) == 9

    def test_cumulative_is_total_distinct(self, spark, tmp_path):
        rows = [_doc(i, "w1 w2 w3 w4") for i in range(10)]  # 2 shingles, all shared
        d = _write(tmp_path, "documents", rows)
        out = sorted(
            (r.decile, r.n_new_shingles, r.cum_shingles)
            for r in REG["q166_vocab_growth"].spark(spark, d).collect()
        )
        assert out == [(0, 2, 2)]
