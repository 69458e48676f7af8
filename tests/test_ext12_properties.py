"""Semantic properties of the session-5 operators (q169-q174) that the
oracle's value-hash equality cannot express: the degree-oriented
triangle census vs a brute-force all-triples count on random graphs,
Markov row-probability invariants, the winsorized/trimmed ordering
relations, CUSUM's closed prefix form vs the literal recursion under
randomized series, and the same-source as-of variant's scan-count
claim."""

from __future__ import annotations

import itertools
import random

import pandas as pd
from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


class TestTriangleCensusVsBruteForce:
    def _census_from_edges(self, spark, tmp_path, edges):
        """Build a lineitem fixture whose co-purchase graph IS `edges`
        (each edge gets two dedicated orders), then run q170."""
        rows = []
        okey = itertools.count(1)
        for (a, b) in edges:
            for _ in range(2):  # two shared orders -> passes n >= 2
                k = next(okey)
                rows.append(dict(l_orderkey=k, l_partkey=a))
                rows.append(dict(l_orderkey=k, l_partkey=b))
        df = pd.DataFrame(rows)
        for c, v in [
            ("l_suppkey", 1), ("l_linenumber", 1), ("l_quantity", 1.0),
            ("l_extendedprice", 1.0), ("l_discount", 0.0), ("l_tax", 0.0),
            ("l_returnflag", "N"), ("l_linestatus", "O"),
        ]:
            df[c] = v
        df["l_shipdate"] = pd.Timestamp("2024-01-05")
        df.to_parquet(f"{tmp_path}/lineitem.parquet", coerce_timestamps="us")
        [r] = REG["q170_triangle_census"].spark(spark, str(tmp_path)).collect()
        return r

    def _brute(self, edges):
        es = set(map(tuple, (sorted(e) for e in edges)))
        nodes = sorted({x for e in es for x in e})
        tri = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in es and (b, c) in es and (a, c) in es
        )
        deg = {n: sum(1 for e in es if n in e) for n in nodes}
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        return len(nodes), len(es), wedges, tri

    def test_random_graphs_match_brute_force(self, spark, tmp_path):
        rng = random.Random(42)
        for trial in range(3):
            n = 12
            edges = {
                tuple(sorted(rng.sample(range(1, n + 1), 2)))
                for _ in range(rng.randint(8, 20))
            }
            d = tmp_path / f"g{trial}"
            d.mkdir()
            r = self._census_from_edges(spark, d, edges)
            nn, ne, nw, nt = self._brute(edges)
            assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
                nn, ne, nw, nt,
            ), f"trial {trial}: {sorted(edges)}"

    def test_complete_graph_k5(self, spark, tmp_path):
        edges = list(itertools.combinations(range(1, 6), 2))
        r = self._census_from_edges(spark, tmp_path, edges)
        assert r.n_edges == 10
        assert r.n_triangles == 10  # C(5,3)
        assert r.n_wedges == 30  # 5 * C(4,2)
        assert r.transitivity_fp == 1_000_000


class TestMarkovInvariants:
    def test_row_probabilities_sum_to_at_most_one(self, spark, sf_dir):
        rows = REG["q169_markov_transitions"].spark(spark, sf_dir).collect()
        by_from = {}
        for r in rows:
            by_from.setdefault(r.from_type, []).append(r)
        for f_, rs in by_from.items():
            total_p = sum(r.p_fp for r in rs)
            n = sum(r.n for r in rs)
            # truncating DIV: sum lands in (1e6 - n_buckets, 1e6]
            assert total_p <= 1_000_000, f_
            assert total_p > 1_000_000 - len(rs), f_
            # each p is exactly floor(1e6 * n_ij / n_i)
            for r in rs:
                assert r.p_fp == 1_000_000 * r.n // n


class TestWinsorInvariants:
    def test_ordering_relations(self, spark, sf_dir):
        for r in REG["q171_winsorized_means"].spark(spark, sf_dir).collect():
            assert r.lo_fp <= r.hi_fp
            assert r.lo_fp <= r.winsor_mean_fp <= r.hi_fp
            assert r.lo_fp <= r.trim_mean_fp <= r.hi_fp
            assert 0 < r.n_kept <= r.n_events


class TestCusumClosedForm:
    def test_random_series_match_literal_recursion(self, spark, tmp_path):
        rng = random.Random(7)
        rows = []
        expect = {}
        for user in range(1, 6):
            vals = [round(rng.uniform(0.01, 50.0), 4) for _ in range(40)]
            if user % 2 == 0:  # half the users get a sustained shift
                vals += [round(rng.uniform(300.0, 400.0), 4) for _ in range(8)]
            x = [int(round(v * 10_000)) for v in vals]
            n = len(x)
            mean = sum(x) // n
            mad = sum(abs(v - mean) for v in x) // n
            s = best = alarms = 0
            for v in x:
                s = max(0, s + (v - mean))
                best = max(best, s)
                if s > 6 * mad:
                    alarms += 1
            expect[user] = (n, mean, mad, best, alarms)
            for i, v in enumerate(vals):
                rows.append(
                    dict(
                        event_id=user * 1000 + i,
                        ts=pd.Timestamp("2024-01-05") + pd.Timedelta(minutes=i),
                        user_id=user,
                        event_type="view",
                        value=v,
                        props="{}",
                    )
                )
        pd.DataFrame(rows).to_parquet(
            f"{tmp_path}/events.parquet", coerce_timestamps="us"
        )
        got = {
            r.user_id: (r.n_events, r.mean_fp, r.mad_fp, r.max_cusum_fp, r.n_alarms)
            for r in REG["q174_cusum_alarms"].spark(spark, str(tmp_path)).collect()
        }
        assert got == expect
        # the shifted users must actually alarm for this to carry evidence
        assert any(v[4] > 0 for v in expect.values())


class TestSameSourceAsofScanCount:
    def test_q26_plan_scans_events_once(self, spark, sf_dir):
        plan = (
            REG["q26_asof_purchase_view"]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan parquet") == 1, plan
