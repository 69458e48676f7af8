"""Semantic properties of the session-5b/5c/5d operators that the
oracle's value-hash equality cannot express: triple mining vs a
brute-force itertools count on random baskets, neighbor Jaccard vs a
set-arithmetic reference, attribution conservation under randomized
click patterns, the per-key trend against a pure-Python closed form,
and allocation invariants under adversarial stratum shapes."""

from __future__ import annotations

import datetime as dt
import itertools
import random
from collections import Counter

import pandas as pd

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _write_li(tmp_path, baskets):
    rows = []
    for okey, parts in baskets.items():
        for p in parts:
            rows.append(dict(l_orderkey=okey, l_partkey=p))
    df = pd.DataFrame(rows)
    for c, v in [
        ("l_suppkey", 1), ("l_linenumber", 1), ("l_quantity", 1.0),
        ("l_extendedprice", 1.0), ("l_discount", 0.0), ("l_tax", 0.0),
        ("l_returnflag", "N"), ("l_linestatus", "O"),
    ]:
        df[c] = v
    df["l_shipdate"] = pd.Timestamp("2024-01-05")
    df.to_parquet(f"{tmp_path}/lineitem.parquet", coerce_timestamps="us")
    return str(tmp_path)


class TestFrequentTriplesVsBruteForce:
    def test_random_baskets(self, spark, tmp_path):
        rng = random.Random(11)
        baskets = {
            k: rng.sample(range(1, 15), rng.randint(2, 6)) for k in range(1, 40)
        }
        d = _write_li(tmp_path, baskets)
        got = {
            (r.pa, r.pb, r.pc): r.n_orders
            for r in REG["q175_frequent_triples"].spark(spark, d).collect()
        }
        cnt = Counter()
        for parts in baskets.values():
            for tri in itertools.combinations(sorted(set(parts)), 3):
                cnt[tri] += 1
        want = {t: n for t, n in cnt.items() if n >= 2}
        top = dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:25])
        assert got == top


class TestNeighborJaccardVsSets:
    def test_random_graph(self, spark, tmp_path):
        rng = random.Random(5)
        edges = {
            tuple(sorted(rng.sample(range(1, 12), 2))) for _ in range(14)
        }
        baskets, k = {}, 0
        for (a, b) in edges:
            for _ in range(2):
                k += 1
                baskets[k] = [a, b]
        d = _write_li(tmp_path, baskets)
        got = {
            (r.pa, r.pb): (r.n_common, r.jaccard_fp)
            for r in REG["q177_neighbor_jaccard"].spark(spark, d).collect()
        }
        nbr = {}
        for (a, b) in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        want = {}
        for a, b in itertools.combinations(sorted(nbr), 2):
            common = len(nbr[a] & nbr[b])
            if common:
                union = len(nbr[a]) + len(nbr[b]) - common
                want[(a, b)] = (common, 1_000_000 * common // union)
        top = dict(
            sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:25]
        )
        assert got == top


class TestAttributionConservation:
    def test_random_click_patterns_conserve_value(self, spark, tmp_path):
        rng = random.Random(3)
        rows, eid = [], 0
        expected_total = 0
        t0 = dt.datetime(2024, 1, 5, 12, 0)
        for user in range(1, 9):
            n_clicks = rng.randint(0, 5)
            for i in range(n_clicks):
                eid += 1
                rows.append(dict(
                    event_id=eid, ts=t0 + dt.timedelta(minutes=rng.randint(0, 50)),
                    user_id=user, event_type="click", value=1.0, props="{}",
                ))
            eid += 1
            pv = round(rng.uniform(0.01, 99.99), 4)
            rows.append(dict(
                event_id=eid, ts=t0 + dt.timedelta(minutes=55),
                user_id=user, event_type="purchase", value=pv, props="{}",
            ))
            if n_clicks:
                expected_total += int(round(pv * 10_000))
        pd.DataFrame(rows).to_parquet(
            f"{tmp_path}/events.parquet", coerce_timestamps="us"
        )
        out = REG["q179_linear_attribution"].spark(spark, str(tmp_path)).collect()
        assert sum(r.credited_fp for r in out) == expected_total


class TestPerKeyTrendVsClosedForm:
    def test_random_series(self, spark, tmp_path):
        rng = random.Random(9)
        rows, eid = [], 0
        expect = {}
        for user in range(1, 7):
            days = sorted(rng.sample(range(1, 25), rng.randint(2, 8)))
            pts = []
            for dday in days:
                eid += 1
                v = round(rng.uniform(0.01, 400.0), 4)
                rows.append(dict(
                    event_id=eid, ts=dt.datetime(2024, 1, dday, 9, 0),
                    user_id=user, event_type="view", value=v, props="{}",
                ))
                pts.append((dday, int(round(v * 10_000))))
            d0 = min(p[0] for p in pts)
            xs = [p[0] - d0 for p in pts]
            ys = [p[1] for p in pts]
            n = len(pts)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            num, den = 1000 * (n * sxy - sx * sy), n * sxx - sx * sx
            if den == 0:
                expect[user] = None
            elif num < 0:
                expect[user] = -((-num) // den)
            else:
                expect[user] = num // den
        pd.DataFrame(rows).to_parquet(
            f"{tmp_path}/events.parquet", coerce_timestamps="us"
        )
        got = {
            r.user_id: r.slope_fp
            for r in REG["q182_per_key_trend"].spark(spark, str(tmp_path)).collect()
        }
        assert got == expect


class TestAllocationInvariants:
    def test_adversarial_strata(self, spark, tmp_path):
        # one giant stratum, several singletons — remainders all tiny
        rows = [dict(doc_id=i, text="x", lang="big", source="s", n_chars=1)
                for i in range(995)]
        for j, lang in enumerate(["s1", "s2", "s3", "s4", "s5"]):
            rows.append(dict(doc_id=1000 + j, text="x", lang=lang,
                             source="s", n_chars=1))
        pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet")
        out = REG["q178_strat_allocation"].spark(spark, str(tmp_path)).collect()
        total = sum(r.alloc for r in out)
        assert total == 10_000
        by = {r.lang: r for r in out}
        # every stratum gets at least its floor; floors differ by < 1 seat
        for r in out:
            assert r.alloc in (r.floor_alloc, r.floor_alloc + 1)
        # proportionality: the giant stratum holds 99.5% of mass
        assert by["big"].alloc >= 9_940
