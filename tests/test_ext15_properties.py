"""Properties of the exact set-similarity join (q184): losslessness of
the prefix filter vs brute-force all-pairs on random template corpora,
and the exact threshold boundary."""

from __future__ import annotations

import itertools
import random

import pandas as pd

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        [
            dict(doc_id=i + 1, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    ).to_parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _shingles(text):
    ws = text.strip().split()
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)} if len(ws) >= 3 else set()


def _brute(texts, t_num=4, t_den=5):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(enumerate(texts, 1), 2):
        sa, sb = _shingles(ta), _shingles(tb)
        if not sa or not sb:
            continue
        i = len(sa & sb)
        u = len(sa | sb)
        if t_den * i >= t_num * u:
            out[(ia, ib)] = (i, 1_000_000 * i // u)
    return out


class TestPrefixFilterLossless:
    def test_random_template_corpus(self, spark, tmp_path):
        """Mutated copies of a few templates: brute-force all-pairs and
        the prefix-filtered join must agree EXACTLY (no false
        negatives from the filter, no false positives from the
        verify)."""
        rng = random.Random(21)
        vocab = [f"w{i}" for i in range(40)]
        templates = [
            " ".join(rng.choices(vocab, k=30)) for _ in range(4)
        ]
        texts = []
        for t in templates:
            ws = t.split()
            for _ in range(5):  # 5 mutated copies per template
                mutated = list(ws)
                for _ in range(rng.randint(0, 2)):
                    mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
                texts.append(" ".join(mutated))
        d = _write_docs(tmp_path, texts)
        got = {
            (r.doc_a, r.doc_b): (r.n_common, r.jaccard_fp)
            for r in REG["q184_set_similarity_join"].spark(spark, d).collect()
        }
        assert got == _brute(texts)
        assert len(got) > 0  # the corpus must actually contain near-dups

    def test_exact_threshold_boundary_included(self, spark, tmp_path):
        # doc_a: shingles {abc, bcd, cde, def} (4); doc_b shares 4 of 5
        # -> i=4, union=5, J=0.8 exactly: 5*4 >= 4*5 must include it
        a = "a b c d e f"          # shingles: abc bcd cde def (4)
        b = "a b c d e f g"        # shingles: + efg            (5)
        d = _write_docs(tmp_path, [a, b])
        [r] = REG["q184_set_similarity_join"].spark(spark, d).collect()
        assert (r.doc_a, r.doc_b) == (1, 2)
        assert r.n_common == 4
        assert r.jaccard_fp == 800_000

    def test_below_threshold_excluded(self, spark, tmp_path):
        a = "a b c d e f"            # 4 shingles
        b = "a b c d x y z"          # shingles: abc bcd, then cdx dxy xyz
        d = _write_docs(tmp_path, [a, b])
        # i=2 (abc, bcd), union=7 -> J=2/7 < 0.8
        assert REG["q184_set_similarity_join"].spark(spark, d).collect() == []


class TestGiniDecomposition:
    def test_matches_brute_force_pairwise_sum(self, spark, tmp_path):
        import random

        import pandas as pd

        rng = random.Random(17)
        orders, cust = [], []
        expect = {}
        for si, seg in enumerate(["SEG_A", "SEG_B"]):
            cust.append(dict(c_custkey=si + 1, c_name="x", c_nationkey=1,
                             c_acctbal=0.0, c_mktsegment=seg))
            vals = [round(rng.uniform(10.0, 5000.0), 2) for _ in range(120)]
            for j, v in enumerate(vals):
                orders.append(dict(
                    o_orderkey=si * 1000 + j, o_custkey=si + 1,
                    o_orderstatus="F", o_totalprice=v,
                    o_orderdate=pd.Timestamp("2024-01-01"),
                    o_orderpriority="1",
                ))
            cents = [int(round(v * 100)) for v in vals]
            p = sum(abs(a - b) for i, a in enumerate(cents) for b in cents[i + 1:])
            n, s = len(cents), sum(cents)
            # r11 contract: ppm ratio is exact 128-bit p*1e6 // (n*s);
            # r14: pairsum is emitted as a string column (wire-type fix)
            expect[seg] = (n, s, str(p), (p * 1_000_000) // (n * s))
        pd.DataFrame(orders).to_parquet(f"{tmp_path}/orders.parquet",
                                        coerce_timestamps="us")
        pd.DataFrame(cust).to_parquet(f"{tmp_path}/customer.parquet")
        got = {
            r.segment: (r.n_orders, r.total_cents, r.pairsum, r.gini_ppm)
            for r in REG["q185_gini_concentration"].spark(spark, str(tmp_path)).collect()
        }
        assert got == expect

    def test_equal_values_give_zero_gini(self, spark, tmp_path):
        import pandas as pd

        cust = [dict(c_custkey=1, c_name="x", c_nationkey=1, c_acctbal=0.0,
                     c_mktsegment="SEG")]
        orders = [dict(o_orderkey=i, o_custkey=1, o_orderstatus="F",
                       o_totalprice=100.0,
                       o_orderdate=pd.Timestamp("2024-01-01"),
                       o_orderpriority="1") for i in range(10)]
        pd.DataFrame(orders).to_parquet(f"{tmp_path}/orders.parquet",
                                        coerce_timestamps="us")
        pd.DataFrame(cust).to_parquet(f"{tmp_path}/customer.parquet")
        [r] = REG["q185_gini_concentration"].spark(spark, str(tmp_path)).collect()
        assert r.pairsum == "0"
        assert r.gini_ppm == 0

    def test_two_point_distribution_gives_half(self, spark, tmp_path):
        # {0, X}: Gini is exactly 0.5 (one order holds ALL the value).
        # This is the case the round-9 formula got wrong (reported 1.0 —
        # the relative mean absolute difference, i.e. 2x Gini).
        import pandas as pd

        cust = [dict(c_custkey=1, c_name="x", c_nationkey=1, c_acctbal=0.0,
                     c_mktsegment="SEG")]
        orders = [dict(o_orderkey=i, o_custkey=1, o_orderstatus="F",
                       o_totalprice=v,
                       o_orderdate=pd.Timestamp("2024-01-01"),
                       o_orderpriority="1")
                  for i, v in enumerate([0.0, 50000.0])]
        pd.DataFrame(orders).to_parquet(f"{tmp_path}/orders.parquet",
                                        coerce_timestamps="us")
        pd.DataFrame(cust).to_parquet(f"{tmp_path}/customer.parquet")
        [r] = REG["q185_gini_concentration"].spark(spark, str(tmp_path)).collect()
        assert r.pairsum == "5000000"
        assert r.gini_ppm == 500_000

    def test_tiny_total_divides_exactly(self, spark, tmp_path):
        # r11: the 128-bit ratio has no staged-scaling underflow — a
        # tiny group (3 equal orders, pairsum 0) gets an exact ppm of 0
        # instead of the old NULL (NULLIF now guards only total == 0,
        # which the data cannot produce: o_totalprice >= 1000 cents).
        import pandas as pd

        cust = [dict(c_custkey=1, c_name="x", c_nationkey=1, c_acctbal=0.0,
                     c_mktsegment="SEG")]
        orders = [dict(o_orderkey=i, o_custkey=1, o_orderstatus="F",
                       o_totalprice=1.0,
                       o_orderdate=pd.Timestamp("2024-01-01"),
                       o_orderpriority="1") for i in range(3)]
        pd.DataFrame(orders).to_parquet(f"{tmp_path}/orders.parquet",
                                        coerce_timestamps="us")
        pd.DataFrame(cust).to_parquet(f"{tmp_path}/customer.parquet")
        [r] = REG["q185_gini_concentration"].spark(spark, str(tmp_path)).collect()
        assert r.gini_ppm == 0 and r.pairsum == "0"


class TestBandJoinDecomposition:
    def _write_sup(self, tmp_path, bals):
        import pandas as pd

        pd.DataFrame(
            [
                dict(s_suppkey=i + 1, s_name="s", s_nationkey=1, s_acctbal=b)
                for i, b in enumerate(bals)
            ]
        ).to_parquet(f"{tmp_path}/supplier.parquet")
        return str(tmp_path)

    def test_matches_brute_force_with_boundary(self, spark, tmp_path):
        # includes a cross-bucket pair, an exact-$10 boundary pair, an
        # exact tie, and negative balances
        bals = [-5.0, 4.99, 5.0, 15.0, 100.0, 100.0, 250.0]
        d = self._write_sup(tmp_path, bals)
        [r] = REG["q186_balance_band_pairs"].spark(spark, d).collect()
        cents = [int(round(b * 100)) for b in bals]
        pairs = [
            (a, b)
            for i, a in enumerate(cents)
            for b in cents[i + 1:]
            if abs(a - b) <= 1000
        ]
        assert r.n_pairs == len(pairs)
        assert r.n_exact_ties == sum(1 for a, b in pairs if a == b)
        assert r.sum_gap_cents == sum(abs(a - b) for a, b in pairs)
        assert r.max_gap_cents == max(abs(a - b) for a, b in pairs)
        # the $5.00 vs $15.00 boundary pair must be included (gap 1000)
        assert r.max_gap_cents == 1000

    def test_random_matches_brute_force(self, spark, tmp_path):
        import random

        rng = random.Random(13)
        bals = [round(rng.uniform(-999.0, 9999.0), 2) for _ in range(150)]
        d = self._write_sup(tmp_path, bals)
        [r] = REG["q186_balance_band_pairs"].spark(spark, d).collect()
        cents = [int(round(b * 100)) for b in bals]
        gaps = [
            abs(a - b)
            for i, a in enumerate(cents)
            for b in cents[i + 1:]
            if abs(a - b) <= 1000
        ]
        assert r.n_pairs == len(gaps)
        assert r.sum_gap_cents == sum(gaps)
