"""Semantic properties of the round-6 queries (q113–q118) that the
oracle's value-hash equality cannot express: partitioning invariance of
the hash split, information-theoretic bounds on entropy/KL, and the
convexity/order-sensitivity of the EMA fold.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _run(name, spark, sf_dir):
    return REG[name].spark(spark, sf_dir)


class TestHashSplit:
    def test_split_fractions_and_totals(self, spark, sf_dir):
        rows = {r["split"]: r for r in _run("q113_hash_split", spark, sf_dir).collect()}
        assert set(rows) == {"train", "val", "test"}
        n = sum(r["n_docs"] for r in rows.values())
        # seeded-hash split: expect ~90/5/5 with binomial slack on 500 docs
        assert 0.82 <= rows["train"]["n_docs"] / n <= 0.96
        assert rows["val"]["n_docs"] / n <= 0.12
        assert rows["test"]["n_docs"] / n <= 0.12

    @pytest.mark.parametrize(
        "shape,mk_expr",
        [
            ("sequential_ints", lambda: F.col("id").cast("string")),
            ("zero_padded_common_prefix", lambda: F.format_string("doc_%012d", F.col("id"))),
            ("long_shared_prefix_short_suffix", lambda: F.concat(
                F.lit("corpus/shard-2024-01-01/source=web/document-"),
                F.col("id").cast("string"),
            )),
            ("low_entropy_tail", lambda: F.format_string("%d000000", F.col("id"))),
        ],
        ids=["sequential", "zeropad", "sharedprefix", "lowtail"],
    )
    def test_split_unbiased_on_adversarial_id_distributions(self, spark, shape, mk_expr):
        """Weak string hashes collapse on sequential / shared-prefix key
        families (the classic 90/5/5-split failure: correlated ids land
        in one split). The sha2-based portable hash must keep every
        adversarial family within binomial slack of 90/5/5: for
        n=20000, sigma(train) = sqrt(n*.9*.1) ~ 42, so +-5 sigma is
        ~+-210 docs (~1 pp)."""
        n = 20_000
        from e2e_stock_data_pipeline_spark.functions.hashing import portable_hash64

        bucket = portable_hash64(mk_expr(), seed=42) % 100
        split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        got = {
            r["split"]: r["n"]
            for r in spark.range(n)
            .groupBy(split.alias("split"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(got) == {"train", "val", "test"}, shape
        assert abs(got["train"] - 0.90 * n) <= 5 * math.sqrt(n * 0.9 * 0.1), shape
        for s in ("val", "test"):
            assert abs(got[s] - 0.05 * n) <= 5 * math.sqrt(n * 0.05 * 0.95), (shape, s)

    def test_split_is_partitioning_invariant(self, spark, sf_dir):
        """The same doc lands in the same split regardless of how the
        input is partitioned — the property RNG-based splits lose."""
        base = _run("q113_hash_split", spark, sf_dir)
        from e2e_stock_data_pipeline_spark.functions.hashing import portable_hash64
        from e2e_stock_data_pipeline_spark.sources import tables

        docs = tables.load(spark, sf_dir, "documents").repartition(17, "lang")
        bucket = portable_hash64("doc_id", seed=42) % 100
        split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        again = docs.groupBy(split.alias("split")).agg(F.count(F.lit(1)).alias("n_docs"))
        assert sorted((r["split"], r["n_docs"]) for r in again.collect()) == sorted(
            (r["split"], r["n_docs"]) for r in base.select("split", "n_docs").collect()
        )


class TestEntropyBounds:
    def test_entropy_within_information_bounds(self, spark, sf_dir):
        """0 <= H <= ln(n_distinct), in micro-nats, modulo the per-term
        floor (at most 1 micro-nat lost per distinct word)."""
        for r in _run("q114_token_entropy", spark, sf_dir).collect():
            upper = math.log(max(r["n_distinct"], 1)) * 1_000_000
            assert -r["n_distinct"] <= r["entropy_fp"] <= upper + r["n_distinct"]

    def test_single_word_doc_has_near_zero_entropy(self, spark):
        """A doc of one word repeated 7x: H = ln(7) - 7*ln(7)/7 = 0,
        up to the one-micro-nat per-term floor."""
        from e2e_stock_data_pipeline_spark.plans.queries_ext5 import (
            _ENT_FINAL,
            _ENT_WORD_TERM,
        )

        df = spark.createDataFrame([(7, 7)], "c long, n_tokens long")
        out = (
            df.withColumn("s", F.expr(_ENT_WORD_TERM))
            .select(F.expr(_ENT_FINAL).alias("h"))
            .first()["h"]
        )
        assert -1 <= out <= 0


class TestKLBounds:
    def test_kl_nonnegative_and_zero_for_corpus_itself(self, spark, sf_dir):
        """Gibbs' inequality: KL(P_s || P_corpus) >= 0 (modulo the floor,
        which can shave at most 1 micro-nat per distinct term)."""
        rows = _run("q116_source_kl_divergence", spark, sf_dir).collect()
        assert len(rows) >= 2
        for r in rows:
            # slack: one micro-nat per possible term; n_tokens bounds terms
            assert r["kl_fp"] >= -r["n_tokens"]
        assert any(r["kl_fp"] > 0 for r in rows)


class TestEmaFold:
    def test_ema_is_convex_combination(self, spark, sf_dir):
        """min(series) <= EMA <= max(series) for every key."""
        from e2e_stock_data_pipeline_spark.sources import tables

        bounds = (
            tables.load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        )
        joined = _run("q118_ema_smoothing", spark, sf_dir).join(bounds, "user_id")
        bad = joined.filter((F.col("ema") < F.col("lo")) | (F.col("ema") > F.col("hi")))
        assert bad.count() == 0

    def test_per_key_ema_bit_equals_the_catalyst_fold(self, spark, sf_dir):
        """The applyInPandas escape hatch for unbounded series
        (operators/grouped.per_key_ema) must run the IDENTICAL IEEE
        recursion as q118's Catalyst `aggregate` fold — bit-equality on
        every key of the real events table, not approximate closeness."""
        from e2e_stock_data_pipeline_spark.operators.grouped import per_key_ema
        from e2e_stock_data_pipeline_spark.sources import tables

        events = tables.load(spark, sf_dir, "events")
        plan = {
            r["user_id"]: (r["n_obs"], r["ema"])
            for r in _run("q118_ema_smoothing", spark, sf_dir).collect()
        }
        pandas_twin = {
            r["user_id"]: (r["n_obs"], r["ema"]) for r in per_key_ema(events).collect()
        }
        assert plan == pandas_twin  # exact float equality, all keys

    def test_ema_depends_on_order(self, spark):
        """Reversing the series changes the EMA — the property that rules
        out implementing this with an order-free aggregate. Uses the
        query's own expression constants, so a regression in q118 cannot
        hide behind a stale copy."""
        from e2e_stock_data_pipeline_spark.plans.queries_ext5 import (
            EMA_FOLD_EXPR,
            EMA_VALS_EXPR,
        )

        fwd = [(1, i, float(i)) for i in range(10)]
        rev = [(1, i, float(9 - i)) for i in range(10)]
        out = {}
        for tag, data in [("fwd", fwd), ("rev", rev)]:
            df = spark.createDataFrame(data, "user_id long, event_id long, value double")
            df = df.withColumn("ts", F.timestamp_micros(F.col("event_id") * 1_000_000))
            out[tag] = (
                df.groupBy("user_id")
                .agg(F.expr(EMA_VALS_EXPR).alias("_vals"))
                .select(F.expr(EMA_FOLD_EXPR).alias("e"))
                .first()["e"]
            )
        assert out["fwd"] != out["rev"]
        # late observations dominate: rising series ends high, falling low
        assert out["fwd"] > out["rev"]


class TestTemperatureMixture:
    def test_mixture_invariants(self, spark, sf_dir):
        """alpha=0.5 temperature sampling: kept = min(count, target);
        targets sum to ~N (floor loss < n_groups); the head group
        downsamples while tail groups keep everything — the flattening
        that IS the point of temperature mixing."""
        rows = _run("q127_temperature_mixture", spark, sf_dir).collect()
        n_total = sum(r["n_docs"] for r in rows)
        assert sum(r["n_target"] for r in rows) <= n_total
        assert sum(r["n_target"] for r in rows) >= n_total - len(rows)
        for r in rows:
            assert r["n_sampled"] == min(r["n_docs"], r["n_target"])
            assert (r["tokens_sampled"] > 0) == (r["n_sampled"] > 0)
        head = max(rows, key=lambda r: r["n_docs"])
        tail = min(rows, key=lambda r: r["n_docs"])
        assert head["n_target"] < head["n_docs"]  # head downsampled
        assert tail["n_target"] >= tail["n_docs"]  # tail kept whole

    def test_keep_decision_is_partitioning_invariant(self, spark, sf_dir):
        """The hash-ranked keep set must not depend on input layout —
        same guarantee the q113 split carries, now for sampling. Runs
        the SHARED plan constructor over a repartitioned clone, so a
        drift between query and test is impossible."""
        from e2e_stock_data_pipeline_spark.plans.queries_ext6 import (
            temperature_mixture_plan,
        )
        from e2e_stock_data_pipeline_spark.sources import tables

        base = {
            (r["lang"], r["tokens_sampled"])
            for r in _run("q127_temperature_mixture", spark, sf_dir).collect()
        }
        docs = tables.load(spark, sf_dir, "documents").repartition(13, "lang")
        again = {
            (r["lang"], r["tokens_sampled"])
            for r in temperature_mixture_plan(docs).collect()
        }
        assert again == base

    def test_bucketed_keep_bit_equals_naive_window_keep(self, spark, sf_dir):
        """The skew-safe bucketed keep (r8) must select the EXACT doc
        set the original per-lang row_number window did — per-lang rank
        decomposes as earlier-bucket count + within-bucket rank because
        shiftright bucketing is monotone in the (hash, doc_id) order
        key. Checked on the real corpus AND on an adversarial 90%-head
        skew with targets that force a boundary bucket in the head."""
        from e2e_stock_data_pipeline_spark.plans.queries_ext6 import (
            _bucketed_keep,
            naive_window_keep,
        )
        from e2e_stock_data_pipeline_spark.sources import tables

        docs = tables.load(spark, sf_dir, "documents")
        targets = (
            docs.groupBy("lang")
            .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_target"))
        )
        got = {tuple(r) for r in _bucketed_keep(docs, targets).collect()}
        want = {tuple(r) for r in naive_window_keep(docs, targets).collect()}
        assert got == want and len(want) > 0

        skewed = spark.range(5_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 9, "head").otherwise(
                F.concat(F.lit("t"), F.col("id") % 7)
            ).alias("lang"),
        )
        st = skewed.groupBy("lang").agg(
            (F.count(F.lit(1)) * 3 / 10).cast("bigint").alias("n_target")
        )
        got = {tuple(r) for r in _bucketed_keep(skewed, st).collect()}
        want = {tuple(r) for r in naive_window_keep(skewed, st).collect()}
        assert got == want and len(want) > 0

    @pytest.mark.parametrize(
        "shape,langs",
        [
            ("single_lang", lambda i: F.lit("only")),
            ("all_equal", lambda i: F.concat(F.lit("l"), i % 10)),
            ("one_doc_langs", lambda i: F.concat(F.lit("u"), i)),
        ],
        ids=["single", "equal", "onedoc"],
    )
    def test_degenerate_mixtures_pin_target_arithmetic(self, spark, shape, langs):
        """ADVICE r7 item 7: degenerate corpora pin the integer-div
        floor contract — sum(n_target) <= N with under-allocation at
        most n_langs rows, n_sampled = min(c, target), and in the
        all-equal / single-lang cases every lang keeps (almost) whole:
        target >= c - n_langs (floor loss only)."""
        from e2e_stock_data_pipeline_spark.plans.queries_ext6 import (
            temperature_mixture_plan,
        )

        docs = spark.range(400).select(
            F.col("id").alias("doc_id"),
            langs(F.col("id")).alias("lang"),
            F.lit("alpha beta gamma").alias("text"),
        )
        rows = temperature_mixture_plan(docs).collect()
        n = 400
        n_langs = len(rows)
        assert sum(r["n_docs"] for r in rows) == n
        tsum = sum(r["n_target"] for r in rows)
        assert n - n_langs <= tsum <= n
        for r in rows:
            assert r["n_sampled"] == min(r["n_docs"], r["n_target"])
            assert r["tokens_sampled"] == 3 * r["n_sampled"]
            if shape in ("single_lang", "all_equal"):
                # uniform mixture: temperature is a no-op up to floor loss
                assert r["n_target"] >= r["n_docs"] - n_langs


class TestPercentileAnchors:
    def test_percentiles_are_ordered_and_bounded(self, spark, sf_dir):
        from e2e_stock_data_pipeline_spark.sources import tables

        li = tables.load(spark, sf_dir, "lineitem")
        lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
        for r in _run("q115_percentile_interp", spark, sf_dir).collect():
            assert lo <= r["p25"] <= r["p50"] <= r["p75"] <= hi

    def test_corpus_card_consistency(self, spark, sf_dir):
        r = _run("q117_corpus_card", spark, sf_dir).first()
        assert r["n_unique_texts"] <= r["n_docs"]
        assert r["n_tokens"] <= r["total_chars"]
        assert r["n_langs"] >= 1 and r["n_sources"] >= 1


class TestTokenBudgetMixture:
    def test_bucketed_budget_keep_equals_naive_running_sum(self, spark, sf_dir):
        """The weighted keep must select EXACTLY the prefix a naive
        per-group running-sum window selects — checked on the real
        corpus and on an adversarial 90%-head-group weighted set."""
        from pyspark.sql import Window

        from e2e_stock_data_pipeline_spark.functions.hashing import portable_hash64
        from e2e_stock_data_pipeline_spark.operators.ranking import (
            bucketed_budget_keep,
        )
        from e2e_stock_data_pipeline_spark.sources import tables

        def naive(df, budgets, seed):
            w = (
                Window.partitionBy("lang")
                .orderBy(portable_hash64("doc_id", seed=seed), F.col("doc_id"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return (
                df.withColumn("_cum", F.sum("n_tok").over(w))
                .join(F.broadcast(budgets), "lang")
                .filter(F.col("_cum") <= F.col("budget"))
                .select("doc_id", "lang", "n_tok")
            )

        docs = tables.load(spark, sf_dir, "documents").select(
            "doc_id", "lang",
            F.expr("CAST(size(split(trim(text), ' +')) AS BIGINT)").alias("n_tok"),
        )
        budgets = docs.groupBy("lang").agg(
            (F.sum("n_tok") / 3).cast("bigint").alias("budget")
        )
        got = {tuple(r) for r in bucketed_budget_keep(
            docs, ["lang"], budgets, "n_tok", seed=17).collect()}
        want = {tuple(r) for r in naive(docs, budgets, 17).collect()}
        assert got == want and len(want) > 0

        skewed = spark.range(4_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 9, "head").otherwise(
                F.concat(F.lit("t"), F.col("id") % 5)
            ).alias("lang"),
            (F.pmod(F.xxhash64("id"), F.lit(40)) + 1).cast("bigint").alias("n_tok"),
        )
        sb = skewed.groupBy("lang").agg(
            (F.sum("n_tok") / 4).cast("bigint").alias("budget")
        )
        got = {tuple(r) for r in bucketed_budget_keep(
            skewed, ["lang"], sb, "n_tok", seed=17).collect()}
        want = {tuple(r) for r in naive(skewed, sb, 17).collect()}
        assert got == want and len(want) > 0

    def test_budget_invariants(self, spark, sf_dir):
        """Kept tokens never exceed the budget; every lang appears; the
        budgets sum to at most the corpus total (integer floor)."""
        rows = _run("q134_token_budget_mixture", spark, sf_dir).collect()
        total = sum(r["tokens_total"] for r in rows)
        assert total - len(rows) <= sum(r["budget_tokens"] for r in rows) <= total
        for r in rows:
            assert r["tokens_kept"] <= r["budget_tokens"]
            assert r["n_kept"] >= 0
