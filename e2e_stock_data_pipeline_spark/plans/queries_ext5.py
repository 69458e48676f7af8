"""Round-6 [EXT] additions: dataset-assembly and distribution-analysis
stages of a large-scale training pipeline, plus two engine-surface
shapes (exact interpolated percentiles, order-dependent sequential
folds) the registry did not yet cover —

* deterministic train/val/test split by portable hash (q113): the
  reproducible, join-free split every training pipeline needs; the
  same document lands in the same split on every engine and every run;
* per-document token-distribution entropy (q114): low-entropy docs are
  keyboard-mash / template spam, the classic cheap quality signal;
* exact interpolated per-group percentiles (q115): percentile_cont
  semantics, the correctness anchor for approx_percentile at scale;
* per-source KL divergence vs the corpus distribution (q116): source
  drift scoring for data mixing — which sources look least like the
  corpus you want to train on;
* one-row corpus card (q117): the dataset-datasheet numbers (docs,
  tokens, langs, dedup rate) produced in a single pass;
* per-key exponential moving average via a sequential fold (q118): the
  recursive y_t = a*x_t + (1-a)*y_{t-1} no SQL window frame can
  express, done as a Catalyst higher-order `aggregate` over the
  sorted series (DuckDB `list_reduce` is the bit-identical oracle).

Cross-engine exactness rules (see plans/registry.py): integer outputs
wherever possible; ln-based scores go through the q98 fixed-point
convention (each double term floored to micro-nats BEFORE the integer
sum, with the expression tree written identically on both sides);
the EMA fold runs the identical sequence of IEEE double ops in both
engines, so even the raw doubles hash-match.

Reference parity: the reference's Spark tier has no dataset-assembly
stage (its gold layer is MAs/volatility: docs/databricks_setup.md);
these follow the public recipes (GPT-3 §2.2 / The Pile §1 hash-based
splits, Gopher quality signals, data-mixing KL scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..sources import tables
from .registry import query

_WORDS = "split(trim(text), ' +')"
_SQL_WORDS = "regexp_split_to_array(trim(text), ' +')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# q113: deterministic train/val/test split
# --------------------------------------------------------------------------


@query(
    "q113_hash_split",
    oracle=f"""
    SELECT CASE WHEN {portable_hash64_sql("doc_id", seed=42)} % 100 < 90 THEN 'train'
                WHEN {portable_hash64_sql("doc_id", seed=42)} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_SQL_WORDS})) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY split
    """,
    doc="90/5/5 train/val/test split assigned by a seeded portable hash "
    "of the stable doc_id — no RNG, no global sort, no state: any "
    "engine, any partitioning, any day reproduces the same split. Pure "
    "map-side expression + one aggregation on a 3-value key.",
    tags=("ext", "curation", "split"),
)
def q113_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = portable_hash64("doc_id", seed=42) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        _docs(spark, sf_dir)
        .select(
            split.alias("split"),
            F.expr(f"size({_WORDS})").alias("_nw"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nw").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# q114: per-document token entropy
# --------------------------------------------------------------------------

# Join-free decomposition: H = ln(N) - (sum_w c*ln(c)) / N. One
# fixed-point micro-nat term per distinct (doc, word), floored BEFORE
# the integer sum so both engines hash-match (q98 convention); the
# final combine is one identical double expression on exact bigints.
# The expression text is shared verbatim between plan and oracle.
_ENT_WORD_TERM = (
    "CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"
)
_ENT_FINAL = (
    "CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000 "
    "- CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS BIGINT)"
)


def token_entropy_plan(docs: DataFrame) -> DataFrame:
    """The q114 plan over any (doc_id, text) frame — ONE definition
    shared by the registered query and the scale smoke, so the smoke
    can never drift to timing a stale copy of the shape."""
    w = docs.select("doc_id", F.explode(F.expr(_WORDS)).alias("word"))
    c = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.expr(_ENT_WORD_TERM)).cast("bigint").alias("s"),
    )
    return n.select(
        "doc_id", "n_tokens", "n_distinct", F.expr(_ENT_FINAL).alias("entropy_fp")
    )



@query(
    "q114_token_entropy",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({_SQL_WORDS}) AS word FROM documents
    ),
    c AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
    n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct,
                 CAST(SUM({_ENT_WORD_TERM}) AS BIGINT) AS s
          FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, {_ENT_FINAL} AS entropy_fp
    FROM n
    """,
    doc="Shannon entropy of each document's word distribution in "
    "fixed-point micro-nats — near-zero entropy flags repeated-token "
    "spam (Gopher-style repetition signals' information-theoretic "
    "cousin). H = ln(N) - (sum c*ln c)/N, so the plan is one scan and "
    "exactly two keyed aggregations (doc,word)->(doc): no self-join, "
    "no second pass over the text.",
    tags=("ext", "text", "quality"),
)
def q114_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_entropy_plan(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q115: exact interpolated per-group percentiles
# --------------------------------------------------------------------------


@query(
    "q115_percentile_interp",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact percentile_cont(0.25/0.5/0.75) per return flag. The "
    "interpolation position (n-1)*p and the blend lo+(hi-lo)*frac are "
    "dyadic-exact for these p, so the result is bit-equal to DuckDB "
    "`quantile_cont`. r11: no longer Spark's native `percentile` — that "
    "TypedImperativeAggregate holds a per-group OpenHashMap of every "
    "distinct value, and at sf10 (~1e7 distinct prices x 32 concurrent "
    "partial aggregators) it OOMed the execution smoke. Now the exact "
    "order statistics at ranks floor(k)+1/ceil(k)+1 come from the "
    "two-pass bucket histogram (exact_group_rank_values, the q168 "
    "machinery) over fixed-point cents, and the same double blend runs "
    "on the reconstructed values — scale-bounded by (groups x buckets), "
    "never by distinct values.",
    tags=("ext", "agg"),  # r11: no longer a quadratic anchor — scale-safe itself
)
def q115_percentile_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.fixedpoint import units
    from .queries_ext11 import exact_group_rank_values

    li = tables.load(spark, sf_dir, "lineitem")
    # w=1 raw rows: the bucket histogram partial-aggregates map-side to
    # (group x ~2,500 buckets; l_extendedprice spans ~90k..10.5M cents
    # at 4096-cent width) — a (group, pc) pre-agg would instead hash
    # ~30M distinct price groups at sf10 for no pass-2 benefit (only
    # boundary-bucket rows are touched there anyway)
    vw = li.select(
        "l_returnflag",
        units("l_extendedprice").alias("pc"),
        F.lit(1).cast("bigint").alias("w"),
    )
    counts = vw.groupBy("l_returnflag").agg(F.sum("w").alias("n"))
    # quarter-exact rank targets: k4 = (n-1)*q in quarter units;
    # lo rank = k4 DIV 4 + 1, hi rank = (k4+3) DIV 4 + 1, frac = (k4%4)/4
    rank_rows = []
    for q in (1, 2, 3):
        rank_rows.append(
            counts.select(
                "l_returnflag",
                F.lit(f"q{q}_lo").alias("tag"),
                (F.expr(f"(( n - 1 ) * {q}) DIV 4") + 1).alias("m"),
            )
        )
        rank_rows.append(
            counts.select(
                "l_returnflag",
                F.lit(f"q{q}_hi").alias("tag"),
                (F.expr(f"(( n - 1 ) * {q} + 3) DIV 4") + 1).alias("m"),
            )
        )
    ranks = rank_rows[0]
    for rr in rank_rows[1:]:
        ranks = ranks.union(rr)
    vals = exact_group_rank_values(vw, "l_returnflag", ranks, bucket=4096)
    pivoted = vals.groupBy("l_returnflag").pivot(
        "tag", [f"q{q}_{s}" for q in (1, 2, 3) for s in ("lo", "hi")]
    ).agg(F.min("pc"))
    out = pivoted.join(counts, "l_returnflag")
    cols = [F.col("l_returnflag"), F.col("n")]
    for q, name in ((1, "p25"), (2, "p50"), (3, "p75")):
        lo = F.col(f"q{q}_lo").cast("double") / 100.0
        hi = F.col(f"q{q}_hi").cast("double") / 100.0
        frac = (F.expr(f"(( n - 1 ) * {q}) % 4").cast("double")) / 4.0
        # DuckDB's quantile_cont blends lo*(1-f) + hi*f (NOT lo+(hi-lo)*f
        # — the two differ by an ulp; measured on sf0.001 R/p75)
        cols.append((lo * (1 - frac) + hi * frac).alias(name))
    return out.select(*cols)


# --------------------------------------------------------------------------
# q116: per-source KL divergence vs the corpus distribution
# --------------------------------------------------------------------------

# Linear decomposition: KL(P_s || P_corpus)
#   = (sum_w c_sw*ln(c_sw) - sum_w c_sw*ln(c_w)) / N_s + ln(N / N_s)
# so the corpus word-marginal c_w arrives via a word-partitioned window
# over the (source,word) counts — no self-join, no second pass over the
# text, and the whole query is one linear pipeline of keyed exchanges.
# Per-(source,word) terms are floored micro-nats (q98 convention); the
# final combine is one identical double expression on exact bigints.
_KL_U = "CAST(floor(CAST(c_sw AS DOUBLE) * ln(CAST(c_sw AS DOUBLE)) * 1000000) AS BIGINT)"
_KL_V = "CAST(floor(CAST(c_sw AS DOUBLE) * ln(CAST(c_w AS DOUBLE)) * 1000000) AS BIGINT)"
_KL_FINAL = (
    "CAST(floor((CAST(su AS DOUBLE) - CAST(sv AS DOUBLE)) / CAST(n_tokens AS DOUBLE) "
    "+ ln(CAST(n AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)"
)


def source_kl_plan(docs: DataFrame) -> DataFrame:
    """The q116 plan over any (source, text) frame — ONE definition
    shared by the registered query and the scale smoke (same contract
    as :func:`token_entropy_plan`)."""
    from pyspark.sql import Window

    w = docs.select("source", F.explode(F.expr(_WORDS)).alias("word"))
    sw = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c_sw"))
    marg = sw.select(
        "source",
        "c_sw",
        F.sum("c_sw").over(Window.partitionBy("word")).cast("bigint").alias("c_w"),
    )
    per_s = marg.groupBy("source").agg(
        F.sum("c_sw").cast("bigint").alias("n_tokens"),
        F.sum(F.expr(_KL_U)).cast("bigint").alias("su"),
        F.sum(F.expr(_KL_V)).cast("bigint").alias("sv"),
    )
    # Grand total via a global window over the per-source AGGREGATE: a
    # single partition of #sources rows (a dimension, not data — the
    # pattern ranking.py forbids is a global window over row-level
    # data). This keeps construction lazy and the pipeline single-pass;
    # a scalar-aggregate join-back would re-execute the whole upstream
    # (no CTE materialization in Spark, and under AQE even a lazy
    # localCheckpoint runs upstream stages at plan-construction time).
    return per_s.withColumn(
        "n", F.sum("n_tokens").over(Window.partitionBy()).cast("bigint")
    ).select("source", "n_tokens", F.expr(_KL_FINAL).alias("kl_fp"))



@query(
    "q116_source_kl_divergence",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest({_SQL_WORDS}) AS word FROM documents
    ),
    sw AS (SELECT source, word, COUNT(*) AS c_sw FROM w GROUP BY source, word),
    marg AS (
      SELECT source, c_sw,
             CAST(SUM(c_sw) OVER (PARTITION BY word) AS BIGINT) AS c_w
      FROM sw
    ),
    per_s AS (
      SELECT source,
             CAST(SUM(c_sw) AS BIGINT) AS n_tokens,
             CAST(SUM({_KL_U}) AS BIGINT) AS su,
             CAST(SUM({_KL_V}) AS BIGINT) AS sv
      FROM marg GROUP BY source
    ),
    with_tot AS (
      SELECT source, n_tokens, su, sv,
             CAST(SUM(n_tokens) OVER () AS BIGINT) AS n
      FROM per_s
    )
    SELECT source, n_tokens, {_KL_FINAL} AS kl_fp FROM with_tot
    """,
    doc="Data-mixing drift score: KL(source || corpus) over word "
    "distributions, fixed-point micro-nats. Decomposed so the corpus "
    "marginal is a word-partitioned window over the (source,word) "
    "counts: one scan, three keyed exchanges (source+word, word, "
    "source), zero joins against recomputed subplans. The grand total "
    "is a global window over the per-source aggregate — single "
    "partition of #sources rows (a dimension, not data), keeping the "
    "whole query one lazy linear pipeline.",
    tags=("ext", "text", "mixing"),
)
def q116_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_kl_plan(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q117: one-row corpus card
# --------------------------------------------------------------------------


@query(
    "q117_corpus_card",
    oracle=f"""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len({_SQL_WORDS})) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           COUNT(DISTINCT sha256(text)) AS n_unique_texts
    FROM documents
    """,
    doc="Dataset-datasheet numbers in one scan: volume, vocabulary of "
    "provenance (langs/sources), and the exact-dup rate via distinct "
    "content hash — n_docs minus n_unique_texts is the dedup "
    "opportunity. Single aggregation, three distinct sub-aggregates "
    "(Spark expands to one partial-agg pass per distinct; all keyed, "
    "no driver work).",
    tags=("ext", "curation", "audit"),
)
def q117_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr(f"size({_WORDS})")).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.sha2("text", 256)).alias("n_unique_texts"),
    )


# --------------------------------------------------------------------------
# q118: per-key EMA via sequential fold
# --------------------------------------------------------------------------


# Shared by the query, its property tests, and the scale smoke — one
# definition of the fold, so a regression can't hide behind a stale copy.
# array_sort on the struct makes `value` the tertiary sort key after
# (ts, event_id); the DuckDB oracle orders by the same three keys so the
# fold sequence stays identical even if (ts, event_id) ever collides.
EMA_VALS_EXPR = (
    "transform(array_sort(collect_list(struct(ts, event_id, value))), r -> r.value)"
)
EMA_FOLD_EXPR = (
    "CASE WHEN size(_vals) = 1 THEN element_at(_vals, 1) "
    "ELSE aggregate(slice(_vals, 2, size(_vals) - 1), "
    "element_at(_vals, 1), (acc, x) -> 0.25D * x + 0.75D * acc) END"
)


def ema_plan(events: DataFrame) -> DataFrame:
    """The q118 plan over any (user_id, ts, event_id, value) frame —
    ONE definition shared by the registered query and the scale smoke
    (same contract as :func:`token_entropy_plan`)."""
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_obs"), F.expr(EMA_VALS_EXPR).alias("_vals"))
        .select("user_id", "n_obs", F.expr(EMA_FOLD_EXPR).alias("ema"))
    )


@query(
    "q118_ema_smoothing",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_obs,
           list_reduce(list(value ORDER BY ts, event_id, value),
                       (acc, x) -> 0.25::DOUBLE * x + 0.75::DOUBLE * acc)
             AS ema
    FROM events GROUP BY user_id
    """,
    doc="Exponential moving average y_t = 0.25*x_t + 0.75*y_(t-1) per "
    "series — the recursive smoother window frames cannot express "
    "(reference gold layer stops at simple MAs: "
    "docs/databricks_setup.md:216-226). Catalyst higher-order "
    "`aggregate` folds the (ts,event_id)-sorted series left-to-right; "
    "DuckDB's list_reduce runs the identical IEEE op sequence, so the "
    "raw doubles hash-match with no fixed-point fuzz. Memory is "
    "O(series length) per key — bounded for per-symbol bar series; "
    "for unbounded keys the applyInPandas route applies.",
    tags=("ext", "window", "fold"),
)
def q118_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ema_plan(_events(spark, sf_dir))
