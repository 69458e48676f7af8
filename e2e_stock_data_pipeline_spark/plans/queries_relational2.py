"""Second relational batch: date arithmetic (C10), multi-dimensional
aggregation (rollup), pivot-style conditional aggregation, file-
metadata lineage (S7), and approximate distinct (the at-scale variant
of A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables
from .registry import query

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


@query(
    "q32_ship_latency",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS BIGINT) AS total_lag_days,
           CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS DOUBLE) / COUNT(*) AS avg_lag_days,
           CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS INT) AS max_lag_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Date arithmetic (datediff) across a join, aggregated per priority (C10).",
    tags=("scalar", "date", "join", "agg"),
)
def q32_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    lag = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    cnt = F.count(F.lit(1))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            cnt.alias("n"),
            F.sum(lag).cast("bigint").alias("total_lag_days"),
            (F.sum(lag).cast("double") / cnt).alias("avg_lag_days"),
            F.max(lag).alias("max_lag_days"),
        )
    )


@query(
    "q33_rollup_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderstatus)
    """,
    doc="ROLLUP hierarchy aggregate (subtotals + grand total via grouping sets).",
    tags=("agg", "rollup"),
)
def q33_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
    )


@query(
    "q34_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_other
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot-style wide aggregation via conditional sums (portable across engines).",
    tags=("agg", "pivot"),
)
def q34_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def n(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    s = F.col("o_orderstatus")
    return o.groupBy("o_orderpriority").agg(
        n(s == "F", "n_f"),
        n(s == "O", "n_o"),
        n(s == "P", "n_p"),
        n(~s.isin("F", "O", "P"), "n_other"),
    )


@query(
    "q35_promo_revenue_share",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
            ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS promo_revenue,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="Conditional revenue share across a fact-dim join (TPC-H Q14 shape).",
    tags=("join", "agg", "tpch"),
)
def q35_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(16,4)"))
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


@query(
    "q36_file_lineage",
    oracle="""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS source_file, COUNT(*) AS n
    FROM read_parquet('/root/testdata/sf0.01/orders.parquet', filename=true)
    GROUP BY 1
    """,
    doc="File-metadata lineage column (S7: _metadata.file_path / Auto Loader "
    "_input_file). Oracle pinned to sf0.01 — the driver's correctness sf.",
    tags=("scan", "lineage"),
    pinned_sf_dir="/root/testdata/sf0.01",
)
def q36_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_raw: lineage must report the DELIVERED file, not the engine's
    # internal re-split cache layout.
    o = tables.load_raw(spark, sf_dir, "orders")
    base = F.regexp_extract(F.col("_metadata.file_path"), "([^/]+)$", 1)
    return o.select(base.alias("source_file")).groupBy("source_file").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q37_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct per group — the at-scale variant of A4's "
    "COUNT(DISTINCT). HLL sketches are engine-specific, so the raw approx "
    "value can't be oracle-compared; instead the row carries the exact "
    "count (oracle-checked) plus a boolean asserting the approx landed "
    "within 5% of it — deterministic on fixed data, so the driver hash "
    "is stable and the sketch path is still exercised. The sketch is "
    "configured at rsd=0.01, well inside the asserted 5% band: rsd is a "
    "STANDARD DEVIATION, not a bound, and the default-0.05 sketch "
    "actually missed 5% at sf0.1 (6.7% off at 1500 distinct — caught by "
    "the r7 cross-sf sweep; measured 0.5-0.7% at rsd=0.01 on both sfs).",
    tags=("agg", "approx"),
)
def q37_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two separate aggregates joined on the tiny group key, NOT one
    # mixed distinct+HLL agg: Spark's RewriteDistinctAggregates expands
    # the input and carries the non-distinct aggregate buffers through
    # the per-(group, user_id) first aggregate — at rsd=0.01 that is an
    # ~16 KB HLL register array PER DISTINCT PAIR (millions of buffers,
    # sort-based fallback; measured 43-65 s / 10.7 GB JVM RSS at sf10).
    # Split, the HLL buffer exists once per event_type and the distinct
    # side is a plain two-level hash agg: 45 -> ~6 s, same output.
    e = _t(spark, sf_dir, "events").select("event_type", "user_id")
    # NULL user_id must not count as a distinct user: COUNT(DISTINCT x)
    # (the oracle and the pre-split F.countDistinct) excludes NULLs, but
    # distinct().count() would keep the (event_type, NULL) row (r16
    # ADVICE — latent today, generators never emit NULL user_id).
    exact = (
        e.filter(F.col("user_id").isNotNull())
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    approx = F.approx_count_distinct("user_id", 0.01)
    rest = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), approx.alias("_approx")
    )
    return (
        # left join from the unfiltered side: an all-NULL group has no
        # exact row but COUNT(DISTINCT) semantics still report it with 0
        rest.join(exact, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("exact_users", F.lit(0)).alias("exact_users"),
            "n",
            (
                F.abs(F.col("_approx") - F.coalesce("exact_users", F.lit(0)))
                <= F.coalesce("exact_users", F.lit(0)) * F.lit(0.05)
            ).alias("approx_within_5pct"),
        )
    )
