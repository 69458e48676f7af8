"""Relational query inventory: scans, filters, projections, aggregates,
joins, set ops, top-k (SURVEY.md §2.1, §2.3, §2.5, §2.7–2.9).

Numeric-parity convention: every money-style SUM goes through DECIMAL
(exact in both Spark and DuckDB — the inputs have <= 2 decimal places)
and the final column is cast to DOUBLE, so value hashes match bit-for-
bit. AVGs are computed as exact-decimal SUM divided by COUNT in double
space — one double division of identical operands is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.fixedpoint import units
from ..functions.hashing import canonical_sha256, canonical_sha256_sql
from ..sources import tables
from .registry import query

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


def dec(c):
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


# --------------------------------------------------------------------------
# Q1 family — scan + filter + hash aggregate (reference Silver/monitoring
# aggregates, docs/databricks_setup.md:302-328; shape of TPC-H Q1).
# --------------------------------------------------------------------------


def _units_double(dec_sum, scale: int):
    """Decimal sum -> double via exact int64 units: DECIMAL->DOUBLE casts
    diverge between engines by 1 ULP once the scaled payload crosses 2^53
    (found at sf1 by the r8s2 sweep on q01's sum_charge); BIGINT->DOUBLE
    is correctly rounded in both, and the final /10^scale sees identical
    operands, so the result is bit-identical at any magnitude int64 holds
    (sf100+ for these sums)."""
    return (dec_sum * (10**scale)).cast("bigint").cast("double") / float(10**scale)


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: full-scan filtered hash aggregate with exact decimal math.",
    tags=("agg", "scan", "tpch"),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    # All-int64 hot path (r9): every input has <= 2 decimal places, so
    # unit extraction recovers exact fixed-point integers per row, and
    # every SUM is a plain long add in whole-stage codegen instead of
    # Spark's widened-decimal accumulator (which goes non-compact past
    # precision 18 and costs ~2x; measured sf1: 1.17 s -> 0.6 s). r11:
    # extraction itself moved from per-row BigDecimal casts to
    # fixedpoint.units (rint in codegen) — measured 5.5x faster on the
    # sf10 scan (3.6 s -> 0.66 s for the 4 extractions), bit-equal on
    # all 60M rows. The group sums are the SAME integers the oracle's
    # CAST(SUM(DECIMAL)*10^k AS BIGINT) produces, and the final
    # units->double->/10^k ops are identical in both engines, so results
    # stay bit-identical (verified sf0.001..sf1 + sf10). int64 headroom:
    # charge units peak ~1.1e11/row -> safe to ~sf10; past that move the
    # unit extraction to 1e2 scale or back to decimal sums.
    price_u = units("l_extendedprice")
    disc_u = units("l_discount")
    tax_u = units("l_tax")
    qty_u = units("l_quantity")
    dp_u = price_u * (100 - disc_u)  # disc_price in 1e-4 units
    ch_u = dp_u * (100 + tax_u)  # charge in 1e-6 units
    cnt = F.count(F.lit(1))
    grouped = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_u) * 100).alias("_qty_u4"),
            (F.sum(price_u) * 100).alias("_price_u4"),
            F.sum(dp_u).alias("_dp_u4"),
            F.sum(ch_u).alias("_ch_u6"),
            (F.sum(disc_u) * 100).alias("_disc_u4"),
            cnt.alias("count_order"),
        )
    )
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_qty_u4").cast("double") / 1e4).alias("sum_qty"),
        (F.col("_price_u4").cast("double") / 1e4).alias("sum_base_price"),
        (F.col("_dp_u4").cast("double") / 1e4).alias("sum_disc_price"),
        (F.col("_ch_u6").cast("double") / 1e6).alias("sum_charge"),
        (F.col("_qty_u4").cast("double") / 1e4 / F.col("count_order")).alias("avg_qty"),
        (F.col("_price_u4").cast("double") / 1e4 / F.col("count_order")).alias(
            "avg_price"
        ),
        (F.col("_disc_u4").cast("double") / 1e4 / F.col("count_order")).alias(
            "avg_disc"
        ),
        "count_order",
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
      AND l_discount >= 0.05
      AND l_quantity < 25
    """,
    doc="Projection + conjunctive predicate; filters and pruning reach the scan (P1-P3).",
    tags=("scan", "filter"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 25)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) * 100000000 AS BIGINT) AS DOUBLE) / 100000000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="Pure filter + scalar aggregate (TPC-H Q6 shape).",
    tags=("agg", "filter", "tpch"),
    bench=True,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # price_cents * disc_cents = revenue in 1e-4 units; the /1e4
            # division sees the same rational the oracle's int/1e8 does,
            # so the double is bit-identical (fixedpoint.units notes).
            (
                F.sum(units("l_extendedprice") * units("l_discount")).cast("double")
                / 1e4
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Join family (SURVEY.md §2.9) — the reference implies joins (Gold feature
# layer combining prices x treasury x fundamentals); here the full Spark
# join surface over the star schema. Small dims are broadcast explicitly.
# --------------------------------------------------------------------------


@query(
    "q03_top_unshipped_revenue",
    oracle="""
    SELECT
      o.o_orderkey,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + deterministic top-k (TPC-H Q3 shape).",
    tags=("join", "agg", "topk", "tpch"),
    bench=True,
)
def q03_top_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r9 shape: (1) pre-aggregate lineitem revenue by l_orderkey BEFORE
    # any join — the GROUP BY keys (o_orderkey, o_orderdate,
    # o_orderpriority) are functionally dependent on the orders PK, so
    # aggregating first is exact and moves the hash-agg below the join
    # where partial aggregation collapses it map-side; (2) reduce orders
    # with the customer-segment semi side FIRST so the broadcast build is
    # ~segment-fraction of filtered orders (~1/5) instead of all of them.
    # Measured sf1: 1.21 s -> 0.78 s, plan has ONE data-sized exchange.
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    oc = F.broadcast(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    rev_u = units("l_extendedprice") * (100 - units("l_discount"))  # 1e-4 units
    per_order = l.groupBy("l_orderkey").agg(F.sum(rev_u).alias("_rev_u"))
    return (
        per_order.join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            (F.col("_rev_u").cast("double") / 1e4).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q05_region_revenue",
    oracle="""
    SELECT
      n.n_name,
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="6-way star join with broadcast dims (TPC-H Q5 shape).",
    tags=("join", "agg", "broadcast", "tpch"),
    bench=True,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 shape (same move as q03): the date filter keeps ~15% of orders
    # and the region filter ~20% of customers, so orders-join-customer
    # reduces to a 2-column (o_orderkey, c_nationkey) build side (~450k
    # rows at sf10) that broadcasts — the lineitem fact is probed in
    # place with ZERO fact-sized shuffles (was l-SMJ-o over all 60M rows
    # at sf10: 61+47 core-s of shuffle stages). Customer itself stays
    # shuffle-joined inside the build (both sides order-of-n_cust);
    # supplier/nation/region are fixed or sublinear dims. At sf100 the
    # build is ~4.4M 12-byte rows — tens of MB, still broadcast
    # territory; past that, drop the hint and AQE re-plans the probe
    # as SMJ.
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # The region predicate reaches CUSTOMER through c_nationkey ==
    # s_nationkey (supplier nation == customer nation == ASIA), so
    # filtering customers to ASIA nations first is exact and shrinks the
    # broadcast build another 5x (2.25M -> ~450k rows at sf10 — the
    # driver collect+rebroadcast was 2.4 s of inter-job gap before).
    # The two uses of the ASIA nation set carry DISJOINT aliased columns
    # (the loader caches table frames, so raw reuse is a self-join).
    asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    cust_keys = F.broadcast(asia.select(F.col("n_nationkey").alias("_ck")))
    supp_nations = F.broadcast(
        asia.select(F.col("n_nationkey").alias("_sk"), "n_name")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(cust_keys, F.col("c_nationkey") == F.col("_ck"))
        .select("c_custkey", "c_nationkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    # Hint the customer side too: with both hints static, Catalyst plans
    # the whole build as a broadcast chain up front — under AQE an
    # unhinted o-join-c first MATERIALIZES both shuffle sides as query
    # stages before converting to BHJ, which cost ~2 s of stage
    # boundaries + a 12-core-s orders shuffle write at sf10 (profiled:
    # 9 jobs/1.8 s gaps -> 6 jobs/0.4 s gaps).
    oc = F.broadcast(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_nationkey"
        )
    )
    l = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    rev_u = units("l_extendedprice") * (100 - units("l_discount"))  # 1e-4 units
    return (
        l.join(oc, l.l_orderkey == oc.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey))
        .join(supp_nations, F.col("s_nationkey") == F.col("_sk"))
        .groupBy("n_name")
        # BIGINT unit sums + final /1e4: the old decimal-sum->double cast
        # is the q120 2^53 ulp hazard at nation-level magnitudes (sf10+).
        .agg((F.sum(rev_u).cast("double") / 1e4).alias("revenue"))
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="Left-semi join (EXISTS) + agg (TPC-H Q4 shape).",
    tags=("join", "semi", "agg", "tpch"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r17 (guide §2.3, §3.1): the direct semi join made Catalyst
    # broadcast the ENTIRE lineitem side (only o_orderkey is an equi
    # key; the shipdate bound is a join condition, so nothing prunes
    # the build side) — a 60M-row HashedRelation at sf10, the same
    # static-giant-broadcast class as the r16 q86/q126 flake. Instead:
    # (a) pre-filter lineitem to l_shipdate > window start — rows at or
    # below it can never beat an in-window o_orderdate, and the
    # predicate reaches the parquet scan; (b) aggregate to one
    # max(l_shipdate) row per orderkey BEFORE the shuffle (EXISTS(ship
    # > date) == max(ship) > date; partial map-side agg collapses the
    # 4-rows-per-key fact); (c) merge-hint the semi join so neither
    # side is ever a data-sized broadcast.
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    lx = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    return (
        o.join(
            lx.hint("merge"),
            (o.o_orderkey == lx.l_orderkey) & (lx.max_ship > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q07_parts_never_ordered",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS part_count
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    GROUP BY p.p_brand
    """,
    doc="Left-anti join (NOT EXISTS) + agg.",
    tags=("join", "anti", "agg"),
)
def q07_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r17 (guide §2.3 "aggregate before you shuffle", §3.1): anti-join
    # membership only needs the DISTINCT l_partkey set. Catalyst
    # planned the raw form as BroadcastHashJoin LeftAnti over the
    # ENTIRE 60M-row lineitem key column — a data-sized HashedRelation
    # that grows with the fact table (the q04/q86/q126 static-giant-
    # broadcast class, winning only by GC timing at the heap edge).
    # Deduping first bounds the build side at |part| (~2M at sf10,
    # 30x fewer entries), and the distinct's partial map-side
    # aggregation collapses most duplicates before its exchange.
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("part_count"))
    )


@query(
    "q08_richer_customers_theta",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_richer_customers
    FROM supplier s
    JOIN customer c ON c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="Non-equi (theta) inequality-COUNT join, decomposed to linear "
    "work (r11): the broadcast-nested-loop form streams |S|x|C| pairs "
    "through the aggregate — 75B hash-agg probes at sf10 (timed out the "
    "execution smoke), quadratic at any scale. Instead: bucket both "
    "sides on 256-cent fixed-point balance ranges, count customers per "
    "bucket, suffix-sum the dimension-sized histogram (<=4.4k rows) for "
    "the strictly-higher-bucket mass, and resolve ties inside the ONE "
    "shared bucket with a bounded same-bucket join — work is "
    "|S|+|C|+sum_b(s_b*c_b), never |S|x|C| (the q186 decomposition "
    "principle applied to one-sided inequalities). Oracle stays the "
    "textbook quadratic theta join (exact at the gate sfs; at sf10 the "
    "window-frame formulation verifies it — BENCH_NOTES r11).",
    tags=("join", "theta"),
)
def q08_richer_customers_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    shift, width = 100_000, 256  # cents; shift lifts balances >= 0
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        (units("s_acctbal") + shift).alias("sv"),
    )
    c = _t(spark, sf_dir, "customer").select(
        (units("c_acctbal") + shift).alias("cv")
    )
    cb = c.select(F.expr(f"cv DIV {width}").alias("b"), "cv")
    sb = s.select("s_suppkey", "s_name", "sv", F.expr(f"sv DIV {width}").alias("b"))
    hist = cb.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    # supplier buckets with no customers still need their suffix mass:
    # union them in at n=0 before the (dimension-sized) suffix window
    all_b = hist.select("b").union(sb.select("b")).distinct()
    hist_full = all_b.join(hist, "b", "left").select(
        "b", F.coalesce("n", F.lit(0)).alias("n")
    )
    wdesc = Window.orderBy(F.desc("b")).rowsBetween(Window.unboundedPreceding, -1)
    suffix = hist_full.select(
        "b", F.coalesce(F.sum("n").over(wdesc), F.lit(0)).alias("n_gt_bucket")
    )
    # same-bucket strict-inequality correction: bounded by bucket width
    corr = (
        sb.join(cb, "b")
        .filter(F.col("cv") > F.col("sv"))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_same"))
    )
    return (
        sb.join(F.broadcast(suffix), "b")
        .join(corr, "s_suppkey", "left")
        .select(
            "s_suppkey",
            "s_name",
            (F.col("n_gt_bucket") + F.coalesce("n_same", F.lit(0))).alias(
                "n_richer_customers"
            ),
        )
        .filter(F.col("n_richer_customers") > 0)  # oracle's INNER JOIN drops zeros
    )


@query(
    "q09_nation_customer_rollcall",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(c.c_custkey) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Broadcast dim-dim join + left outer join + agg (C11 calendar-join analog).",
    tags=("join", "outer", "broadcast"),
)
def q09_nation_customer_rollcall(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Monitoring / data-quality aggregates (reference notebook cell-3 checks and
# docs/databricks_setup.md:302-328).
# --------------------------------------------------------------------------


@query(
    "q10_group_having_dupes",
    oracle="""
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    HAVING COUNT(*) > 1
    """,
    doc="Duplicate detection: groupBy count + HAVING filter (A2/P6; reference "
    "docs/databricks_setup.md:315-319, bronze_fundamentals notebook cell-3).",
    tags=("agg", "having", "quality"),
)
def q10_group_having_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey"), F.col("o_orderdate").cast("date").alias("order_day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "q11_null_audit",
    oracle="""
    SELECT
      CAST(SUM(CAST(event_id IS NULL AS INT)) AS BIGINT) AS null_event_id,
      CAST(SUM(CAST(ts IS NULL AS INT)) AS BIGINT) AS null_ts,
      CAST(SUM(CAST(user_id IS NULL AS INT)) AS BIGINT) AS null_user_id,
      CAST(SUM(CAST(value IS NULL AS INT)) AS BIGINT) AS null_value,
      CAST(SUM(CAST(props IS NULL AS INT)) AS BIGINT) AS null_props,
      COUNT(*) AS total_rows
    FROM events
    """,
    doc="Per-column null audit via conditional aggregation (A3; reference "
    "bronze_fundamentals_auto_loader.ipynb:cell-3).",
    tags=("agg", "quality"),
)
def q11_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.col(c).isNull().cast("int")).alias(f"null_{c}")
        for c in ["event_id", "ts", "user_id", "value", "props"]
    ]
    return e.agg(*aggs, F.count(F.lit(1)).alias("total_rows"))


@query(
    "q12_completeness_check",
    oracle="""
    SELECT o_custkey,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_order_days,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    doc="MIN/MAX/COUNT DISTINCT per group completeness check (A4; reference "
    "docs/databricks_setup.md:322-328).",
    tags=("agg", "distinct", "quality"),
)
def q12_completeness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_order_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q13_topk_active_users",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 20
    """,
    doc="Top-k with deterministic tiebreak (O3; reference top-symbols query: "
    "bronze_fundamentals_auto_loader.ipynb:cell-3).",
    tags=("agg", "topk"),
)
def q13_topk_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(20)
    )


@query(
    "q14_distinct_days",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_day
    FROM orders
    ORDER BY order_day
    """,
    doc="Distinct-key extraction for partition enumeration (A6).",
    tags=("distinct",),
)
def q14_distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_orderdate").cast("date").alias("order_day"))
        .distinct()
        .orderBy("order_day")
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY.md §2.8) and union (U1).
# --------------------------------------------------------------------------


@query(
    "q15_union_event_slices",
    oracle="""
    SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM (
      SELECT * FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT * FROM events WHERE event_type = 'purchase'
    ) u
    GROUP BY event_type
    """,
    doc="Vertical union of homogeneous slices then agg (U1: pl.concat analog).",
    tags=("union", "agg"),
)
def q15_union_event_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    u = e.filter(F.col("event_type") == "click").unionByName(
        e.filter(F.col("event_type") == "purchase")
    )
    return u.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@query(
    "q16_intersect_repeat_buyers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'
    """,
    doc="INTERSECT: customers ordering in both years.",
    tags=("setop",),
)
def q16_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y99 = o.filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
    ).select("o_custkey")
    y00 = o.filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp_ntz"))
    ).select("o_custkey")
    return y99.intersect(y00)


@query(
    "q17_except_lapsed_buyers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
    doc="EXCEPT: early customers who disappeared.",
    tags=("setop",),
)
def q17_except_lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")).select(
        "o_custkey"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")).select(
        "o_custkey"
    )
    return early.subtract(late)


# --------------------------------------------------------------------------
# Column derivation / casts / scalar functions (SURVEY.md §2.4) and the
# canonical content hash (C5).
# --------------------------------------------------------------------------


@query(
    "q18_normalize_casts",
    oracle="""
    SELECT
      o_orderkey,
      upper(trim(o_orderstatus)) AS status_norm,
      CAST(o_orderdate AS DATE) AS order_day,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(month(o_orderdate) AS INT) AS order_month,
      CAST(trunc(o_totalprice) AS BIGINT) AS price_long,
      CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      concat('ORD-', CAST(o_orderkey AS VARCHAR)) AS order_tag
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="Cast/normalize battery: trim/upper, date parts, numeric casts (C1-C4, C9-C10).",
    tags=("scalar", "cast"),
)
def q18_normalize_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.upper(F.trim(F.col("o_orderstatus"))).alias("status_norm"),
        F.col("o_orderdate").cast("date").alias("order_day"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.col("o_totalprice").cast("bigint").alias("price_long"),
        F.floor(F.col("o_totalprice")).alias("price_floor"),
        F.concat(F.lit("ORD-"), F.col("o_orderkey").cast("string")).alias("order_tag"),
    )


@query(
    "q19_content_hash",
    oracle=f"""
    SELECT
      o_orderkey,
      {canonical_sha256_sql("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")} AS row_hash
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    doc="Canonical SHA-256 content hash as a Catalyst expression (C5: file_hash/payload hash).",
    tags=("scalar", "hash"),
)
def q19_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        canonical_sha256("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority").alias(
            "row_hash"
        ),
    )


@query(
    "q20_json_extract",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
    doc="Schema-on-read JSON field extraction + agg (C6/C7: payload get pattern).",
    tags=("json", "agg"),
)
def q20_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )
