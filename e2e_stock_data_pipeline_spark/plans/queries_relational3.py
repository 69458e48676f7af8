"""Third relational batch: correlated-subquery decorrelation, time-based
RANGE window frames, and having-then-join-back — the remaining classic
query shapes the engine should answer (TPC-H Q17/Q18 forms; range
frames complete the §2.6 window surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import tables
from .registry import query

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


@query(
    "q38_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.4 * a.aq
    """,
    doc="Correlated scalar subquery (TPC-H Q17 shape), decorrelated into a "
    "per-key aggregate + join — the plan Catalyst produces for the "
    "subquery form, written explicitly so both engines match exactly.",
    tags=("join", "subquery", "agg", "tpch"),
)
def q38_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("aq")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty.withColumnRenamed("l_partkey", "ak"), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.4 * F.col("aq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias("avg_yearly")
        )
    )


@query(
    "q39_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
      COUNT(*) OVER w AS n_last_hour,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-based RANGE frame: per-row trailing 1h aggregate ordered by "
    "exact microsecond epoch (completes §2.6 — the reference uses only "
    "ROWS frames).",
    tags=("window", "range"),
)
def q39_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3600 * 1000000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_last_hour"),
    )


@query(
    "q52_big_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) >= 250
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice, b.total_qty
    FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
    """,
    doc="HAVING on an aggregate then join back to the fact (TPC-H Q18 shape).",
    tags=("join", "having", "agg", "tpch"),
)
def q52_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("tq_dec"))
        .filter(F.col("tq_dec") >= 250)
        .select("l_orderkey", F.col("tq_dec").cast("double").alias("total_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty"
    )


@query(
    "q57_quantity_quartiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated quartiles per group. Bit-exact across engines "
    "because l_quantity is integer-valued and quarter fractions of small "
    "ints are exactly representable, so both interpolation formulas agree.",
    tags=("agg", "percentile"),
)
def q57_quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.min("l_quantity").alias("qmin"),
        F.max("l_quantity").alias("qmax"),
    )


@query(
    "q61_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 20.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS bin_total
    FROM events
    GROUP BY event_type, CAST(floor(value / 20.0) AS BIGINT)
    """,
    doc="Fixed-width histogram per group (floor-binning; the distribution "
    "profile pass a data pipeline runs before choosing clip thresholds).",
    tags=("agg", "histogram"),
)
def q61_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    b = F.floor(F.col("value") / 20.0).cast("bigint")
    return (
        e.groupBy("event_type", b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("bin_total"),
        )
    )


@query(
    "q62_rich_inactive_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c.c_mktsegment
    """,
    doc="Scalar subquery threshold + anti join (TPC-H Q22 shape): "
    "above-average-balance customers with no recent orders.",
    tags=("join", "anti", "subquery", "agg", "tpch"),
)
def q62_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )


@query(
    "q63_nation_revenue_share",
    oracle="""
    WITH nat_rev AS (
      SELECT n.n_regionkey, n.n_name,
             SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS bal_dec
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT n_name, CAST(bal_dec AS DOUBLE) AS nation_bal,
           CAST(bal_dec AS DOUBLE)
             / CAST(SUM(bal_dec) OVER (PARTITION BY n_regionkey) AS DOUBLE) AS region_share
    FROM nat_rev
    """,
    doc="Window over an aggregated result: each nation's share of its "
    "region's balance (two-level aggregate -> analytic shape).",
    tags=("window", "agg", "join"),
)
def q63_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    nat = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(F.col("c_acctbal").cast(DEC)).alias("bal_dec"))
    )
    w = Window.partitionBy("n_regionkey")
    # the region total stays DECIMAL (exact, order-independent); a double
    # window sum would depend on per-partition summation order
    return nat.select(
        "n_name",
        F.col("bal_dec").cast("double").alias("nation_bal"),
        (F.col("bal_dec").cast("double") / F.sum("bal_dec").over(w).cast("double")).alias(
            "region_share"
        ),
    )


@query(
    "q64_acctbal_quartile_tiles",
    oracle="""
    SELECT tile, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS tile_total
    FROM (
      SELECT c_acctbal,
             CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS tile
      FROM customer
    ) t
    GROUP BY tile
    """,
    doc="NTILE bucketing (deterministic order) + per-tile aggregate, computed "
    "with the DISTRIBUTED global-rank operator (operators/ranking.py) — no "
    "single-partition window; semantics proven equal to SQL NTILE.",
    tags=("window", "ntile", "agg"),
)
def q64_acctbal_quartile_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_ntile

    c = _t(spark, sf_dir, "customer")
    tiles = global_ntile(
        c.select("c_acctbal", "c_custkey"),
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        4,
    )
    return tiles.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("tile_total"),
    )


@query(
    "q66_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS with a grouping-id disambiguator "
    "(status-only, priority-only, and grand-total groupings in one pass).",
    tags=("agg", "groupingsets"),
)
def q66_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [[F.col("o_orderstatus")], [F.col("o_orderpriority")], []],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total_price")
    )


@query(
    "q70_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_typed,
           CAST(json_extract(props, '$.k') AS INT) % 7 AS k_mod
    FROM events
    WHERE props IS NOT NULL AND event_id % 3 = 0
    """,
    doc="Typed schema-on-read: from_json materializes the payload into a "
    "struct and fields project out (the C6/C7 pattern with a declared "
    "schema instead of per-field string extraction).",
    tags=("json", "scalar"),
)
def q70_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        F.col("props").isNotNull() & (F.col("event_id") % 3 == 0)
    )
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        (parsed["k"] % 7).alias("k_mod"),
    )


@query(
    "q75_min_cost_supplier",
    oracle="""
    WITH eligible AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
             l.l_extendedprice / l.l_quantity AS unit_price
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size BETWEEN 40 AND 50
        AND l.l_quantity > 0
    ),
    ranked AS (
      SELECT *, MIN(unit_price) OVER (PARTITION BY p_partkey) AS min_price
      FROM eligible
    )
    SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal, n_name,
           min_price AS best_unit_price
    FROM ranked WHERE unit_price = min_price
    """,
    doc="TPC-H Q2 shape: correlated min-per-group over a 5-way join — for "
    "each sized part, the EUROPE supplier(s) achieving the minimum unit "
    "price, decorrelated into a partitioned window min (one shuffle on "
    "p_partkey; dims broadcast). MIN over double is order-independent, so "
    "both engines agree bitwise; the division uses the identical "
    "expression tree on both sides.",
    tags=("join", "subquery", "window", "tpch"),
)
def q75_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").between(40, 50))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    w = Window.partitionBy("p_partkey")
    ranked = eligible.withColumn("min_price", F.min("unit_price").over(w))
    return (
        ranked.filter(F.col("unit_price") == F.col("min_price"))
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
            F.col("min_price").alias("best_unit_price"),
        )
        .distinct()
    )


@query(
    "q76_bulk_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > CAST(45 AS DECIMAL(18,4))
    )
    AND s.s_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_6', 'NATION_9', 'NATION_11')
    )
    """,
    doc="TPC-H Q20 shape: nested semi-joins — suppliers who moved bulk "
    "volume (> 45 units per part over two years) of 'small%' parts, "
    "restricted to three nations. Both IN-subqueries become left-semi "
    "joins; the inner aggregate is decimal-exact so the HAVING threshold "
    "agrees across engines.",
    tags=("join", "semijoin", "subquery", "tpch"),
)
def q76_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_6", "NATION_9", "NATION_11")
    )
    bulk = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"), "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > F.lit(45).cast(DEC))
        .select("l_suppkey")
    )
    return (
        s.join(bulk, s.s_suppkey == bulk.l_suppkey, "leftsemi")
        .join(
            F.broadcast(n.select("n_nationkey")),
            s.s_nationkey == F.col("n_nationkey"),
            "leftsemi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "q77_sole_late_supplier",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    all_sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) me
    JOIN supplier s ON s.s_suppkey = me.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM all_sup o2
      WHERE o2.l_orderkey = me.l_orderkey AND o2.l_suppkey <> me.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l2
      WHERE l2.l_orderkey = me.l_orderkey AND l2.l_suppkey <> me.l_suppkey
    )
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="TPC-H Q21 shape: the only-late-supplier-on-a-multi-supplier-order "
    "pattern — one EXISTS (someone else supplied the order) and one NOT "
    "EXISTS (nobody else was late), both over the same fact, expressed as "
    "left-semi + left-anti self-joins on orderkey. 'Late' adapts to this "
    "schema as shipped > 90 days after the order date.",
    tags=("join", "semijoin", "antijoin", "subquery", "tpch"),
)
def q77_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r17 (guide §2.3/§2.4): the literal EXISTS/NOT-EXISTS translation
    # made FOUR data-sized shuffles of the fact (late distinct, all_sup
    # distinct, the semi self-join, the anti self-join), each carrying
    # (l_orderkey, l_suppkey). But both subqueries are per-ORDER
    # predicates over the same grouping: "another supplier exists" ==
    # n_suppliers >= 2, "no other late supplier" == n_late_suppliers
    # == 1 (me being late and the only late one). So: one lineitem x
    # orders join keyed on l_orderkey, then two nested aggregations
    # that REUSE the join's hash partitioning (HashPartitioning on
    # l_orderkey satisfies the (l_orderkey, l_suppkey) clustering, so
    # neither groupBy adds an exchange). The sole late supplier's
    # identity is max(suppkey | late) — unique when n_late == 1, so no
    # tiebreak ambiguity. Supplier-set equivalence vs the oracle's
    # un-joined all_sup: "me" rows come from the join, so me.l_orderkey
    # is always present in orders, and for such orderkeys every
    # lineitem row survives the inner join — identical per-order
    # supplier sets.
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    lo = l.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate").hint("merge"),
        l.l_orderkey == o.o_orderkey,
    )
    is_late_line = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(is_late_line, 1).otherwise(0)).alias("is_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    sole = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (
        sole.join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q78_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      )
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: customers richer than the positive-balance "
    "average with no order since 1998 — scalar-aggregate subquery (broadcast "
    "1-row cross join) + anti-join to the fact, grouped by nation. "
    "The average divides a decimal-exact sum once, so the threshold "
    "agrees bitwise across engines.",
    tags=("join", "antijoin", "subquery", "agg", "tpch"),
)
def q78_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")),
            c.c_custkey == o.o_custkey,
            "leftanti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q82_unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey % 500 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey % 500 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 500 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey % 500 = 0
    """,
    doc="Wide-to-long reshaping (DataFrame.unpivot / melt): four measure "
    "columns become (measure, val) rows — the inverse of q34's pivot, "
    "completing the reshape surface. Values pass through untouched, so "
    "both engines agree bitwise; the oracle spells it as the equivalent "
    "UNION ALL.",
    tags=("reshape", "unpivot"),
)
def q82_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "q83_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$.k') AS INT) BETWEEN 25 AND 75 AS k_mid,
           CAST(json_extract(props, '$.missing') AS INT) AS absent
    FROM events
    WHERE props IS NOT NULL AND event_id % 11 = 0
    """,
    doc="Semi-structured access through Spark 4's VARIANT type: parse_json "
    "once, then typed variant_get extraction (q70 is the schema-on-read "
    "from_json form; this is the schema-free binary-encoded form a 100 TB "
    "semi-structured column should use — parse once, prune fields at "
    "access time). Missing paths yield typed nulls via try_variant_get.",
    tags=("json", "variant", "scalar"),
)
def q83_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        F.col("props").isNotNull() & (F.col("event_id") % 11 == 0)
    )
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k"),
        k.between(25, 75).alias("k_mid"),
        F.try_variant_get(v, "$.missing", "int").alias("absent"),
    )


@query(
    "q92_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_day,
             CAST(FLOOR(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) / 7.0) AS INT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(date_trunc('week', cohort_day) AS DATE) AS cohort_week,
           week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention: each user's cohort is their first active "
    "day; the matrix counts distinct users active at each week offset per "
    "cohort week — the canonical product-analytics rollup. Integer day "
    "arithmetic end to end (the one division is over small exact ints, "
    "floored); the firsts aggregate and the activity join share the "
    "user_id shuffle.",
    tags=("agg", "cohort", "retention", "window"),
)
def q92_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7.0
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_trunc("week", F.col("cohort_day")).cast("date").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))


@query(
    "q94_ansi_safe_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / l_quantity AS unit_price,
           l_extendedprice / NULLIF(l_quantity - 17.0, 0.0) AS per_rest,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    doc="ANSI-mode error-safe arithmetic: Spark 4 runs with ANSI on, so "
    "plain division by zero and bad casts THROW — try_divide/try_cast "
    "give the null-on-error semantics ETL needs (div-by-zero rows and "
    "unparseable casts become typed nulls instead of job failures). The "
    "oracle spells the same semantics with NULLIF and TRY_CAST.",
    tags=("scalar", "ansi", "cast"),
)
def q94_ansi_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias("unit_price"),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.lit(17.0)
        ).alias("per_rest"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias("flag_as_int"),
    )


@query(
    "q95_market_hours",
    oracle="""
    WITH local AS (
      SELECT event_id, event_type,
             timezone('America/New_York', timezone('UTC', ts)) AS ny
      FROM events
    )
    SELECT CAST(EXTRACT(hour FROM ny) AS INT) AS ny_hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
    FROM local
    WHERE EXTRACT(isodow FROM ny) <= 5
      AND (EXTRACT(hour FROM ny) * 60 + EXTRACT(minute FROM ny)) >= 570
      AND (EXTRACT(hour FROM ny) * 60 + EXTRACT(minute FROM ny)) < 960
    GROUP BY 1
    """,
    doc="NYSE regular-hours filter: timestamps (stored naive-UTC) convert "
    "to America/New_York wall time — DST-correct via the timezone "
    "database, not a fixed offset — then filter to weekday 09:30-16:00 "
    "and roll up per local hour. The timezone conversion both engines "
    "agree on is the C2 policy (UTC storage, zone at the edge) applied "
    "to the reference's actual trading-calendar domain.",
    tags=("scalar", "timezone", "calendar", "agg"),
)
def q95_market_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    ny = F.from_utc_timestamp(F.col("ts").cast("timestamp"), "America/New_York")
    mins = F.hour(ny) * 60 + F.minute(ny)
    return (
        e.select("event_id", "event_type", ny.alias("ny"), mins.alias("mins"))
        .filter(
            (F.dayofweek("ny").isin(2, 3, 4, 5, 6))
            & (F.col("mins") >= 570)
            & (F.col("mins") < 960)
        )
        .groupBy(F.hour("ny").cast("int").alias("ny_hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
        )
    )
