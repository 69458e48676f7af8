"""Round-6 relational additions: the remaining classic TPC-H join/agg
shapes expressible over this testdata's schema (no partsupp table, no
l_shipmode/commit/receipt columns — Q11/Q12 have no faithful analog and
are deliberately absent):

* Q7  bilateral trade volume between two nations by ship year (q119);
* Q8  market share of one supplier-nation inside a region (q120);
* Q10 returned-item customer ranking, top 20 (q121);
* Q16 supplier breadth per part attribute group, with exclusion
  filters (q122) — partsupp replaced by the observed supplier-part
  pairs in lineitem.

All revenue math uses the repo's exact-decimal convention (DECIMAL
sums, cast to DOUBLE at the edge) so both engines agree bit-for-bit;
joins force-broadcast only the fixed-size dims (region, nation,
supplier) per the repo's BROADCAST_DIMS policy; customer and part grow
linearly with scale factor and are left to AQE's runtime size decision
(auto-broadcast at test scale, shuffle join at 100 TB).

Reference parity: the reference has no relational tier beyond its
price pipeline; these extend the engine's general-SQL surface
(SURVEY.md §2.5/§2.9 families) with the remaining canonical shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.fixedpoint import units
from ..sources import tables
from .registry import query

# exact-decimal revenue: DECIMAL(18,4) product, summed exactly, DOUBLE edge
_REV = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
# Narrow-scale revenue (precision 16, scale 4): SUM(_REV4) * 10000 is an
# exact BIGINT at any plausible sf — the fixed-point ratio path (q120).
_REV4 = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q119: TPC-H Q7 shape — bilateral trade volume between two nations
# --------------------------------------------------------------------------


@query(
    "q119_nation_trade_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_REV}) AS DOUBLE) AS volume,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    doc="TPC-H Q7 shape: shipping volume between NATION_1 and NATION_2 in "
    "both directions, per ship year. The two nation lookups broadcast "
    "(25 rows each, aliased independently); customer is left to AQE "
    "(linear-growth table); the disjunctive "
    "cross-nation predicate applies after both, exactly as Q7 demands. "
    "Fact-side shuffles only on the orders join key.",
    tags=("join", "agg", "tpch"),
)
def q119_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.sum(F.expr(_REV)).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q120: TPC-H Q8 shape — nation market share within a region
# --------------------------------------------------------------------------


@query(
    "q120_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_6' THEN {_REV4}
                              ELSE CAST(0 AS DECIMAL(16,4)) END) * 10000 AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM({_REV4}) * 10000 AS BIGINT) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region r ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    GROUP BY order_year
    """,
    doc="TPC-H Q8 shape: NATION_6's share of AMERICA-region STANDARD-part "
    "revenue per order year. Both sums run in exact BIGINT 1e-4-dollar "
    "units (the q01 fixed-point path) and only the final ratio casts "
    "to double: a decimal-sum-cast-to-double drifts 1 ulp between "
    "engines once the scaled sum passes 2^53 (caught at sf1 — DuckDB's "
    "decimal->double is a two-step int/10^s rounding, Spark's "
    "BigDecimal is correctly rounded; BIGINT->double rounds identically "
    "in both). int64 headroom: year-level unit sums ~1.5e13 at sf1 -> "
    "safe past sf100. Fixed dims (region/nation/supplier) broadcast; "
    "customer and part are AQE-sized (linear-growth tables); the part "
    "filter prunes before the join fan-out.",
    tags=("join", "agg", "tpch"),
)
def q120_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev_u = units("l_extendedprice") * (100 - units("l_discount"))  # 1e-4 units
    brazil_rev_u = F.when(F.col("supp_nation") == "NATION_6", rev_u).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            (
                F.sum(brazil_rev_u).cast("double") / F.sum(rev_u).cast("double")
            )
            .cast("double")
            .alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q121: TPC-H Q10 shape — returned-item customer ranking
# --------------------------------------------------------------------------


@query(
    "q121_returned_item_ranking",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, cn.n_name AS nation,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY c.c_custkey, c.c_name, nation
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to returns "
    "in one quarter. Exact-decimal revenue makes the DESC sort "
    "deterministic; c_custkey breaks any residual tie. The date "
    "predicate pushes to the orders scan before the fact join.",
    tags=("join", "agg", "topk", "tpch"),
)
def q121_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.expr(_REV)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q122: TPC-H Q16 shape — supplier breadth per part attribute group
# --------------------------------------------------------------------------


@query(
    "q122_parts_supplier_breadth",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (1, 4, 7)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape with partsupp replaced by the observed "
    "supplier-part pairs in lineitem: how many qualified suppliers "
    "ship each surviving (brand,type,size) group. Exclusion filters = "
    "one broadcast anti join (negative-balance suppliers, fixed dim) + "
    "AQE-sized part join + pushed "
    "part predicates; the only wide shuffle is the distinct-count "
    "aggregation key.",
    tags=("join", "agg", "anti", "tpch"),
)
def q122_parts_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin(1, 4, 7)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
