"""Round-9 [EXT] tier, part 2: market-basket depth, feature binning,
graph similarity, and exact sampling allocation.

* q175 — frequent part TRIPLES (apriori's next rung past q138's
  pairs): the C(L,3) expansion happens inside each order's part array
  — bounded by order fan-out — instead of a three-way fact self-join.
* q176 — equi-depth decile binning audit: EXACT global deciles from
  the two-pass bucket histogram (no global sort), every row assigned
  its bin against the broadcast 9-boundary row, per-bin count/min/max
  — the feature-binning shape plus the proof its edges are exact.
* q177 — neighbor-set Jaccard over the co-purchase graph (the
  link-prediction / collaborative-filtering score): common neighbors
  via the wedge join on the materialized edge list, union by
  inclusion-exclusion, ppm fixed point.
* q178 — largest-remainder (Hamilton) allocation of a fixed sample
  budget across language strata: the EXACT integer apportionment a
  balanced-sampling curation step needs (floor shares + the L largest
  remainders get +1; sum(alloc) == budget by construction), all
  dimension-sized after one count aggregate.

House rules: identical aliases both engines, positive-integer
truncating division only, no data-sized global sort (q176's decile
edges come from the histogram plan; q178's ranking windows run on the
41-row language dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import copurchase_edges_plan, node_degrees
from ..sources import tables
from .queries_ext11 import exact_group_quantiles_plan
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


_P6 = 1_000_000


# --------------------------------------------------------------------------
# q175: frequent part triples (market-basket, apriori rung 3)
# --------------------------------------------------------------------------


def frequent_triples_plan(li: DataFrame) -> DataFrame:
    """(l_orderkey, l_partkey) basket rows -> deterministic top-25
    triples. Module-level so scripts/scale_smoke.py times the EXACT
    plan the registered query runs."""
    baskets = li.groupBy("l_orderkey").agg(
        F.array_distinct(F.sort_array(F.collect_list("l_partkey"))).alias("ps")
    )
    # r17 (guide §1.2 step 2, the q184 interpreted-lambda lesson): the
    # original expansion sliced the struct array TWICE per (x, y) pair
    # (each slice() allocates a copy) and then flatten(flatten(...))
    # copied every struct two more times — measured 13.2 s of pure
    # expansion CPU at sf10. Index sequences + element_at generate the
    # SAME i<j<k combinations of the same sorted distinct array (set-
    # identical triples, order irrelevant under the groupBy) while
    # allocating only small int sequences: expansion 13.2 -> 2.5 s,
    # full query 32.2 -> 19.2 s. All sequence() bounds are ascending
    # by construction (i <= L-2, j <= L-1, k <= L), so the
    # descending-sequence footgun can't fire; L < 3 short-circuits to
    # an empty array as before.
    triples = baskets.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ps) >= 3 THEN"
                " flatten(transform(sequence(1, size(ps) - 2), i ->"
                " flatten(transform(sequence(i + 1, size(ps) - 1), j ->"
                " transform(sequence(j + 1, size(ps)), k ->"
                " struct(element_at(ps, i) AS pa, element_at(ps, j) AS pb,"
                " element_at(ps, k) AS pc))))))"
                " ELSE CAST(array() AS ARRAY<STRUCT<pa BIGINT, pb BIGINT, pc BIGINT>>) END"
            )
        ).alias("tr")
    ).select("tr.pa", "tr.pb", "tr.pc")
    return (
        triples.groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "pa", "pb", "pc")
        .limit(25)
    )


@query(
    "q175_frequent_triples",
    # DuckDB's own list-lambda expansion (1-based indices), NOT a
    # transliteration of the Spark HOF. The textbook three-way
    # self-join oracle matches this bit-for-bit at sf0.001/sf0.01 but
    # takes 146 s at sf0.1 (vs 0.06 s here) — the same
    # oracle-cost-not-engine-cost shape as q163's quadratic NOT
    # EXISTS, resolved here by giving the oracle the linear
    # formulation instead of a baseline tag.
    oracle="""
    WITH b AS (
      SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
      FROM lineitem GROUP BY l_orderkey
    ),
    tr AS (
      SELECT unnest(flatten(flatten(list_transform(ps, (x, i) ->
          list_transform(ps[i+1:], (y, j) ->
          list_transform(ps[i+j+1:], z -> {'pa': x, 'pb': y, 'pc': z})))))) AS t
      FROM b
    )
    SELECT t.pa AS pa, t.pb AS pb, t.pc AS pc, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM tr GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, pa, pb, pc
    LIMIT 25
    """,
    doc="Frequent 3-itemsets (q138's pair mining one rung up): part "
    "triples sharing >= 2 orders, deterministic top-25. Engine side "
    "expands C(L,3) triples INSIDE each order's sorted distinct part "
    "array — bounded by per-order line count (<= ~7 -> <= 35 triples/"
    "order), one fact-table shuffle total — where the textbook "
    "three-way self-join shuffles the fact table three times and "
    "explodes quadratically (measured: 146 s in DuckDB at sf0.1 vs "
    "the array form's 0.06 s; both formulations verified identical at "
    "sf0.001/sf0.01). The scale contrast that makes apriori feasible "
    "on a 100 TB basket log.",
    tags=("join", "affinity", "apriori", "topk", "ext"),
)
def q175_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frequent_triples_plan(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )


# --------------------------------------------------------------------------
# q176: equi-depth decile binning audit (exact global deciles)
# --------------------------------------------------------------------------

_B_PS = (10, 20, 30, 40, 50, 60, 70, 80, 90)
_B_BUCKET = 500_000


@query(
    "q176_equi_depth_bins",
    oracle=f"""
    WITH v AS (
      SELECT CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pc
      FROM events
    ),
    pp AS (SELECT pc, CAST(COUNT(*) AS BIGINT) AS w FROM v GROUP BY pc),
    c AS (
      SELECT pc, w,
             SUM(w) OVER (ORDER BY pc) AS cw,
             SUM(w) OVER () AS tw
      FROM pp
    ),
    q AS (
      SELECT
        {", ".join(f"CAST(MIN(CASE WHEN 100 * cw >= {p} * tw THEN pc END) AS BIGINT) AS q_{p}" for p in _B_PS)}
      FROM c
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(pc) AS BIGINT) AS lo_fp,
           CAST(MAX(pc) AS BIGINT) AS hi_fp
    FROM (
      SELECT v.pc,
             CASE {" ".join(f"WHEN v.pc <= q.q_{p} THEN {p // 10}" for p in _B_PS)}
                  ELSE 10 END AS bin
      FROM v CROSS JOIN q
    )
    GROUP BY bin
    ORDER BY bin
    """,
    doc="Equi-depth decile binning with EXACT edges: global p10..p90 "
    "of the event value (lower-quantile definition, fixed point) come "
    "from the two-pass bucket histogram — exact global quantiles with "
    "NO global sort, the thing approx_percentile can't promise — then "
    "every row joins the broadcast 9-boundary row and lands in bin "
    "1..10; per-bin count/min/max prove the edges partition the "
    "domain. The single 'group' is the whole table, which is exactly "
    "the case where a sort-based exact quantile would be one task.",
    tags=("agg", "quantile", "binning", "twopass", "ext"),
)
def q176_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = e.select(
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("pc")
    )
    qt = exact_group_quantiles_plan(
        v.withColumn("g", F.lit("all")).withColumn("w", F.lit(1).cast("bigint")),
        "g",
        _B_PS,
        bucket=_B_BUCKET,
    ).drop("g", "tw")
    bin_expr = F.lit(10).cast("int")
    for p in reversed(_B_PS):
        bin_expr = F.when(F.col("pc") <= F.col(f"q_{p}"), p // 10).otherwise(bin_expr)
    return (
        v.crossJoin(F.broadcast(qt))
        .select("pc", bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("pc").cast("bigint").alias("lo_fp"),
            F.max("pc").cast("bigint").alias("hi_fp"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# q177: neighbor-set Jaccard over the co-purchase graph
# --------------------------------------------------------------------------


@query(
    "q177_neighbor_jaccard",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e AS (SELECT pa, pb FROM pairs WHERE n >= 2),
    adj AS (SELECT pa AS x, pb AS y FROM e UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY x),
    common AS (
      SELECT a1.y AS pa, a2.y AS pb, CAST(COUNT(*) AS BIGINT) AS c
      FROM adj a1 JOIN adj a2 ON a1.x = a2.x AND a1.y < a2.y
      GROUP BY 1, 2
    )
    SELECT c.pa, c.pb, c.c AS n_common,
           CAST(({_P6} * c.c) // (da.d + db.d - c.c) AS BIGINT) AS jaccard_fp
    FROM common c
    JOIN deg da ON da.x = c.pa
    JOIN deg db ON db.x = c.pb
    ORDER BY jaccard_fp DESC, c.pa, c.pb
    LIMIT 25
    """,
    doc="Top-25 part pairs by neighbor-set Jaccard on the co-purchase "
    "graph — the classic link-prediction / item-item collaborative "
    "signal: |N(a) & N(b)| / |N(a) | N(b)| in ppm, union via "
    "inclusion-exclusion (da + db - common). Common-neighbor counts "
    "come from the wedge self-join on the ONCE-materialized edge list "
    "(copurchase_edges_plan): the fact table is shuffled once to build "
    "edges, and every subsequent join runs on the graph-sized frame. "
    "Deterministic tie-break (pa, pb).",
    tags=("graph", "similarity", "join", "topk", "ext"),
)
def q177_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges_plan(li)
    adj = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y")).unionAll(
        edges.select(F.col("pb").alias("x"), F.col("pa").alias("y"))
    )
    deg = node_degrees(edges)
    a1 = adj.select("x", F.col("y").alias("pa"))
    a2 = adj.select("x", F.col("y").alias("pb"))
    common = (
        a1.join(a2, "x")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    da = deg.select(F.col("x").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("x").alias("pb"), F.col("d").alias("db"))
    return (
        common.join(da, "pa")
        .join(db, "pb")
        .select(
            "pa",
            "pb",
            "n_common",
            F.expr(f"CAST(({_P6} * n_common) DIV (da + db - n_common) AS BIGINT)")
            .alias("jaccard_fp"),
        )
        .orderBy(F.col("jaccard_fp").desc(), "pa", "pb")
        .limit(25)
    )


# --------------------------------------------------------------------------
# q178: largest-remainder (Hamilton) stratified sample allocation
# --------------------------------------------------------------------------

_BUDGET = 10_000


@query(
    "q178_strat_allocation",
    oracle=f"""
    WITH n AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM n),
    shares AS (
      SELECT lang, n_docs,
             CAST(({_BUDGET} * n_docs) // total AS BIGINT) AS floor_alloc,
             CAST(({_BUDGET} * n_docs) % total AS BIGINT) AS remainder
      FROM n CROSS JOIN tot
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY remainder DESC, lang) AS rk,
             CAST({_BUDGET} - SUM(floor_alloc) OVER () AS BIGINT) AS leftover
      FROM shares
    )
    SELECT lang, n_docs, floor_alloc, remainder,
           CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    ORDER BY lang
    """,
    doc=f"Largest-remainder (Hamilton) apportionment of a fixed "
    f"{_BUDGET}-doc sample budget across language strata, proportional "
    "to stratum size: floor shares first, then the leftover seats go "
    "to the largest remainders (ties to lang ascending) — "
    "sum(alloc) == budget EXACTLY, the integer guarantee a balanced "
    "sampling step needs and that float-rounding allocation cannot "
    "give. Everything after the one count aggregate is the 41-row "
    "language dimension (the ranking window included).",
    tags=("agg", "sampling", "allocation", "curation", "ext"),
)
def q178_strat_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = n.agg(F.sum("n_docs").cast("bigint").alias("total"))
    shares = n.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"CAST(({_BUDGET} * n_docs) DIV total AS BIGINT)").alias("floor_alloc"),
        F.expr(f"CAST(({_BUDGET} * n_docs) % total AS BIGINT)").alias("remainder"),
    )
    wr = Window.orderBy(F.col("remainder").desc(), "lang")
    ranked = shares.select(
        "*",
        F.row_number().over(wr).alias("rk"),
        (F.lit(_BUDGET) - F.sum("floor_alloc").over(Window.partitionBy()))
        .cast("bigint")
        .alias("leftover"),
    )
    return ranked.select(
        "lang",
        "n_docs",
        "floor_alloc",
        "remainder",
        (
            F.col("floor_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    ).orderBy("lang")
