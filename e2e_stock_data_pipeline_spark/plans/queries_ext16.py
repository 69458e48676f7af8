"""Round-10 [EXT] tier: curation selection and resampling statistics.

* q187 — greedy maximum-coverage selection (the submodular curation
  primitive: "which k customers' baskets cover the most distinct
  parts"): k rounds of one aggregation + broadcast anti-join each, k
  driver rows total (operators/coverage.py). Oracle: the SAME greedy
  unrolled into k chained CTEs (precedent: the unrolled-CC oracles).
* q188 — Theil-Sen robust trend per user: the median of pairwise
  slopes over per-DAY aggregates. The day aggregation bounds the pair
  count (C(n_days,2), n_days <= calendar span) and the pairs are
  generated INSIDE a per-user array — no self-join, no shuffle beyond
  the two keyed aggregations; slopes are exact int64 ppm
  (sign-decomposed division, identical in both engines).
* q189 — deterministic Poisson bootstrap CI for mean order value per
  segment: B=40 replicates; the Poisson(1) weight of (order, b) comes
  from a 31-bit LCG on o_orderkey*B+b mapped through the integer-
  scaled Poisson CDF — bit-identical in both engines (no RNG, no
  float CDF). Map-side combine reduces the exploded B-fold rows to
  |segments| x B partial sums before the only shuffle.

House rules: identical aliases both engines, every division
sign-decomposed or NULL-guarded, all arithmetic int64 with documented
headroom, no row UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.coverage import greedy_max_coverage
from ..sources import tables
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


def _sdiv(num: str, den: str) -> str:
    """Sign-decomposed truncating integer division (Spark SQL)."""
    return (
        f"CASE WHEN {den} = 0 THEN NULL"
        f" WHEN {num} < 0 THEN -((-({num})) DIV ({den}))"
        f" ELSE ({num}) DIV ({den}) END"
    )


def _sdiv_duck(num: str, den: str) -> str:
    return (
        f"CASE WHEN {den} = 0 THEN NULL"
        f" WHEN {num} < 0 THEN -((-({num})) // ({den}))"
        f" ELSE ({num}) // ({den}) END"
    )


# --------------------------------------------------------------------------
# q187: greedy max-coverage (customers covering distinct parts), k=5
# --------------------------------------------------------------------------

_K_COVER = 5


def _cover_oracle(k: int) -> str:
    """The greedy algorithm unrolled into k chained CTE rounds.

    Every CTE is MATERIALIZED: c{r} references c{r-1} twice (carry +
    anti-join), so inlined CTEs would re-expand the whole prefix tree
    ~2x per round (measured: 78 GB of DuckDB spill at sf1 before the
    hint; seconds after)."""
    parts = [
        """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS s, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    rem1 AS (SELECT * FROM pairs),
    r1 AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM rem1
           GROUP BY s ORDER BY n DESC, s ASC LIMIT 1),
    c1 AS MATERIALIZED (SELECT DISTINCT p.i FROM rem1 p JOIN r1 ON p.s = r1.s)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""",
    rem{r} AS MATERIALIZED (
      SELECT p.s, p.i FROM pairs p ANTI JOIN c{r - 1} c ON p.i = c.i),
    r{r} AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM rem{r}
             GROUP BY s HAVING COUNT(*) > 0 ORDER BY n DESC, s ASC LIMIT 1),
    c{r} AS MATERIALIZED (SELECT i FROM c{r - 1}
             UNION SELECT DISTINCT p.i FROM rem{r} p JOIN r{r} ON p.s = r{r}.s)"""
        )
    sel = "\n      UNION ALL ".join(
        f"SELECT {r} AS pick_order, s AS c_custkey, n AS new_items FROM r{r}"
        for r in range(1, k + 1)
    )
    parts.append(
        f""",
    picks AS (
      {sel}
    )
    SELECT pick_order, c_custkey, new_items,
           CAST(SUM(new_items) OVER (ORDER BY pick_order) AS BIGINT)
             AS covered_total
    FROM picks ORDER BY pick_order"""
    )
    return "".join(parts)


@query(
    "q187_greedy_coverage",
    oracle=_cover_oracle(_K_COVER),
    doc="Greedy maximum-coverage selection: the 5 customers whose order "
    "baskets greedily cover the most distinct parts (submodular "
    "curation — 'which k sources to keep for maximal diversity'). Each "
    "round scans the remaining (customer, part) pairs once, removes "
    "covered parts by broadcast anti-join, and collects exactly ONE "
    "argmax row to the driver (ties: smallest custkey). The covered "
    "set is bounded by k * max-basket and is localCheckpointed per "
    "round. Oracle: the identical greedy unrolled into 5 chained CTE "
    "rounds. Output ordered by pick_order.",
    tags=("iterative", "curation", "coverage", "ext"),
)
def q187_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("c_custkey"), F.col("l_partkey")
    )
    return greedy_max_coverage(
        pairs, "c_custkey", "l_partkey", _K_COVER
    ).orderBy("pick_order")


# --------------------------------------------------------------------------
# q188: Theil-Sen robust trend per user (median of pairwise daily slopes)
# --------------------------------------------------------------------------

_TS_MIN_DAYS = 5
_EPOCH = "DATE '2024-01-01'"


@query(
    "q188_theilsen_trend",
    oracle=f"""
    WITH daily AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) - {_EPOCH} AS BIGINT) AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    eligible AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY user_id HAVING COUNT(*) >= {_TS_MIN_DAYS}
    ),
    slopes AS (
      SELECT a.user_id,
             {_sdiv_duck("(b.v - a.v) * 1000000", "b.d - a.d")} AS slope
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND b.d > a.d
      WHERE a.user_id IN (SELECT user_id FROM eligible)
    ),
    ranked AS (
      SELECT user_id, slope,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slope) AS r,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS m
      FROM slopes
    ),
    med AS (
      SELECT user_id, m AS n_pairs,
             CASE WHEN m % 2 = 1
               THEN MAX(CASE WHEN r = (m + 1) // 2 THEN slope END)
               ELSE {_sdiv_duck(
                 "MAX(CASE WHEN r = m // 2 THEN slope END)"
                 " + MAX(CASE WHEN r = m // 2 + 1 THEN slope END)",
                 "2",
               )}
             END AS theilsen_ppm
      FROM ranked GROUP BY user_id, m
    )
    SELECT e.user_id, e.n_days, med.n_pairs, med.theilsen_ppm
    FROM eligible e JOIN med ON e.user_id = med.user_id
    ORDER BY e.user_id
    """,
    doc="Theil-Sen robust trend slope per user: the MEDIAN of all "
    "pairwise slopes between per-day spend aggregates (cents-ppm per "
    "day, exact int64, sign-decomposed division). The per-day "
    "pre-aggregation bounds pairs at C(n_days,2) <= C(31,2)=465 per "
    "user, so the pairs are generated INSIDE the per-user sorted "
    "array (transform x transform + flatten) — no self-join, no "
    "window over data-sized frames; the only shuffles are the two "
    "keyed aggregations. Median of the sorted slope array: middle "
    "element (odd) or the sign-decomposed half-sum of the two middles "
    "(even) — identical selection in the oracle via ROW_NUMBER. Users "
    "with >= 5 distinct active days.",
    tags=("robust", "regression", "pairwise", "array", "ext"),
)
def q188_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id", F.to_date("ts").alias("_day")
        )
        .agg(
            F.sum(
                F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            ).alias("v")
        )
        .select(
            "user_id",
            F.expr(f"CAST(_day - {_EPOCH} AS BIGINT)").alias("d"),
            "v",
        )
    )
    arr = (
        daily.groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "v"))).alias("a"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") >= _TS_MIN_DAYS)
    )
    slope = _sdiv("(a[j].v - a[i].v) * 1000000", "a[j].d - a[i].d")
    slopes = arr.select(
        "user_id",
        "n_days",
        F.expr(
            "array_sort(flatten(transform(sequence(0, size(a) - 2), i -> "
            f"transform(sequence(i + 1, size(a) - 1), j -> {slope}))))"
        ).alias("ss"),
    )
    med = _sdiv(
        "element_at(ss, CAST(size(ss) DIV 2 AS INT))"
        " + element_at(ss, CAST(size(ss) DIV 2 + 1 AS INT))",
        "2",
    )
    return slopes.select(
        "user_id",
        "n_days",
        F.expr("CAST(size(ss) AS BIGINT)").alias("n_pairs"),
        F.expr(
            "CASE WHEN size(ss) % 2 = 1"
            " THEN element_at(ss, CAST((size(ss) + 1) DIV 2 AS INT))"
            f" ELSE {med} END"
        ).alias("theilsen_ppm"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# q189: deterministic Poisson bootstrap CI for mean order value per segment
# --------------------------------------------------------------------------

_B = 40  # bootstrap replicates
# Poisson(1) CDF scaled to ppm: P(X<=k) for k=0..6, then cap at 7.
_POIS = (367879, 735759, 919699, 981012, 996340, 999406, 999917)
_LCG_M = 2147483648  # 2^31
_LCG_A = 1103515245
_LCG_C = 12345


def _w_expr(x: str, div: str) -> str:
    """Poisson(1) weight from the LCG on integer x (engine-agnostic up
    to the integer-division operator `div`). Staged mod keeps every
    intermediate under int64: (x % 2^31) * a <= 2^31 * 1.1e9 ~= 2.4e18."""
    h = f"((({x}) % {_LCG_M}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}"
    u = f"(({h}) % 1000000)"
    cases = " ".join(
        f"WHEN {u} < {p} THEN {k}" for k, p in enumerate(_POIS)
    )
    return f"CAST(CASE {cases} ELSE 7 END AS BIGINT)"


@query(
    "q189_bootstrap_ci",
    oracle=f"""
    WITH x AS (
      SELECT c.c_mktsegment AS segment, o.o_orderkey AS k,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    reps AS (
      SELECT x.segment, b.b,
             CAST(SUM({_w_expr(f"x.k * {_B} + b.b", "//")} * x.v) AS BIGINT) AS sw,
             CAST(SUM({_w_expr(f"x.k * {_B} + b.b", "//")}) AS BIGINT) AS nw
      FROM x CROSS JOIN (SELECT unnest(range(1, {_B} + 1)) AS b) b
      GROUP BY x.segment, b.b
    ),
    means AS (
      SELECT segment, {_sdiv_duck("sw", "nw")} AS mb
      FROM reps WHERE nw > 0
    ),
    ci AS (
      SELECT segment, list_sort(list(mb)) AS ms FROM means GROUP BY segment
    ),
    pt AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST({_sdiv_duck("SUM(v)", "COUNT(*)")} AS BIGINT) AS mean_cents
      FROM x GROUP BY segment
    )
    SELECT pt.segment, pt.n_orders, pt.mean_cents,
           CAST(len(ci.ms) AS BIGINT) AS n_reps,
           ci.ms[2] AS boot_lo_cents,
           ci.ms[len(ci.ms) - 1] AS boot_hi_cents
    FROM pt JOIN ci ON pt.segment = ci.segment
    ORDER BY pt.segment
    """,
    doc="Deterministic Poisson bootstrap 95%-ish CI for the mean order "
    "value per market segment: 40 replicates whose per-order Poisson(1) "
    "weights come from a 31-bit LCG on o_orderkey*40+b pushed through "
    "the ppm-scaled Poisson CDF — no RNG, no float CDF, bit-identical "
    "in both engines. The B-fold explode is reduced map-side to "
    "|segment| x B partial sums before the only shuffle (at 100 TB the "
    "amplification never leaves the mapper). CI bounds are the 2nd and "
    "(n_reps-1)th order statistics of the sorted replicate means "
    "(5%/95% of 40); replicate means are exact integer cents "
    "(sign-decomposed division). int64 headroom: o_orderkey*B <= 6e8 "
    "at sf10, staged-mod LCG <= 2.4e18, sum(w*v) <= 8 * total cents.",
    tags=("resampling", "statistics", "deterministic", "ext"),
)
def q189_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    x = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "v"
        ),
    )
    w = _w_expr(f"k * {_B} + b", "DIV")
    reps = (
        x.withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(_B))))
        .groupBy("segment", "b")
        .agg(
            F.expr(f"CAST(SUM({w} * v) AS BIGINT)").alias("sw"),
            F.expr(f"CAST(SUM({w}) AS BIGINT)").alias("nw"),
        )
        .filter(F.col("nw") > 0)
        .select("segment", F.expr(_sdiv("sw", "nw")).alias("mb"))
    )
    ci = reps.groupBy("segment").agg(
        F.array_sort(F.collect_list("mb")).alias("ms")
    )
    pt = x.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(_sdiv("SUM(v)", "COUNT(*)")).alias("mean_cents"),
    )
    return (
        pt.join(ci, "segment")
        .select(
            "segment",
            F.col("n_orders").cast("long").alias("n_orders"),
            "mean_cents",
            F.expr("CAST(size(ms) AS BIGINT)").alias("n_reps"),
            F.expr("element_at(ms, 2)").alias("boot_lo_cents"),
            F.expr("element_at(ms, CAST(size(ms) - 1 AS INT))").alias(
                "boot_hi_cents"
            ),
        )
        .orderBy("segment")
    )
