"""Round-10 [EXT] tier, session 4: bounded graph traversal and
survival analysis.

* q193 — BFS hop-distance histogram from the co-purchase hub (the
  max-degree part): 4 bounded frontier-expansion rounds over the
  symmetrized edge list (operators/graph.bfs_hops). Oracle: DuckDB's
  recursive CTE with UNION dedup (working set = genuinely new
  (node, hops) rows, bounded by nodes x hops) + MIN(hops) per node.
* q194 — k-core peel (k=3, 6 fixed rounds): iteratively drop nodes of
  degree < 3 and their edges; report (round, nodes, edges) sizes —
  the standard graph-curation primitive for "keep the densely
  co-bought catalog". Oracle: the same 6 peels unrolled into
  MATERIALIZED CTEs (the q187 precedent).
* q195 — Kaplan-Meier time-to-conversion curve per signup day-of-week
  cohort with proper right-censoring (users who never reach the
  high-value event are censored at the observation-window end, staying
  in the at-risk set without ever counting as events). S(t) = prod
  over event times <= t of
  (n_t - d_t)/n_t in exact integer ppm: the (n_t, d_t) pairs are
  encoded into single BIGINTs in lifetime order and folded with a
  truncating-division product — Catalyst `aggregate` with an explicit
  init on one side, DuckDB `list_reduce` with the init PREPENDED onto
  the list on the other (DuckDB 1.0 has no 3-arg list_reduce); all
  values non-negative so floor-vs-truncate division never diverges.

House rules: identical aliases both engines, every division
NULL-guarded or non-negative by construction, all arithmetic int64
with documented headroom, no row UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import bfs_hops, copurchase_edges_plan, kcore_peel
from ..sources import tables
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# Shared DuckDB CTE text: the co-purchase edge list (part pairs sharing
# >= 2 orders), identical to the q170 oracle's derivation.
_EDGE_CTES = """
    li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e0 AS MATERIALIZED (SELECT pa, pb FROM pairs WHERE n >= 2)
"""


# --------------------------------------------------------------------------
# q193: BFS hop-distance histogram from the co-purchase hub
# --------------------------------------------------------------------------

_BFS_HOPS = 4


@query(
    "q193_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_EDGE_CTES},
    sym AS MATERIALIZED (
      SELECT pa AS u, pb AS v FROM e0 UNION ALL SELECT pb, pa FROM e0
    ),
    seed AS MATERIALIZED (
      SELECT u AS node
      FROM (SELECT u, COUNT(*) AS d FROM sym GROUP BY u)
      ORDER BY d DESC, u ASC LIMIT 1
    ),
    bfs AS (
      SELECT node, 0 AS h FROM seed
      UNION
      SELECT s.v AS node, b.h + 1 AS h
      FROM bfs b JOIN sym s ON b.node = s.u
      WHERE b.h < {_BFS_HOPS}
    )
    SELECT CAST(h AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM (SELECT node, MIN(h) AS h FROM bfs GROUP BY node)
    GROUP BY h ORDER BY hops
    """,
    doc="Hop-distance histogram of a bounded BFS (4 hops) from the "
    "co-purchase hub: the max-degree part (ties -> smallest id) over "
    "the q138/q170 edge set. Engine side (operators/graph.bfs_hops): "
    "the symmetrized edge list is hash-partitioned on its probe key "
    "and materialized once, then each round is one frontier-sized "
    "join + distinct + anti-join against the visited set — per-round "
    "cost scales with the frontier, not the graph, and lineage is "
    "truncated per round. Oracle: DuckDB recursive CTE with UNION "
    "dedup (intermediate bounded by nodes x hops — UNION ALL would "
    "enumerate paths and diverge on cycles) + MIN(hops) per node.",
    tags=("graph", "iterative", "ext"),
)
def q193_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    dist = bfs_hops(copurchase_edges_plan(li), max_hops=_BFS_HOPS)
    return (
        dist.groupBy("hops")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("hops")
    )


# --------------------------------------------------------------------------
# q194: k-core peel sizes (k=3, 6 fixed rounds)
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    ctes = [_EDGE_CTES.strip()]
    rows = [
        "SELECT CAST(0 AS BIGINT) AS round_no,"
        " CAST((SELECT COUNT(*) FROM (SELECT pa FROM e0 UNION SELECT pb FROM e0))"
        " AS BIGINT) AS n_nodes,"
        " CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges"
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT x FROM"
            f" (SELECT pa AS x FROM e{p} UNION ALL SELECT pb AS x FROM e{p})"
            f" GROUP BY x HAVING COUNT(*) >= {_KCORE_K})"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT e.pa, e.pb FROM e{p} e"
            f" JOIN k{r} a ON e.pa = a.x JOIN k{r} b ON e.pb = b.x)"
        )
        rows.append(
            f"SELECT CAST({r} AS BIGINT) AS round_no,"
            f" CAST((SELECT COUNT(*) FROM (SELECT pa FROM e{r} UNION SELECT pb FROM e{r}))"
            f" AS BIGINT) AS n_nodes,"
            f" CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS n_edges"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(rows)
        + "\n    ORDER BY round_no"
    )


@query(
    "q194_kcore_peel",
    oracle=_kcore_oracle(),
    doc=f"k-core peel of the co-purchase graph (k={_KCORE_K}, "
    f"{_KCORE_ROUNDS} fixed rounds): each round drops nodes whose "
    "current degree is below k plus their edges, reporting "
    "(round_no, n_nodes, n_edges) — the graph-curation primitive for "
    "'keep the densely co-bought catalog core'. Fixed-round semantics "
    "so the oracle (the same peels unrolled into MATERIALIZED CTEs — "
    "the q187 lesson: inlined CTEs double per round) replays exactly; "
    "converged tails are constant rows. Engine side "
    "(operators/graph.kcore_peel): one degree aggregation + two "
    "node-keyed semi joins per round over a monotonically shrinking, "
    "lineage-truncated edge set — no step touches the original fact "
    "table after the first materialization.",
    tags=("graph", "iterative", "ext"),
)
def q194_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return kcore_peel(
        copurchase_edges_plan(li), k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).orderBy("round_no")


# --------------------------------------------------------------------------
# q195: Kaplan-Meier time-to-conversion per signup-dow cohort (censored)
# --------------------------------------------------------------------------

_KM_ENC = 10_000_000  # e = n_t * _KM_ENC + d_t  (n_t <= 1.5e6 at sf10 -> e <= 1.5e13)
_KM_PPM = 1_000_000
# The "event of interest": the user's first event with value above this
# threshold (~2/3 of users convert at the driver sfs, median ~10 days —
# a rich mix of deaths and right-censoring at every tested scale).
_KM_CONV_VALUE = 200
_KM_HORIZONS = (7, 14, 30)


def _km_fold_spark(h: int) -> str:
    return (
        f"aggregate(filter(arr, s -> s.lifetime_d <= {h}),"
        f" CAST({_KM_PPM} AS BIGINT),"
        f" (acc, s) -> (acc * ((s.e DIV {_KM_ENC}) - (s.e % {_KM_ENC})))"
        f" DIV (s.e DIV {_KM_ENC}))"
    )


def _km_fold_duck(h: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST({_KM_PPM} AS BIGINT),"
        f" list(e ORDER BY lifetime_d) FILTER (WHERE lifetime_d <= {h})),"
        f" (acc, x) -> (acc * ((x // {_KM_ENC}) - (x % {_KM_ENC})))"
        f" // (x // {_KM_ENC}))"
    )


@query(
    "q195_survival_km",
    oracle=f"""
    WITH u AS (
      SELECT user_id, MIN(ts) AS first_ts,
             MIN(CASE WHEN value > {_KM_CONV_VALUE} THEN ts END) AS conv_ts
      FROM events GROUP BY user_id
    ),
    g AS (SELECT MAX(ts) AS end_ts FROM events),
    users AS (
      SELECT user_id,
             CAST(dayofweek(first_ts) + 1 AS BIGINT) AS cohort_dow,
             CAST(datediff('day', CAST(first_ts AS DATE),
                           CAST(COALESCE(conv_ts, end_ts) AS DATE))
                  AS BIGINT) AS lifetime_d,
             conv_ts IS NOT NULL AS churned
      FROM u CROSS JOIN g
    ),
    per_t AS (
      SELECT cohort_dow, lifetime_d, COUNT(*) AS c_all,
             CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM users GROUP BY 1, 2
    ),
    ar AS (
      SELECT cohort_dow, lifetime_d, d,
             CAST(SUM(c_all) OVER (PARTITION BY cohort_dow
                                   ORDER BY lifetime_d DESC) AS BIGINT) AS n_t
      FROM per_t
    ),
    entries AS (
      SELECT cohort_dow, lifetime_d, n_t * {_KM_ENC} + d AS e
      FROM ar WHERE d > 0
    ),
    km AS (
      SELECT cohort_dow,
             {_km_fold_duck(7)} AS s7_ppm,
             {_km_fold_duck(14)} AS s14_ppm,
             {_km_fold_duck(30)} AS s30_ppm
      FROM entries GROUP BY cohort_dow
    ),
    coh AS (
      SELECT cohort_dow, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
      FROM users GROUP BY cohort_dow
    )
    SELECT coh.cohort_dow, coh.n_users, coh.n_churned,
           COALESCE(km.s7_ppm, {_KM_PPM}) AS s7_ppm,
           COALESCE(km.s14_ppm, {_KM_PPM}) AS s14_ppm,
           COALESCE(km.s30_ppm, {_KM_PPM}) AS s30_ppm
    FROM coh LEFT JOIN km ON coh.cohort_dow = km.cohort_dow
    ORDER BY coh.cohort_dow
    """,
    doc="Kaplan-Meier time-to-event curve per signup day-of-week "
    "cohort: the event of interest is the user's first event with "
    f"value > {_KM_CONV_VALUE} (a conversion analog), lifetime_d = days "
    "from first event to conversion, with proper right-censoring — "
    "users who never convert are censored at the observation-window "
    "end (they count in the at-risk set n_t at every earlier time but "
    "never as events d_t). S(t) = prod over event days u <= t of "
    "(n_u - d_u)/n_u, evaluated at 7/14/30-day "
    "horizons in exact integer ppm: each cohort's (n_t, d_t) pairs "
    f"are encoded n_t*{_KM_ENC}+d_t (n_t <= 1.5e6 at sf10, so e <= "
    "1.5e13 and acc*(n-d) <= 1e6*1.5e6 = 1.5e12 — int64 headroom) "
    "into a lifetime-ordered list and folded left-to-right with "
    "truncating division — Catalyst `aggregate` with an explicit "
    "init, DuckDB `list_reduce` with the init prepended (no 3-arg "
    "form in 1.0); all operands non-negative so floor == truncate. "
    "Cohorts with zero churn events keep S = 1.0 (1e6 ppm) via "
    "COALESCE on both engines. The at-risk counts come from one "
    "descending cumulative sum over per-(cohort, lifetime) partials — "
    "window input is |cohorts| x |distinct lifetimes| (<= 31 rows per "
    "cohort), never user-sized.",
    tags=("statistics", "survival", "fold", "ext"),
)
def q195_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("value") > _KM_CONV_VALUE, F.col("ts"))).alias(
            "conv_ts"
        ),
    )
    gend = ev.agg(F.max("ts").alias("end_ts"))
    users = u.crossJoin(F.broadcast(gend)).select(
        F.dayofweek("first_ts").cast("bigint").alias("cohort_dow"),
        F.datediff(
            F.coalesce("conv_ts", "end_ts").cast("date"),
            F.col("first_ts").cast("date"),
        )
        .cast("bigint")
        .alias("lifetime_d"),
        F.col("conv_ts").isNotNull().alias("churned"),
    )
    per_t = users.groupBy("cohort_dow", "lifetime_d").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).cast("bigint").alias("d"),
    )
    w = Window.partitionBy("cohort_dow").orderBy(F.col("lifetime_d").desc())
    ar = per_t.withColumn("n_t", F.sum("c_all").over(w).cast("bigint"))
    entries = ar.filter(F.col("d") > 0).select(
        "cohort_dow",
        "lifetime_d",
        (F.col("n_t") * F.lit(_KM_ENC) + F.col("d")).alias("e"),
    )
    km = entries.groupBy("cohort_dow").agg(
        F.sort_array(F.collect_list(F.struct("lifetime_d", "e"))).alias("arr")
    )
    for h in _KM_HORIZONS:
        km = km.withColumn(f"s{h}_ppm", F.expr(_km_fold_spark(h)))
    coh = users.groupBy("cohort_dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_churned"),
    )
    return (
        coh.join(km.drop("arr"), "cohort_dow", "left")
        .select(
            "cohort_dow",
            "n_users",
            "n_churned",
            *[
                F.coalesce(F.col(f"s{h}_ppm"), F.lit(_KM_PPM).cast("bigint")).alias(
                    f"s{h}_ppm"
                )
                for h in _KM_HORIZONS
            ],
        )
        .orderBy("cohort_dow")
    )
