"""Round-9 [EXT] tier: sequence analytics, graph census, robust/ML-prep
aggregations — the curation shapes a training-data pipeline reaches for
after dedup and quality gating are in place.

* q169 — Markov transition matrix over per-user event sequences: one
  lead() pass keyed on the user, probabilities in integer fixed-point
  over the dimension-sized (from, to) frame.
* q170 — triangle census of the co-purchase graph via degree-ordered
  orientation (compact-forward): each triangle is found exactly once
  from its unique out-degree-2 vertex, so join fan-out is bounded by
  oriented out-degree (O(sqrt(m)) amortized) instead of raw degree —
  the difference between a feasible and an exploding wedge join on a
  skewed graph. The oracle replays the textbook a<b<c three-way join.
* q171 — winsorized + trimmed means per event type at exact p05/p95:
  reuses the two-pass bucket-histogram quantile machinery (q162/q168),
  then one conditional aggregate — never a data-sized sort.
* q172 — leave-one-out target encoding audit per market segment:
  the feature-engineering op whose naive form leaks the row's own
  label; all-integer (sum - own) DIV (n - 1) arithmetic.
* q173 — inter-event dwell-time quantiles per event type: exact
  p50/p90/p99 of the microsecond gap to the user's next event, via
  the same histogram quantile plan over integer-µs values.
* q174 — CUSUM changepoint alarms per user: the sequential
  S_t = max(0, S_{t-1} + dev_t) recursion in its closed prefix form
  S_t = P_t - min(0, running_min(P)) — pure windows over ONE exchange
  keyed on the user (mean/MAD from frame-free window aggregates on
  the same partitioning), no iteration, no UDF.

House rules hold: every computed column aliased identically in both
engines, integer fixed-point wherever a division happens (all inputs
here are positive, so truncating DIV agrees across engines), windows
partitioned on high-cardinality keys, dimension-sized frames for any
global ordering.

Reference parity: the reference repo's analytics tier stops at
single-table SQL over gold prices (/root/reference/README.md's query
examples); this module is part of the [EXT] training-data surface
SURVEY.md §2 marks beyond-reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import triangle_census_plan
from ..sources import tables
from .queries_ext11 import exact_group_quantiles_plan
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


_P6 = 1_000_000  # fixed-point scale for probabilities/ratios


# --------------------------------------------------------------------------
# q169: Markov transition matrix over per-user event-type sequences
# --------------------------------------------------------------------------


@query(
    "q169_markov_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    tc AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           CAST(({_P6} * n) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
             AS p_fp
    FROM tc
    ORDER BY from_type, to_type
    """,
    doc="First-order Markov transition matrix of user behavior: for "
    "each user's (ts, event_id)-ordered event sequence, count "
    "(from_type -> to_type) transitions and the row-conditional "
    "probability in parts-per-million (truncating integer division — "
    "counts are positive, so DIV agrees across engines). One lead() "
    "window keyed on the high-cardinality user; the normalizing "
    "window runs on the 25-row (from, to) aggregate.",
    tags=("window", "sequence", "markov", "ext"),
)
def q169_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    tc = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return tc.select(
        "from_type",
        "to_type",
        "n",
        F.expr(f"CAST(({_P6} * n) DIV SUM(n) OVER (PARTITION BY from_type) AS BIGINT)")
        .alias("p_fp"),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# q170: triangle census of the co-purchase graph (degree-oriented)
# --------------------------------------------------------------------------


@query(
    "q170_triangle_census",
    oracle=f"""
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e AS MATERIALIZED (SELECT pa, pb FROM pairs WHERE n >= 2),
    deg AS MATERIALIZED (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT pa AS x FROM e UNION ALL SELECT pb AS x FROM e)
      GROUP BY x
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t
      FROM e e1
      JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
           t AS n_triangles,
           CAST(CASE WHEN (SELECT SUM(d * (d - 1) // 2) FROM deg) > 0
                THEN (3 * t * {_P6}) // (SELECT SUM(d * (d - 1) // 2) FROM deg)
                END AS BIGINT) AS transitivity_fp
    FROM tri
    """,
    doc="Global triangle census of the co-purchase graph (q138's edge "
    "set: part pairs sharing >= 2 orders). Engine side orients every "
    "edge from its lower (degree, id) endpoint to the higher and joins "
    "oriented out-edges pairwise (compact-forward): each triangle is "
    "emitted exactly once from its unique out-degree-2 vertex, and "
    "wedge fan-out is bounded by ORIENTED out-degree — O(m^1.5) total "
    "work even on a skewed degree distribution, vs the oracle's "
    "textbook a<b<c three-way self-join. Transitivity = 3*triangles / "
    "wedges in parts-per-million (positive integers, truncating "
    "division agrees across engines).",
    tags=("graph", "triangle", "join", "ext"),
)
def q170_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_census_plan(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )


# --------------------------------------------------------------------------
# q171: winsorized + trimmed means at exact p05/p95 per event type
# --------------------------------------------------------------------------

_W_BUCKET = 500_000  # fixed-point value units per histogram bucket


@query(
    "q171_winsorized_means",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pc
      FROM events
    ),
    pp AS (SELECT event_type, pc, CAST(COUNT(*) AS BIGINT) AS w
           FROM v GROUP BY event_type, pc),
    c AS (
      SELECT event_type, pc, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY pc) AS cw,
             SUM(w) OVER (PARTITION BY event_type) AS tw
      FROM pp
    ),
    qs AS (
      SELECT event_type,
             CAST(MIN(CASE WHEN 100 * cw >= 5 * tw THEN pc END) AS BIGINT) AS lo_fp,
             CAST(MIN(CASE WHEN 100 * cw >= 95 * tw THEN pc END) AS BIGINT) AS hi_fp
      FROM c GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(q.lo_fp) AS lo_fp,
           MAX(q.hi_fp) AS hi_fp,
           CAST(SUM(LEAST(GREATEST(v.pc, q.lo_fp), q.hi_fp)) // COUNT(*) AS BIGINT)
             AS winsor_mean_fp,
           CAST(SUM(CASE WHEN v.pc BETWEEN q.lo_fp AND q.hi_fp THEN v.pc END)
                // COUNT(CASE WHEN v.pc BETWEEN q.lo_fp AND q.hi_fp THEN 1 END)
                AS BIGINT) AS trim_mean_fp,
           CAST(COUNT(CASE WHEN v.pc BETWEEN q.lo_fp AND q.hi_fp THEN 1 END)
                AS BIGINT) AS n_kept
    FROM v JOIN qs q ON v.event_type = q.event_type
    GROUP BY v.event_type
    """,
    doc="Winsorized and trimmed means per event type at EXACT p05/p95 "
    "(lower-quantile definition, fixed-point units): the robust "
    "location estimates a quality gate wants when means are "
    "outlier-fragile and medians discard too much. Engine side finds "
    "the cut points with the q168 two-pass bucket histogram (only "
    "boundary-bucket rows ever see a row-level window), broadcasts the "
    "5-row cut table back, and finishes in one conditional hash "
    "aggregate — no data-sized sort at any stage. All sums are "
    "positive fixed-point integers, so truncating DIV agrees across "
    "engines.",
    tags=("agg", "robust", "quantile", "twopass", "ext"),
)
def q171_winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("pc"),
    ).withColumn("w", F.lit(1).cast("bigint"))
    qt = exact_group_quantiles_plan(v, "event_type", (5, 95), bucket=_W_BUCKET)
    cuts = qt.select(
        "event_type", F.col("q_5").alias("lo_fp"), F.col("q_95").alias("hi_fp")
    )
    kept = F.col("pc").between(F.col("lo_fp"), F.col("hi_fp"))
    return (
        v.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("lo_fp").alias("lo_fp"),
            F.max("hi_fp").alias("hi_fp"),
            F.expr(
                "CAST(SUM(LEAST(GREATEST(pc, lo_fp), hi_fp)) DIV COUNT(*) AS BIGINT)"
            ).alias("winsor_mean_fp"),
            F.expr(
                "CAST(SUM(CASE WHEN pc BETWEEN lo_fp AND hi_fp THEN pc END)"
                " DIV COUNT(CASE WHEN pc BETWEEN lo_fp AND hi_fp THEN 1 END)"
                " AS BIGINT)"
            ).alias("trim_mean_fp"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# q172: leave-one-out target encoding audit per market segment
# --------------------------------------------------------------------------


@query(
    "q172_target_encoding",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
               AS price_fp
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    s AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(price_fp) AS BIGINT) AS total_fp
      FROM j GROUP BY segment
    ),
    loo AS (
      SELECT j.segment, s.n, s.total_fp,
             (s.total_fp - j.price_fp) // (s.n - 1) AS enc_fp
      FROM j JOIN s ON j.segment = s.segment
    )
    SELECT segment,
           MAX(n) AS n_orders,
           CAST(MAX(total_fp) // MAX(n) AS BIGINT) AS seg_mean_fp,
           CAST(MIN(enc_fp) AS BIGINT) AS loo_min_fp,
           CAST(MAX(enc_fp) AS BIGINT) AS loo_max_fp,
           CAST(SUM(enc_fp) // COUNT(*) AS BIGINT) AS loo_avg_fp
    FROM loo GROUP BY segment
    """,
    doc="Leave-one-out target encoding of order value by customer "
    "market segment — the category feature-encoding that excludes the "
    "row's own label so the feature can't leak it: enc = (seg_sum - "
    "own) DIV (seg_n - 1), all positive int64 fixed-point. The audit "
    "reports per-segment n, plain mean, and the LOO encoding's "
    "min/max/avg — the spread between seg_mean and loo extremes IS "
    "the leakage a naive mean encoding would have injected. Engine: "
    "one join, one 5-row broadcast of segment sums, one aggregate.",
    tags=("agg", "join", "encoding", "curation", "ext"),
)
def q172_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("price_fp"),
    )
    s = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("price_fp").cast("bigint").alias("total_fp"),
    )
    loo = j.join(F.broadcast(s), "segment").select(
        "segment",
        "n",
        "total_fp",
        F.expr("(total_fp - price_fp) DIV (n - 1)").alias("enc_fp"),
    )
    return loo.groupBy("segment").agg(
        F.max("n").alias("n_orders"),
        F.expr("CAST(MAX(total_fp) DIV MAX(n) AS BIGINT)").alias("seg_mean_fp"),
        F.min("enc_fp").cast("bigint").alias("loo_min_fp"),
        F.max("enc_fp").cast("bigint").alias("loo_max_fp"),
        F.expr("CAST(SUM(enc_fp) DIV COUNT(*) AS BIGINT)").alias("loo_avg_fp"),
    )


# --------------------------------------------------------------------------
# q173: inter-event dwell-time quantiles per event type (exact, µs)
# --------------------------------------------------------------------------

_D_PS = (50, 90, 99)
_D_BUCKET = 3_600_000_000  # 1 hour of microseconds per histogram bucket


@query(
    "q173_dwell_quantiles",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))
                  - epoch_us(ts) AS BIGINT) AS pc
      FROM events
    ),
    v AS (SELECT event_type, pc FROM g WHERE pc IS NOT NULL),
    pp AS (SELECT event_type, pc, CAST(COUNT(*) AS BIGINT) AS w
           FROM v GROUP BY event_type, pc),
    c AS (
      SELECT event_type, pc, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY pc) AS cw,
             SUM(w) OVER (PARTITION BY event_type) AS tw
      FROM pp
    )
    SELECT event_type, CAST(MAX(tw) AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN 100 * cw >= {_D_PS[0]} * tw THEN pc END) AS BIGINT)
             AS p50_us,
           CAST(MIN(CASE WHEN 100 * cw >= {_D_PS[1]} * tw THEN pc END) AS BIGINT)
             AS p90_us,
           CAST(MIN(CASE WHEN 100 * cw >= {_D_PS[2]} * tw THEN pc END) AS BIGINT)
             AS p99_us
    FROM c GROUP BY event_type
    """,
    doc="Dwell time: exact p50/p90/p99 of the microsecond gap from "
    "each event to the same user's next event, grouped by the FIRST "
    "event's type — 'how long after a click does the next action "
    "come'. Gap extraction is one lead() window on the user key; the "
    "quantiles reuse the two-pass bucket histogram (1-hour µs "
    "buckets), so the only row-level window after the gap pass runs "
    "on boundary buckets. Integer microseconds end to end.",
    tags=("window", "quantile", "timeseries", "twopass", "ext"),
)
def q173_dwell_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ from parquet; timestampdiff handles NTZ directly
    v = (
        e.withColumn("nxt", F.lead("ts").over(w))
        .select(
            "event_type",
            F.expr("timestampdiff(MICROSECOND, ts, nxt)").cast("bigint").alias("pc"),
        )
        .filter(F.col("pc").isNotNull())
        .withColumn("w", F.lit(1).cast("bigint"))
    )
    qt = exact_group_quantiles_plan(v, "event_type", _D_PS, bucket=_D_BUCKET)
    return qt.select(
        "event_type",
        F.col("tw").cast("bigint").alias("n_gaps"),
        F.col("q_50").alias("p50_us"),
        F.col("q_90").alias("p90_us"),
        F.col("q_99").alias("p99_us"),
    )


# --------------------------------------------------------------------------
# q174: CUSUM changepoint alarms per user (closed-form prefix windows)
# --------------------------------------------------------------------------


def cusum_alarms_plan(e: DataFrame) -> DataFrame:
    """events(user_id, ts, event_id, value) -> per-user CUSUM alarm
    summary. Module-level so scripts/scale_smoke.py times the EXACT
    plan the registered query runs."""
    x = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("x_fp"),
    )
    part = Window.partitionBy("user_id")
    m = x.select(
        "user_id",
        "ts",
        "event_id",
        "x_fp",
        F.count(F.lit(1)).over(part).cast("bigint").alias("n"),
        F.expr(
            "SUM(x_fp) OVER (PARTITION BY user_id)"
            " DIV COUNT(*) OVER (PARTITION BY user_id)"
        ).alias("mean_fp"),
    )
    d = m.select(
        "user_id",
        "ts",
        "event_id",
        "n",
        "mean_fp",
        (F.col("x_fp") - F.col("mean_fp")).alias("dev"),
        F.expr(
            "SUM(ABS(x_fp - mean_fp)) OVER (PARTITION BY user_id) DIV n"
        ).alias("mad_fp"),
    )
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    p = d.select(
        "user_id",
        "ts",
        "event_id",
        "n",
        "mean_fp",
        "mad_fp",
        F.sum("dev").over(ordered).alias("pref"),
    )
    s = p.select(
        "user_id",
        "ts",
        "n",
        "mean_fp",
        "mad_fp",
        (
            F.col("pref")
            - F.least(F.lit(0).cast("bigint"), F.min("pref").over(ordered))
        ).alias("cusum"),
    )
    alarm = F.col("cusum") > 6 * F.col("mad_fp")
    return s.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.max("mean_fp").alias("mean_fp"),
        F.max("mad_fp").alias("mad_fp"),
        F.max("cusum").cast("bigint").alias("max_cusum_fp"),
        F.coalesce(F.sum(F.when(alarm, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_alarms"),
        F.min(F.when(alarm, F.col("ts"))).alias("first_alarm_ts"),
    )


@query(
    "q174_cusum_alarms",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x_fp
      FROM events
    ),
    m AS (
      SELECT user_id, ts, event_id, x_fp,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
             CAST(SUM(x_fp) OVER (PARTITION BY user_id)
                  // COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS mean_fp
      FROM x
    ),
    d AS (
      SELECT user_id, ts, event_id, n, mean_fp,
             x_fp - mean_fp AS dev,
             CAST(SUM(ABS(x_fp - mean_fp)) OVER (PARTITION BY user_id) // n
                  AS BIGINT) AS mad_fp
      FROM m
    ),
    p AS (
      SELECT user_id, ts, event_id, n, mean_fp, mad_fp,
             SUM(dev) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pref
      FROM d
    ),
    s AS (
      SELECT user_id, ts, n, mean_fp, mad_fp,
             pref - LEAST(0, MIN(pref) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
      FROM p
    )
    SELECT user_id,
           MAX(n) AS n_events,
           MAX(mean_fp) AS mean_fp,
           MAX(mad_fp) AS mad_fp,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum_fp,
           CAST(COALESCE(SUM(CASE WHEN cusum > 6 * mad_fp THEN 1 END), 0)
                AS BIGINT) AS n_alarms,
           MIN(CASE WHEN cusum > 6 * mad_fp THEN ts END) AS first_alarm_ts
    FROM s GROUP BY user_id
    """,
    doc="CUSUM changepoint detection per user: the sequential "
    "S_t = max(0, S_(t-1) + (x_t - mean)) recursion rewritten in its "
    "closed prefix form S_t = P_t - min(0, running_min(P_t)) — so the "
    "'iterative' detector is pure windows, no loop, no UDF. Reference "
    "mean and the MAD-style threshold (6 * mean absolute deviation) "
    "come from frame-free window aggregates on the SAME user "
    "partitioning, so the whole query is one exchange: shuffle on "
    "user_id, one sort, stacked window passes. Output: per-user "
    "alarm count, max statistic, first alarm time. All-positive "
    "integer divisions; prefix sums stay int64.",
    tags=("window", "timeseries", "changepoint", "monitoring", "ext"),
)
def q174_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_alarms_plan(_t(spark, sf_dir, "events"))
