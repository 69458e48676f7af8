"""Round-10 [EXT] tier, part 2: interval/occupancy analytics and
covariance-adjusted experiment statistics.

* q190 — peak concurrent sessions per day: sessionize (30-min gap, the
  q31 semantics), decompose intervals into net +/- deltas per instant,
  then one within-day running-sum window plus a tiny cross-day offset
  frame (the q174 CUSUM "closed prefix form" pattern — never a global
  single-partition window).
* q191 — exact trailing-7-day distinct users per day: each distinct
  (user, day) covers days [d, d+6]; explode the bounded 7-day range,
  distinct, count. Exact sliding distinct with 7x amplification and
  ordinary shuffles — no 7-way self-join, no window over a global sort.
* q192 — CUPED-adjusted A/B lift: deterministic LCG arm assignment
  (the q189 precedent), pooled theta = cov(x,y)/var(x) from closed-form
  int64 moments (the q182 precedent), per-user adjustment and per-arm
  means in exact micro-dollar fixed point. Single-row output.

House rules: identical aliases both engines, every division
sign-decomposed or NULL-guarded, all arithmetic int64 with documented
headroom (dollars units for second moments), no row UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


def _sdiv(num: str, den: str) -> str:
    return (
        f"CASE WHEN {den} = 0 THEN NULL"
        f" WHEN ({num}) < 0 THEN -((-({num})) DIV ({den}))"
        f" ELSE ({num}) DIV ({den}) END"
    )


def _sdiv_duck(num: str, den: str) -> str:
    return (
        f"CASE WHEN {den} = 0 THEN NULL"
        f" WHEN ({num}) < 0 THEN -((-({num})) // ({den}))"
        f" ELSE ({num}) // ({den}) END"
    )


_EPOCH = "DATE '2024-01-01'"
_GAP_MIN = 30

# --------------------------------------------------------------------------
# q190: peak concurrent sessions per day
# --------------------------------------------------------------------------


@query(
    "q190_peak_concurrency",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL {_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
             ts
      FROM marked
    ),
    iv AS (
      SELECT MIN(ts) AS s,
             MAX(ts) + INTERVAL {_GAP_MIN} MINUTE AS e
      FROM sess GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv
    ),
    net AS (
      SELECT CAST(CAST(t AS DATE) - {_EPOCH} AS BIGINT) AS day, t,
             CAST(SUM(d) AS BIGINT) AS nd
      FROM deltas GROUP BY t
    ),
    run AS (
      SELECT day,
             SUM(nd) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM net
    ),
    day_in AS (
      SELECT day, MAX(conc) AS mx, CAST(COUNT(*) AS BIGINT) AS ncp
      FROM run GROUP BY day
    ),
    offs AS (
      SELECT day, CAST(COALESCE(SUM(dsum) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS off
      FROM (SELECT day, SUM(nd) AS dsum FROM net GROUP BY day) dtot
    )
    SELECT d.day, CAST(GREATEST(o.off, d.mx) AS BIGINT) AS peak_concurrent,
           d.ncp AS n_change_points
    FROM day_in d JOIN offs o ON d.day = o.day ORDER BY d.day
    """,
    doc="Peak concurrent sessions per day. Sessions are the q31 30-min "
    "inactivity islands, [first_ts, last_ts + 30min). Each interval "
    "becomes a +1/-1 delta; simultaneous deltas are NETTED per instant "
    "first (so the result is tie-order-free by construction), then "
    "concurrency = running sum over instants. The day's peak also "
    "considers the day-START baseline (sessions carried over "
    "midnight), so an overnight session counts toward the next day's "
    "peak; days with zero session boundaries don't appear. The Spark "
    "plan never sorts globally: the running sum is a within-day "
    "window plus an exclusive cross-day prefix computed on the tiny "
    "per-day-totals frame and joined back broadcast (the q174/q185 "
    "bucket-prefix pattern; the oracle's single ORDER BY t window is "
    "the single-node equivalent). Day is an epoch-day int.",
    tags=("interval", "occupancy", "session", "window", "ext"),
)
def q190_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    sess = e.groupBy(
        F.session_window("ts", f"{_GAP_MIN} minutes").alias("w"), "user_id"
    ).agg(F.lit(1).alias("_one"))
    deltas = sess.select(F.col("w.start").alias("t"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("w.end").alias("t"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t").agg(F.sum("d").cast("bigint").alias("nd"))
    net = net.withColumn(
        "day", F.expr(f"CAST(CAST(t AS DATE) - {_EPOCH} AS BIGINT)")
    )
    # within-day running sum (parallel across days)
    w_day = Window.partitionBy("day").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = net.withColumn("in_day", F.sum("nd").over(w_day))
    # exclusive cross-day prefix on the tiny per-day totals frame
    day_tot = net.groupBy("day").agg(F.sum("nd").alias("dsum"))
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = day_tot.select(
        "day", F.coalesce(F.sum("dsum").over(w_days), F.lit(0)).alias("off")
    )
    day_in = run.groupBy("day").agg(
        F.max(F.col("in_day")).alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n_change_points"),
    )
    return (
        day_in.join(F.broadcast(offsets), "day")
        .select(
            "day",
            F.greatest(F.col("off"), F.col("off") + F.col("mx"))
            .cast("bigint")
            .alias("peak_concurrent"),
            "n_change_points",
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q191: exact trailing-7-day distinct users per day
# --------------------------------------------------------------------------

_TRAIL = 7


@query(
    "q191_rolling_distinct_users",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - {_EPOCH} AS BIGINT) AS day
      FROM events
    ),
    span AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM du
    ),
    cover AS (
      SELECT DISTINCT du.user_id, du.day + g.i AS day
      FROM du CROSS JOIN (SELECT unnest(range(0, {_TRAIL})) AS i) g
    ),
    rolled AS (
      SELECT c.day, CAST(COUNT(*) AS BIGINT) AS distinct_users_7d
      FROM cover c, span WHERE c.day <= span.hi
      GROUP BY c.day
    ),
    today AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS distinct_users_today
      FROM du GROUP BY day
    )
    SELECT r.day, r.distinct_users_7d,
           COALESCE(t.distinct_users_today, 0) AS distinct_users_today
    FROM rolled r LEFT JOIN today t ON r.day = t.day
    ORDER BY r.day
    """,
    doc="Exact trailing-7-day distinct users per day. A distinct "
    "(user, day) covers days [d, d+6]; exploding that bounded range "
    "and de-duplicating gives exact sliding distinct counts with 7x "
    "row amplification and plain hash shuffles — no 7-way self-join, "
    "no global-sort window, no approximate sketch. Days past the last "
    "active day are trimmed. distinct_users_today is 0 for days "
    "covered only by the trailing window. Day is an epoch-day int.",
    tags=("window", "distinct", "rolling", "ext"),
)
def q191_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    du = e.select(
        "user_id", F.expr(f"CAST(CAST(ts AS DATE) - {_EPOCH} AS BIGINT)").alias("day")
    ).distinct()
    span = du.agg(F.max("day").alias("hi"))
    cover = (
        du.select(
            "user_id", F.explode(F.expr(f"sequence(day, day + {_TRAIL - 1})")).alias("day")
        )
        .distinct()
        .join(F.broadcast(span), F.col("day") <= F.col("hi"))
    )
    rolled = cover.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_users_7d")
    )
    today = du.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_users_today")
    )
    return (
        rolled.join(today, "day", "left")
        .select(
            "day",
            "distinct_users_7d",
            F.coalesce("distinct_users_today", F.lit(0))
            .cast("bigint")
            .alias("distinct_users_today"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q192: CUPED-adjusted A/B lift
# --------------------------------------------------------------------------

_LCG_M = 2147483648  # 2^31
_LCG_A = 1103515245
_LCG_C = 12345
_SPLIT_DAY = 15  # day-of-month: <= 15 pre-period, > 15 experiment period


def _arm_expr(x: str) -> str:
    """Deterministic arm (0/1) from the 31-bit LCG on the user id —
    engine-identical (the q189 precedent)."""
    return f"(((({x}) % {_LCG_M}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % 2"


def _cuped_sql(div: str, sdiv) -> str:
    """Shared CTE body for both engines (only the integer-division
    operator differs). Units: per-user x/y in whole dollars (cents DIV
    100) keep the second moments in int64 — n*Sxx <= ~1e17 at sf10;
    theta in ppm via a staged denominator (den DIV 1e6, the q185
    staged-scaling precedent); per-user adjustments and per-arm means
    in micro-dollars."""
    return f"""
    WITH ud AS (
      SELECT user_id,
             CAST({_arm_expr("user_id")} AS BIGINT) AS arm,
             CAST(SUM(CASE WHEN CAST(day(ts) AS BIGINT) <= {_SPLIT_DAY}
               THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               ELSE 0 END) {div} 100 AS BIGINT) AS x,
             CAST(SUM(CASE WHEN CAST(day(ts) AS BIGINT) > {_SPLIT_DAY}
               THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               ELSE 0 END) {div} 100 AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM ud
    ),
    th AS (
      SELECT n, sx,
             {sdiv("n * sxy - sx * sy", "(n * sxx - sx * sx) " + div + " 1000000")}
               AS theta_ppm
      FROM mom
    ),
    adj AS (
      SELECT ud.arm,
             ud.y * 1000000
               - th.theta_ppm * (ud.x - {sdiv("th.sx", "th.n")}) AS a_mic,
             th.theta_ppm AS theta_ppm
      FROM ud CROSS JOIN th
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             {sdiv("SUM(a_mic)", "COUNT(*)")} AS mean_adj_mic,
             MAX(theta_ppm) AS theta_ppm
      FROM adj GROUP BY arm
    )
    SELECT MAX(theta_ppm) AS theta_ppm,
           MAX(CASE WHEN arm = 0 THEN n_users END) AS n_users_a,
           MAX(CASE WHEN arm = 1 THEN n_users END) AS n_users_b,
           MAX(CASE WHEN arm = 0 THEN mean_adj_mic END) AS mean_adj_a_mic,
           MAX(CASE WHEN arm = 1 THEN mean_adj_mic END) AS mean_adj_b_mic,
           MAX(CASE WHEN arm = 1 THEN mean_adj_mic END)
             - MAX(CASE WHEN arm = 0 THEN mean_adj_mic END) AS lift_mic
    FROM arms
    """


@query(
    "q192_cuped_lift",
    oracle=_cuped_sql("//", _sdiv_duck),
    doc="CUPED-adjusted A/B lift on per-user spend: pre-period metric "
    "x (day-of-month <= 15) and experiment metric y (> 15) per user, "
    "deterministic LCG arm assignment, pooled theta = cov(x,y)/var(x) "
    "from closed-form int64 moments (dollars units; n*Sxx ~ 1e17 at "
    "sf10), per-user adjustment y - theta*(x - mean_x) and per-arm "
    "means in exact micro-dollars (theta in ppm via the staged "
    "denominator). Single-row output; lift_mic = arm B - arm A. "
    "Identical CTE body in both engines modulo the integer-division "
    "operator.",
    tags=("experiment", "statistics", "covariance", "ext"),
)
def q192_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return e.sparkSession.sql(_cuped_sql("DIV", _sdiv))
