"""Round-10 [EXT] tier, part 2: covariance-adjusted experiment
statistics.

* q192 — CUPED-adjusted A/B lift: deterministic LCG arm assignment
  (the q189 precedent), pooled theta = cov(x,y)/var(x) from closed-form
  int64 moments (the q182 precedent), per-user adjustment and per-arm
  means in exact micro-dollar fixed point. Single-row output.

(Two drafted siblings — per-day peak concurrency and trailing-7-day
distinct users — were dropped before registration: q159 and q156
already implement those algorithms; see BENCH_NOTES r10s2.)

House rules: identical aliases both engines, every division
sign-decomposed or NULL-guarded, all arithmetic int64 with documented
headroom (dollars units for second moments), no row UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
             CAST({sdiv("SUM(a_mic)", "COUNT(*)")} AS BIGINT) AS mean_adj_mic,
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
