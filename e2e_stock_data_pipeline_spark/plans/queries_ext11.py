"""Round-8 session-4 additions, part 2 — distribution reporting on the
two-pass bucket-histogram machinery q162 introduced:

* q167 conversion-lag report (first click -> first subsequent purchase
  per user, exact median lag per click-day-of-week cohort — the funnel
  latency a growth team tracks);
* q168 exact p50/p90/p99 value quantiles per event type (the latency-
  report shape: arbitrary exact percentiles with NO data-sized sort —
  the generalization of the weighted median to any p).

Cross-engine numeric rules as everywhere else (plans/registry.py):
exact integer arithmetic throughout — the quantile definition is the
classic lower-quantile (smallest v with 100*cumweight >= p*total), so
no interpolation and no float ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import tables
from .queries_ext10 import weighted_median_plan
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q167: conversion lag — per user, the first click and the first
# purchase at-or-after it; exact median lag (in seconds) per cohort =
# day-of-week of the first click. The lag median rides q162's two-pass
# bucket histogram (operand: 7 cohorts — exactly the low-cardinality
# key where a per-group sort window would collapse), with durations in
# integer microseconds-derived seconds on both engines.
# --------------------------------------------------------------------------


@query(
    "q167_conversion_lag",
    oracle="""
    WITH clicks AS (
      SELECT user_id, MIN(ts) AS t_click FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    conv AS (
      SELECT c.user_id, c.t_click, MIN(e.ts) AS t_purch
      FROM clicks c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND e.ts >= c.t_click
      GROUP BY c.user_id, c.t_click
    ),
    lag AS (
      SELECT (date_diff('day', DATE '1970-01-01', CAST(t_click AS DATE)) + 4) % 7 AS dow,
             date_diff('microsecond', t_click, t_purch) // 1000000 AS lag_s
      FROM conv
    ),
    pp AS (SELECT dow, lag_s, CAST(COUNT(*) AS BIGINT) AS w FROM lag GROUP BY dow, lag_s),
    c2 AS (
      SELECT dow, lag_s, w,
             SUM(w) OVER (PARTITION BY dow ORDER BY lag_s) AS cw,
             SUM(w) OVER (PARTITION BY dow) AS tw
      FROM pp
    )
    SELECT dow, CAST(MAX(tw) AS BIGINT) AS n_conversions,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN lag_s END) AS BIGINT) AS median_lag_s
    FROM c2 GROUP BY dow
    """,
    doc="Funnel conversion lag: per user, first click and first purchase "
    "at-or-after it (two MIN aggregates keyed on the high-cardinality "
    "user id + one range-predicate join); exact median lag in whole "
    "seconds per day-of-week-of-click cohort. The 7-cohort median runs "
    "on q162's two-pass bucket histogram — the low-cardinality group "
    "key never sorts data-sized partitions; the oracle is the direct "
    "one-window formulation. Lag seconds are integer-truncated from "
    "the exact microsecond difference identically in both engines; "
    "day-of-week is the portable (epoch_days + 4) % 7.",
    tags=("funnel", "median", "twopass", "attribution", "gold"),
)
def q167_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        clicks.join(purch, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id", "t_click")
        .agg(F.min("ts").alias("t_purch"))
    )
    lag = conv.select(
        F.pmod(
            F.datediff(F.col("t_click").cast("date"), F.lit("1970-01-01").cast("date"))
            + 4,
            F.lit(7),
        )
        .cast("bigint")
        .alias("dow"),
        F.expr("timestampdiff(MICROSECOND, t_click, t_purch) DIV 1000000").alias(
            "lag_s"
        ),
    )
    r = lag.select("dow", F.col("lag_s").alias("pc"), F.lit(1).cast("bigint").alias("w"))
    out = weighted_median_plan(r, "dow", bucket=3600)
    return out.select(
        "dow",
        F.col("total_weight").alias("n_conversions"),
        F.col("median_cents").alias("median_lag_s"),
    )


# --------------------------------------------------------------------------
# q168: exact p50/p90/p99 per event type — the latency-report shape.
# Generalizes the two-pass histogram to ARBITRARY percentiles: the
# bucket histogram is built once, every requested p gets its boundary
# bucket from the dimension-sized prefix, and only boundary-bucket rows
# run a (type, bucket)-partitioned window. Lower-quantile definition
# (smallest v with 100*cum >= p*total): all-integer, no interpolation.
# --------------------------------------------------------------------------

_Q_PS = (50, 90, 99)
_Q_BUCKET = 500_000  # fixed-point value units per histogram bucket


@query(
    "q168_exact_quantiles",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pc
      FROM events
    ),
    pp AS (SELECT event_type, pc, CAST(COUNT(*) AS BIGINT) AS w FROM v GROUP BY event_type, pc),
    c AS (
      SELECT event_type, pc, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY pc) AS cw,
             SUM(w) OVER (PARTITION BY event_type) AS tw
      FROM pp
    )
    SELECT event_type, CAST(MAX(tw) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN 100 * cw >= {_Q_PS[0]} * tw THEN pc END) AS BIGINT) AS p50_fp,
           CAST(MIN(CASE WHEN 100 * cw >= {_Q_PS[1]} * tw THEN pc END) AS BIGINT) AS p90_fp,
           CAST(MIN(CASE WHEN 100 * cw >= {_Q_PS[2]} * tw THEN pc END) AS BIGINT) AS p99_fp
    FROM c GROUP BY event_type
    """,
    doc="Exact p50/p90/p99 of the event value per event type (fixed-point "
    "DECIMAL(18,4)*10000 units), lower-quantile definition: smallest v "
    "with 100*cumweight >= p*total — all-integer, interpolation-free, "
    "identical in both engines. The engine builds ONE value-bucket "
    "histogram per type, locates each percentile's boundary bucket on "
    "the dimension-sized prefix, and runs the only row-level window "
    "over (type, boundary-bucket) partitions — arbitrary exact "
    "percentiles on a 5-value group key with no data-sized sort "
    "(the scale-safe exact counterpart of approx_percentile). Oracle "
    "is the direct one-window formulation.",
    tags=("agg", "quantile", "latency", "twopass", "gold"),
)
def q168_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("pc"),
    ).withColumn("w", F.lit(1).cast("bigint"))
    qt = exact_group_quantiles_plan(v, "event_type", _Q_PS, bucket=_Q_BUCKET)
    return qt.select(
        "event_type",
        F.col("tw").cast("bigint").alias("n_events"),
        F.col("q_50").alias("p50_fp"),
        F.col("q_90").alias("p90_fp"),
        F.col("q_99").alias("p99_fp"),
    )


def exact_group_quantiles_plan(
    r: DataFrame, group_col: str, ps: tuple[int, ...], bucket: int
) -> DataFrame:
    """Exact lower quantiles at integer percentages `ps` over a
    (group_col, pc, w) frame via the two-pass bucket histogram — the
    q162 machinery generalized to arbitrary p. Output: one row per
    group with `tw` and a q_<p> column per requested percentile.

    Pass 1 aggregates weights per (group, pc DIV bucket) — dimension-
    sized; its per-group prefix locates every percentile's boundary
    bucket at once. Pass 2 touches only rows in SOME boundary bucket
    (joined with the p that claimed it), runs a (group, bucket)-
    partitioned cumulative window, and min-aggregates the crossing
    value per (group, p)."""
    rb = r.withColumn("bkt", F.expr(f"pc DIV {bucket}"))
    hist = rb.groupBy(group_col, "bkt").agg(F.sum("w").alias("bw"))
    wspec = Window.partitionBy(group_col).orderBy("bkt")
    cum = hist.select(
        group_col,
        "bkt",
        F.coalesce(
            F.sum("bw").over(wspec.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("below"),
        F.sum("bw")
        .over(wspec.rowsBetween(Window.unboundedPreceding, 0))
        .alias("through"),
        F.sum("bw").over(Window.partitionBy(group_col)).alias("tw"),
    )
    pdim = F.broadcast(
        rb.sparkSession.createDataFrame([(p,) for p in ps], ["p"]).select(
            F.col("p").cast("bigint").alias("p")
        )
    )
    boundary = (
        cum.crossJoin(pdim)
        .filter(
            (100 * F.col("through") >= F.col("p") * F.col("tw"))
            & (100 * F.col("below") < F.col("p") * F.col("tw"))
        )
        .select(group_col, "bkt", "p", "below", "tw")
    )
    inb = (
        rb.join(F.broadcast(boundary.select(group_col, "bkt").distinct()), [group_col, "bkt"])
        .groupBy(group_col, "bkt", "pc")
        .agg(F.sum("w").alias("w"))
    )
    run = inb.withColumn(
        "cum_in",
        F.sum("w").over(
            Window.partitionBy(group_col, "bkt")
            .orderBy("pc")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    crossed = (
        run.join(F.broadcast(boundary), [group_col, "bkt"])
        .filter(100 * (F.col("below") + F.col("cum_in")) >= F.col("p") * F.col("tw"))
        .groupBy(group_col, "p", "tw")
        .agg(F.min("pc").cast("bigint").alias("q"))
    )
    agg = [F.max("tw").cast("bigint").alias("tw")] + [
        F.max(F.when(F.col("p") == p, F.col("q"))).cast("bigint").alias(f"q_{p}")
        for p in ps
    ]
    return crossed.groupBy(group_col).agg(*agg)


def exact_group_rank_values(
    r: DataFrame, group_col: str, ranks: DataFrame, bucket: int
) -> DataFrame:
    """Exact per-group ORDER STATISTICS via the same two-pass bucket
    histogram: for each (group, tag, m) row of the dimension-sized
    ``ranks`` frame (m = 1-based target rank within the group's pc
    order), return (group, tag, pc-at-rank-m). This is the rank-target
    sibling of exact_group_quantiles_plan — the primitive interpolated
    percentiles need (rank floor(k)+1 and ceil(k)+1 per p), with no
    per-group value map held in any aggregator (the OOM Spark's native
    `percentile` hits once per-group distinct values reach 1e7 — caught
    by the r11 sf10 execution smoke on q115)."""
    rb = r.withColumn("bkt", F.expr(f"pc DIV {bucket}"))
    hist = rb.groupBy(group_col, "bkt").agg(F.sum("w").alias("bw"))
    wspec = Window.partitionBy(group_col).orderBy("bkt")
    cum = hist.select(
        group_col,
        "bkt",
        F.coalesce(
            F.sum("bw").over(wspec.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("below"),
        F.sum("bw")
        .over(wspec.rowsBetween(Window.unboundedPreceding, 0))
        .alias("through"),
    )
    boundary = (
        cum.join(F.broadcast(ranks), group_col)
        .filter((F.col("below") < F.col("m")) & (F.col("through") >= F.col("m")))
        .select(group_col, "bkt", "tag", "m", "below")
    )
    inb = (
        rb.join(
            F.broadcast(boundary.select(group_col, "bkt").distinct()),
            [group_col, "bkt"],
        )
        .groupBy(group_col, "bkt", "pc")
        .agg(F.sum("w").alias("w"))
    )
    run = inb.withColumn(
        "cum_in",
        F.sum("w").over(
            Window.partitionBy(group_col, "bkt")
            .orderBy("pc")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        run.join(F.broadcast(boundary), [group_col, "bkt"])
        .filter(F.col("below") + F.col("cum_in") >= F.col("m"))
        .groupBy(group_col, "tag")
        .agg(F.min("pc").cast("bigint").alias("pc"))
    )
