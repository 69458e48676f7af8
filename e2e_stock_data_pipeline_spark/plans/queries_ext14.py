"""Round-9 [EXT] tier, part 3: attribution, decay scoring, and modes.

* q179 — LINEAR multi-touch attribution: each purchase's value split
  equally across the user's clicks in the preceding hour, integer
  fixed-point with the division remainder assigned to the LAST click
  so value is conserved EXACTLY (sum of credits == sum of attributed
  purchase value, a property float splits cannot give). Extends q81's
  single-pair interval join; the 1-hour bound is the fan-out cap.
* q180 — recency-decayed popularity: per-part order count weighted by
  0.99^weeks_age, computed as an EXACT integer fold
  ((acc * 99) DIV 100 iterated) over the tiny distinct-age dimension —
  exponential decay with zero float pow, so both engines agree to the
  last unit. The curation "what's hot now" ranking.
* q181 — exact mode per group (most frequent value, ties to the
  smallest): one count aggregate + max_by over the compound
  (count, -value) ordinal — no per-group sort, the deterministic
  mode that approx top-k sketches cannot pin down.

House rules: identical aliases both engines, positive-integer
truncating division, remainders assigned deterministically, windows
only on dimension-sized frames (q179's per-purchase click count rides
the bounded interval join; q180's fold runs on <= ~350 distinct ages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import tables
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q179: linear multi-touch attribution with exact value conservation
# --------------------------------------------------------------------------


def linear_attribution_plan(e: DataFrame) -> DataFrame:
    """events -> per-user linear-attribution summary. Module-level so
    scripts/scale_smoke.py times the EXACT plan the registered query
    runs."""
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("pv_fp"),
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    wp = Window.partitionBy("purchase_id")
    wr = Window.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    credit = j.select(
        "user_id",
        "click_id",
        "purchase_id",
        "pv_fp",
        F.count(F.lit(1)).over(wp).cast("bigint").alias("k"),
        F.row_number().over(wr).alias("rn"),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.expr(
            "CAST(pv_fp DIV k + CASE WHEN rn = 1"
            " THEN pv_fp - k * (pv_fp DIV k) ELSE 0 END AS BIGINT)"
        ).alias("credit_fp"),
    )
    return credit.groupBy("user_id").agg(
        F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
        F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        F.sum("credit_fp").cast("bigint").alias("credited_fp"),
    )


@query(
    "q179_linear_attribution",
    oracle="""
    WITH c AS (
      SELECT event_id AS click_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pv_fp
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT p.purchase_id, p.user_id, p.pv_fp, c.click_id, c.c_ts,
             CAST(COUNT(*) OVER (PARTITION BY p.purchase_id) AS BIGINT) AS k,
             row_number() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.c_ts DESC, c.click_id DESC) AS rn
      FROM p JOIN c
        ON c.user_id = p.user_id
       AND c.c_ts <= p.p_ts
       AND c.c_ts > p.p_ts - INTERVAL 1 HOUR
    ),
    credit AS (
      SELECT user_id, click_id, purchase_id,
             CAST(pv_fp // k
                  + CASE WHEN rn = 1 THEN pv_fp - k * (pv_fp // k)
                         ELSE 0 END AS BIGINT) AS credit_fp
      FROM j
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(credit_fp) AS BIGINT) AS credited_fp
    FROM credit
    GROUP BY user_id
    """,
    doc="Linear multi-touch attribution: each purchase's fixed-point "
    "value is split equally across the user's clicks in the preceding "
    "HOUR; the truncating-division remainder goes to the LAST click "
    "(latest ts, ties to highest click id), so per-purchase credit "
    "sums to the purchase value EXACTLY — conservation float splits "
    "cannot promise, pinned by a test summing credits against "
    "attributed purchases. The interval join is q81's bounded shape "
    "(user key + 1-hour band caps fan-out); the per-purchase count "
    "and last-click windows partition on the purchase id, whose "
    "partition size IS the bounded fan-out.",
    tags=("join", "interval", "attribution", "ext"),
)
def q179_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linear_attribution_plan(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# q180: recency-decayed popularity via exact integer fold
# --------------------------------------------------------------------------

_DECAY_NUM, _DECAY_DEN = 99, 100  # per-week retention 0.99
_W0 = 1_000_000  # weight of age-0 weeks, ppm


@query(
    "q180_decayed_popularity",
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS a FROM orders),
    aged AS (
      SELECT l.l_partkey,
             CAST(date_diff('day', o.o_orderdate, an.a) // 7 AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      CROSS JOIN anchor an
    ),
    wdim AS (
      SELECT w,
             CAST(list_reduce(
               list_prepend(CAST({_W0} AS BIGINT),
                            list_transform(range(CAST(w AS INT)),
                                           x -> CAST(0 AS BIGINT))),
               (acc, x) -> (acc * {_DECAY_NUM}) // {_DECAY_DEN}) AS BIGINT)
               AS weight_fp
      FROM (SELECT DISTINCT w FROM aged)
    )
    SELECT a.l_partkey AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(d.weight_fp) AS BIGINT) AS decayed_fp
    FROM aged a JOIN wdim d ON a.w = d.w
    GROUP BY a.l_partkey
    ORDER BY decayed_fp DESC, partkey
    LIMIT 25
    """,
    doc=f"Recency-decayed part popularity: each order line contributes "
    f"{_DECAY_NUM}/{_DECAY_DEN} ^ weeks_before_newest_order in ppm, "
    "computed as an EXACT integer fold ((acc * 99) DIV 100 iterated "
    "age times) over the <= ~350-row distinct-age dimension and "
    "broadcast back — exponential decay with zero floating pow, so "
    "both engines agree to the last unit (float pow differs in the "
    "last ulp across libms and would break the hash gate). "
    "Deterministic top-25 (score desc, part asc). The 'what's hot "
    "now' ranking a freshness-aware curation pass needs.",
    tags=("agg", "join", "decay", "topk", "ext"),
)
def q180_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    anchor = o.agg(F.max("o_orderdate").alias("a"))
    aged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .crossJoin(F.broadcast(anchor))
        .select(
            "l_partkey",
            F.expr("CAST(datediff(a, o_orderdate) DIV 7 AS BIGINT)").alias("w"),
        )
    )
    wdim = (
        aged.select("w")
        .distinct()
        .select(
            "w",
            F.expr(
                f"CAST(aggregate(array_repeat(0, CAST(w AS INT)),"
                f" CAST({_W0} AS BIGINT),"
                f" (acc, x) -> (acc * {_DECAY_NUM}) DIV {_DECAY_DEN}) AS BIGINT)"
            ).alias("weight_fp"),
        )
    )
    return (
        aged.join(F.broadcast(wdim), "w")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("weight_fp").cast("bigint").alias("decayed_fp"),
        )
        .orderBy(F.col("decayed_fp").desc(), "partkey")
        .limit(25)
    )


# --------------------------------------------------------------------------
# q181: exact mode per group (deterministic tie-break)
# --------------------------------------------------------------------------


@query(
    "q181_group_mode",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pc
      FROM events
    ),
    cnt AS (
      SELECT event_type, pc, CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY event_type, pc
    ),
    r AS (
      SELECT event_type, pc, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, pc ASC) AS rk
      FROM cnt
    )
    SELECT event_type,
           CAST(pc AS BIGINT) AS mode_fp,
           n AS mode_count,
           CAST((SELECT COUNT(DISTINCT pc) FROM v v2
                 WHERE v2.event_type = r.event_type) AS BIGINT) AS n_distinct
    FROM r WHERE rk = 1
    """,
    doc="Exact mode (most frequent value) per event type with a "
    "deterministic tie-break (ties to the SMALLEST value): one "
    "count aggregate, then max_by over the compound (count, -value) "
    "ordinal — the struct comparison picks the highest count and, "
    "within it, the smallest value, with no per-group sort and no "
    "window over data-sized frames. Exact distinct cardinality rides "
    "along. The deterministic mode an approx heavy-hitter sketch "
    "(q93) cannot pin down.",
    tags=("agg", "mode", "maxby", "ext"),
)
def q181_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("pc"),
    )
    cnt = v.groupBy("event_type", "pc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return cnt.groupBy("event_type").agg(
        F.expr("max_by(pc, struct(n, -pc))").cast("bigint").alias("mode_fp"),
        F.max(F.struct("n", (-F.col("pc")).alias("negpc")))["n"]
        .cast("bigint")
        .alias("mode_count"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
