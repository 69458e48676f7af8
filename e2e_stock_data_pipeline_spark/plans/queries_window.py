"""Window-function query inventory — the Gold feature layer (SURVEY.md
§2.6 W1–W5) generalized to the `events` series (user_id ~ symbol,
ts ~ trade_date, value ~ close), plus the as-of join (§2.9).

Determinism: every window orders by (ts, event_id) so ties are
impossible; rolling sums go through DECIMAL; volatility is computed by
an explicit sum-of-squares formula evaluated identically in both
engines (double IEEE ops on exact-decimal inputs), so no rounding
fuzz is needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join, asof_join_filtered, asof_shuffle_width
from ..operators.windows import keep_last
from ..sources import tables
from .registry import query

DEC = "decimal(18,4)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "events")


def _w():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@query(
    "q21_moving_averages",
    oracle="""
    SELECT event_id, user_id, ts, value,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w5 AS DOUBLE) / COUNT(value) OVER w5 AS ma_5,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w20 AS DOUBLE) / COUNT(value) OVER w20 AS ma_20
    FROM events
    WINDOW
      w5 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      w20 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing moving averages ma_5/ma_20 (W1/W2; reference gold view "
    "ma_20/ma_50: docs/databricks_setup.md:216-226).",
    tags=("window", "gold"),
    bench=True,
)
def q21_moving_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w5 = _w().rowsBetween(-4, 0)
    w20 = _w().rowsBetween(-19, 0)
    sum5 = F.sum(F.col("value").cast(DEC)).over(w5).cast("double")
    sum20 = F.sum(F.col("value").cast(DEC)).over(w20).cast("double")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (sum5 / F.count("value").over(w5)).alias("ma_5"),
        (sum20 / F.count("value").over(w20)).alias("ma_20"),
    )


@query(
    "q22_rolling_volatility",
    oracle="""
    SELECT event_id, user_id, ts,
      CASE WHEN COUNT(value) OVER w > 1 THEN
        sqrt(greatest(
          (CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
           - CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) * CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(value) OVER w)
          / (COUNT(value) OVER w - 1), 0.0))
      END AS vol_20
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="20-row rolling volatility (W3; reference docs/databricks_setup.md:229-233) "
    "via exact sum-of-squares — bit-identical across engines.",
    tags=("window", "gold"),
)
def q22_rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = _w().rowsBetween(-19, 0)
    v = F.col("value").cast(DEC)
    cnt = F.count("value").over(w)
    s = F.sum(v).over(w).cast("double")
    sq = F.sum(v * v).over(w).cast("double")
    var = (sq - s * s / cnt) / (cnt - 1)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(cnt > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("vol_20"),
    )


@query(
    "q23_step_returns",
    oracle="""
    SELECT event_id, user_id, ts, value,
      CASE WHEN lag(value, 1) OVER w <> 0
           THEN (value - lag(value, 1) OVER w) / lag(value, 1) OVER w
      END AS ret
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Lag-based fractional change (W4; reference daily_return: "
    "docs/databricks_setup.md:236-237).",
    tags=("window", "gold"),
)
def q23_step_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    prev = F.lag("value", 1).over(_w())
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(prev != 0, (F.col("value") - prev) / prev).alias("ret"),
    )


@query(
    "q24_keep_last_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
    doc="Keep-newest-row-per-key dedup via ROW_NUMBER (U2/W5; reference Silver "
    "MERGE rank: docs/databricks_setup.md:183-186).",
    tags=("window", "dedup", "gold"),
)
def q24_keep_last_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return keep_last(e, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


@query(
    "q25_top3_purchases_ranked",
    oracle="""
    SELECT user_id, event_id, value, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
      FROM events
      WHERE event_type = 'purchase'
    ) t
    WHERE rnk <= 3
    """,
    doc="Per-group top-n via ranking window.",
    tags=("window", "topk"),
)
def q25_top3_purchases_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.select("user_id", "event_id", "value", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q26_asof_purchase_view",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.ts AS asof_ts, v.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="Backward as-of join: each purchase matched to the newest view at or before it "
    "(the prices x latest-treasury-rate pattern, SURVEY.md §2.9).",
    tags=("join", "asof", "window"),
    bench=True,
)
def q26_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    # both sides are disjoint filters of the SAME stream: the
    # same-source as-of variant scans events once and pushes the union
    # into a tag expression — one scan, one key-shuffle, one sort
    # (bit-equal to asof_join on the two filtered frames; pinned by
    # tests/test_operators.py). Shuffle width sized from the footer row
    # count (purchase+view ~= 2 of 5 event types): at sf1 the window
    # input is ~400k rows, where the default 32-way exchange pays ~1.6x
    # in task scheduling over an 8-way one; at cluster scale the same
    # rule saturates the configured shuffle parallelism.
    width = asof_shuffle_width(
        tables.table_rows(sf_dir, "events") * 2 // 5, spark
    )
    return asof_join_filtered(
        e,
        on="user_id",
        time_col="ts",
        left_filter=F.col("event_type") == "purchase",
        right_filter=F.col("event_type") == "view",
        left_cols=["event_id", "user_id", "ts", "value"],
        value_cols=["value"],
        shuffle_width=width,
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "asof_ts",
        F.col("asof_value").alias("asof_value"),
    )


@query(
    "q27_lead_first_last",
    oracle="""
    SELECT event_id, user_id, ts,
      lead(value, 1) OVER w AS next_value,
      first_value(value) OVER w AS first_val,
      last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="LEAD / FIRST_VALUE / LAST_VALUE analytic battery (completes the §2.6 frame surface).",
    tags=("window",),
)
def q27_lead_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    wfull = _w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lead("value", 1).over(_w()).alias("next_value"),
        F.first("value").over(_w()).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"),
    )


@query(
    "q28_cumulative_value",
    oracle="""
    SELECT event_id, user_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM events
    """,
    doc="Running cumulative sum per key (exact decimal).",
    tags=("window",),
)
def q28_cumulative_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = _w().rowsBetween(Window.unboundedPreceding, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@query(
    "q67_zscore_normalize",
    oracle="""
    WITH stats AS (
      SELECT user_id,
             COUNT(value) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sq
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           CASE WHEN st.n > 1 AND (sq - s * s / st.n) > 0 THEN
             (e.value - s / st.n) / sqrt((sq - s * s / st.n) / (st.n - 1))
           END AS z
    FROM events e JOIN stats st ON e.user_id = st.user_id
    """,
    doc="Per-group z-score standardization (the grouped normalize pattern "
    "from the retrieved pandas-UDF snippets, as pure Catalyst: exact "
    "decimal moments -> deterministic double formula; the training-data "
    "feature-scaling pass).",
    tags=("window", "agg", "normalize", "ext"),
)
def q67_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = F.col("value").cast(DEC)
    stats = e.groupBy("user_id").agg(
        F.count("value").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("sq"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = F.when(
        (F.col("n") > 1) & ((F.col("sq") - F.col("s") * F.col("s") / F.col("n")) > 0),
        (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var),
    )
    return e.join(stats, "user_id").select("event_id", "user_id", "value", z.alias("z"))


@query(
    "q68_asof_with_tolerance",
    oracle="""
    WITH m AS MATERIALIZED (
      SELECT p.event_id, p.user_id, p.ts, p.value,
             v.ts AS asof_ts, v.value AS asof_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.ts >= v.ts
    )
    SELECT * FROM m WHERE m.asof_ts >= m.ts - INTERVAL 2 HOUR
    """,
    doc="As-of join with staleness tolerance (pandas merge_asof semantics): "
    "a view older than 2h cannot fill a purchase — the stale-treasury-rate "
    "guard the reference's Gold joins would need.",
    tags=("join", "asof", "window"),
)
def q68_asof_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="ts",
        value_cols=["value"], tolerance="2 HOURS",
    ).select("event_id", "user_id", "ts", "value", "asof_ts", "asof_value")


@query(
    "q69_percent_rank_cume_dist",
    oracle="""
    SELECT event_id, user_id,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    doc="Relative-position analytics: percent_rank and cume_dist per key "
    "(deterministic rational formulas — (rank-1)/(n-1) and rows<=cur/n).",
    tags=("window", "rank"),
)
def q69_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q73_bollinger_bands",
    oracle="""
    SELECT event_id, user_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(value) OVER w AS ma_20,
      CASE WHEN COUNT(value) OVER w > 1 THEN
        (CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(value) OVER w)
        + 2.0 * sqrt(greatest(
            (CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             - CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) * CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(value) OVER w)
            / (COUNT(value) OVER w - 1), 0.0))
      END AS upper_band,
      CASE WHEN COUNT(value) OVER w > 1 THEN
        (CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(value) OVER w)
        - 2.0 * sqrt(greatest(
            (CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             - CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) * CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(value) OVER w)
            / (COUNT(value) OVER w - 1), 0.0))
      END AS lower_band
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="Bollinger bands (ma_20 +/- 2 sigma): the classic mean-reversion "
    "envelope, from the same exact-decimal moment machinery as q21/q22.",
    tags=("window", "gold", "bollinger"),
)
def q73_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = _w().rowsBetween(-19, 0)
    v = F.col("value").cast(DEC)
    cnt = F.count("value").over(w)
    s = F.sum(v).over(w).cast("double")
    sq = F.sum(v * v).over(w).cast("double")
    ma = s / cnt
    sigma = F.sqrt(F.greatest((sq - s * s / cnt) / (cnt - 1), F.lit(0.0)))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        ma.alias("ma_20"),
        F.when(cnt > 1, ma + 2.0 * sigma).alias("upper_band"),
        F.when(cnt > 1, ma - 2.0 * sigma).alias("lower_band"),
    )


@query(
    "q74_rsi_14",
    oracle="""
    WITH diffs AS (
      SELECT event_id, user_id, ts,
             CAST(value AS DECIMAL(18,4)) - lag(CAST(value AS DECIMAL(18,4)), 1) OVER w AS d
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    gl AS (
      SELECT event_id, user_id, ts,
             CAST(SUM(CASE WHEN d > 0 THEN d ELSE CAST(0 AS DECIMAL(18,4)) END)
                  OVER w2 AS DOUBLE) AS gains,
             CAST(SUM(CASE WHEN d < 0 THEN -d ELSE CAST(0 AS DECIMAL(18,4)) END)
                  OVER w2 AS DOUBLE) AS losses,
             COUNT(d) OVER w2 AS nd
      FROM diffs
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN nd >= 14 AND losses > 0 THEN 100.0 - 100.0 / (1.0 + gains / losses)
                WHEN nd >= 14 AND losses = 0 AND gains > 0 THEN 100.0
           END AS rsi_14
    FROM gl
    """,
    doc="RSI-14 (simple-average variant): exact-decimal gain/loss sums over "
    "a 14-step frame, deterministic double formula — the momentum "
    "oscillator of the reference's domain.",
    tags=("window", "gold", "rsi"),
)
def q74_rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = F.col("value").cast(DEC)
    d = (v - F.lag(v, 1).over(_w())).alias("d")
    diffs = e.select("event_id", "user_id", "ts", d)
    w2 = _w().rowsBetween(-13, 0)
    zero = F.lit(0).cast(DEC)
    gains = F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(zero)).over(w2).cast("double")
    losses = F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(zero)).over(w2).cast("double")
    nd = F.count("d").over(w2)
    rsi = (
        F.when((nd >= 14) & (losses > 0), 100.0 - 100.0 / (1.0 + gains / losses))
        .when((nd >= 14) & (losses == 0) & (gains > 0), 100.0)
    )
    return diffs.select("event_id", "user_id", "ts", rsi.alias("rsi_14"))


@query(
    "q84_atr_14",
    oracle="""
    WITH candles AS (
      SELECT user_id,
             date_trunc('hour', ts) AS bucket_start,
             MAX(CAST(value AS DECIMAL(18,4))) AS high,
             MIN(CAST(value AS DECIMAL(18,4))) AS low,
             arg_max(CAST(value AS DECIMAL(18,4)), ts) AS close
      FROM events
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    tr AS (
      SELECT user_id, bucket_start,
             CAST(GREATEST(
               CAST(high - low AS DECIMAL(18,4)),
               CAST(ABS(high - lag(close, 1) OVER w) AS DECIMAL(18,4)),
               CAST(ABS(low - lag(close, 1) OVER w) AS DECIMAL(18,4))
             ) AS DECIMAL(18,4)) AS true_range
      FROM candles
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket_start)
    )
    SELECT user_id, bucket_start,
           CAST(true_range AS DOUBLE) AS true_range,
           CASE WHEN COUNT(true_range) OVER w2 >= 14
                THEN CAST(SUM(true_range) OVER w2 AS DOUBLE)
                     / COUNT(true_range) OVER w2
           END AS atr_14
    FROM tr
    WINDOW w2 AS (PARTITION BY user_id ORDER BY bucket_start ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    doc="ATR-14 over hourly candles: true range per bucket (max of "
    "high-low and the gaps to the previous close) averaged over a "
    "14-bucket frame — the volatility gold feature complementing "
    "Bollinger (q73) and RSI (q74). All candle math is DECIMAL from the "
    "first cast, so true ranges and their sums are exact in both "
    "engines; one shuffle on user_id serves candles, lag, and the "
    "rolling mean.",
    tags=("window", "gold", "atr", "ohlc"),
)
def q84_atr_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = F.col("value").cast(DEC)
    candles = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket_start")
    ).agg(
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, F.col("ts")).alias("close"),
    )
    wc = Window.partitionBy("user_id").orderBy("bucket_start")
    prev_close = F.lag("close", 1).over(wc)
    tr = candles.select(
        "user_id",
        "bucket_start",
        F.greatest(
            (F.col("high") - F.col("low")).cast(DEC),
            F.abs(F.col("high") - prev_close).cast(DEC),
            F.abs(F.col("low") - prev_close).cast(DEC),
        ).cast(DEC).alias("true_range"),
    )
    w2 = wc.rowsBetween(-13, 0)
    n = F.count("true_range").over(w2)
    atr = F.when(
        n >= 14, F.sum("true_range").over(w2).cast("double") / n
    )
    return tr.select(
        "user_id",
        "bucket_start",
        F.col("true_range").cast("double").alias("true_range"),
        atr.alias("atr_14"),
    )


@query(
    "q85_stochastic_oscillator",
    oracle="""
    WITH candles AS (
      SELECT user_id,
             date_trunc('hour', ts) AS bucket_start,
             MAX(CAST(value AS DECIMAL(18,4))) AS high,
             MIN(CAST(value AS DECIMAL(18,4))) AS low,
             arg_max(CAST(value AS DECIMAL(18,4)), ts) AS close
      FROM events
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    k AS (
      SELECT user_id, bucket_start,
             CASE WHEN COUNT(*) OVER w2 >= 14
                   AND MAX(high) OVER w2 > MIN(low) OVER w2
                  THEN CAST(close - MIN(low) OVER w2 AS DOUBLE)
                       / CAST(MAX(high) OVER w2 - MIN(low) OVER w2 AS DOUBLE) * 100.0
             END AS pct_k
      FROM candles
      WINDOW w2 AS (PARTITION BY user_id ORDER BY bucket_start ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket_start, pct_k,
           CASE WHEN lag(pct_k, 2) OVER w IS NOT NULL
                 AND lag(pct_k, 1) OVER w IS NOT NULL
                 AND pct_k IS NOT NULL
                THEN (pct_k + lag(pct_k, 1) OVER w + lag(pct_k, 2) OVER w) / 3.0
           END AS pct_d
    FROM k
    WINDOW w AS (PARTITION BY user_id ORDER BY bucket_start)
    """,
    doc="Stochastic oscillator over hourly candles: %K locates the close "
    "inside the 14-bucket high-low range (decimal-exact numerator and "
    "denominator, ONE double division), %D is the 3-sample smoothing "
    "written as an explicit lag chain — a fixed left-to-right addition "
    "tree, not a windowed float sum, so both engines accumulate "
    "identically. Same single user_id shuffle serves candles, the "
    "range frame, and the lag chain.",
    tags=("window", "gold", "stochastic", "ohlc"),
)
def q85_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = F.col("value").cast(DEC)
    candles = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket_start")
    ).agg(
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, F.col("ts")).alias("close"),
    )
    wc = Window.partitionBy("user_id").orderBy("bucket_start")
    w2 = wc.rowsBetween(-13, 0)
    hi, lo = F.max("high").over(w2), F.min("low").over(w2)
    pct_k = F.when(
        (F.count(F.lit(1)).over(w2) >= 14) & (hi > lo),
        (F.col("close") - lo).cast("double") / (hi - lo).cast("double") * 100.0,
    )
    k = candles.select("user_id", "bucket_start", pct_k.alias("pct_k"))
    k1, k2 = F.lag("pct_k", 1).over(wc), F.lag("pct_k", 2).over(wc)
    pct_d = F.when(
        k2.isNotNull() & k1.isNotNull() & F.col("pct_k").isNotNull(),
        (F.col("pct_k") + k1 + k2) / 3.0,
    )
    return k.select("user_id", "bucket_start", "pct_k", pct_d.alias("pct_d"))


@query(
    "q88_market_correlation",
    oracle="""
    WITH user_h AS (
      SELECT user_id, date_trunc('hour', ts) AS b,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(18,0)) AS x
      FROM events GROUP BY 1, 2
    ),
    market_h AS (
      SELECT date_trunc('hour', ts) AS b,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(18,0)) AS y
      FROM events GROUP BY 1
    ),
    joined AS (
      SELECT u.user_id, u.x, m.y FROM user_h u JOIN market_h m ON u.b = m.b
    ),
    moments AS (
      SELECT user_id,
             CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
      FROM joined GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_buckets,
           CASE WHEN n > 1
                 AND CAST(n * sxx - sx * sx AS DECIMAL(38,0)) > 0
                 AND CAST(n * syy - sy * sy AS DECIMAL(38,0)) > 0
                THEN CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE)
                     / (sqrt(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE))
                        * sqrt(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0)) AS DOUBLE)))
           END AS market_corr
    FROM moments
    """,
    doc="Per-user Pearson correlation of hourly activity against the "
    "whole-market hourly series — the beta/correlation gold feature. "
    "Bucket sums quantize to int64 cents, so every moment (sx, sxx, "
    "sxy, ...) and both covariance terms are EXACT DECIMAL(38,0) integers "
    "in both engines; floats appear only in the final division and sqrts "
    "over identical operands. Moments were int64 until the r8s2 sf1 sweep "
    "overflowed n*sxx past 2^63 — the failure the original design note "
    "predicted for 100 TB arrived at 1 GB, hence decimal end-to-end now.",
    tags=("window", "gold", "correlation", "agg"),
)
def q88_market_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # cents as DECIMAL(18,0): int64 moments overflow at sf1 already
    # (n * sxx crossed 2^63 — found by the r8s2 sf1 sweep, exactly as
    # the original docstring predicted), so every product and sum below
    # stays in decimal where both engines are exact to 38 digits.
    cents = (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("decimal(18,0)")
    user_h = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("b")
    ).agg(cents.alias("x"))
    market_h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("b")).agg(
        cents.alias("y")
    )
    joined = user_h.join(market_h, "b").select("user_id", "x", "y")
    m = joined.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    vx = (n * sxx - sx * sx).cast("decimal(38,0)")
    vy = (n * syy - sy * sy).cast("decimal(38,0)")
    cov = (n * sxy - sx * sy).cast("decimal(38,0)")
    corr = F.when(
        (n > 1) & (vx > 0) & (vy > 0),
        cov.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return m.select(
        "user_id", n.cast("bigint").alias("n_buckets"), corr.alias("market_corr")
    )
