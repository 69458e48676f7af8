"""Round-8 session-4 additions — monitoring, audit, and robust-statistic
shapes the earlier tiers did not cover:

* q159 peak interval concurrency (sweep-line over [ts, ts+30min)
  sessions — the max-concurrent-sessions operator, distributed via the
  bucketed prefix-sum pattern instead of a data-sized global window);
* q160 Benford first-digit audit (fraud/data-quality screen over order
  amounts);
* q161 int8 embedding quantization with exact reconstruction-error
  accounting (the storage/serving compression step of an embedding
  pipeline);
* q162 per-group weighted median via the two-pass bucket histogram
  (exact, no per-group data-sized sort — the robust midpoint for the
  3-value skewed l_returnflag key);
* q163 Pareto frontier / skyline of parts (price down, size up) — the
  dominance filter, linear via per-size minima + suffix-min instead of
  the oracle's quadratic NOT EXISTS;
* q164 document-frequency drift between corpus halves (the
  distribution-shift monitor a training-mix owner watches).

Cross-engine numeric rules as everywhere else (plans/registry.py):
exact integer/decimal arithmetic wherever possible, fixed-point
floor(x * 1e6) of IDENTICAL double expression trees where a logarithm
is unavoidable, explicit total-order tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import QUANT, quantized
from ..sources import tables
from .queries_dedup import _SQL_SHINGLES as _SQL_SHINGLES_X
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q159: peak session concurrency per event type — the sweep-line
# interval-overlap operator. Each event opens a [ts, ts+30min) session;
# the answer is the maximum number of simultaneously open sessions and
# the earliest boundary instant attaining it. The classic formulation
# is a GLOBAL ordered running sum (one task at 100 TB); here the prefix
# sum is decomposed by hour bucket: net deltas aggregate per (type, ts),
# per-bucket sums roll up to a dimension-sized histogram whose exclusive
# prefix supplies each bucket's offset, and the only row-level window is
# PARTITIONED by (type, hour) — bounded by an hour of boundaries, never
# the full series. Ends sort before starts implicitly because deltas
# are pre-summed per instant (half-open intervals).
# --------------------------------------------------------------------------

_CONC_MINUTES = 30


@query(
    "q159_peak_concurrency",
    oracle=f"""
    WITH b AS (
      SELECT event_type, ts AS bts, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL {_CONC_MINUTES} MINUTE, -1 FROM events
    ),
    net AS (
      SELECT event_type, bts, CAST(SUM(delta) AS BIGINT) AS nd
      FROM b GROUP BY event_type, bts
    ),
    runs AS (
      SELECT event_type, bts,
             SUM(nd) OVER (PARTITION BY event_type ORDER BY bts) AS run
      FROM net
    ),
    peaks AS (
      SELECT event_type, MAX(run) AS peak FROM runs GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(p.peak AS BIGINT) AS peak_concurrency,
           MIN(r.bts) AS peak_ts
    FROM runs r JOIN peaks p
      ON r.event_type = p.event_type AND r.run = p.peak
    GROUP BY r.event_type, p.peak
    """,
    doc="Peak concurrent 30-minute sessions per event type (sweep-line): "
    "+1/-1 boundaries net-summed per instant, then a DISTRIBUTED prefix "
    "sum — per-hour bucket sums form a dimension-sized histogram whose "
    "exclusive prefix is each bucket's offset, and the running sum "
    "within a bucket is a window partitioned by (type, hour), never a "
    "single-task global window. Output: the peak and the earliest "
    "instant attaining it (exact tie policy: deltas at one instant are "
    "pre-summed, so touching end/start pairs cancel — half-open "
    "interval semantics in both engines).",
    tags=("window", "interval", "sweepline", "monitoring", "gold"),
)
def q159_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return peak_concurrency_plan(_t(spark, sf_dir, "events"))


def peak_concurrency_plan(e: DataFrame, minutes: int = _CONC_MINUTES) -> DataFrame:
    """The q159 plan over any (event_type, ts) frame — ONE definition
    shared by the registered query and the scale smoke (the ext5
    convention), so the smoke can never drift to timing a stale copy."""
    starts = e.select("event_type", F.col("ts").alias("bts"), F.lit(1).alias("delta"))
    ends = e.select(
        "event_type",
        F.expr(f"ts + INTERVAL {minutes} MINUTES").alias("bts"),
        F.lit(-1).alias("delta"),
    )
    net = (
        starts.unionByName(ends)
        .groupBy("event_type", "bts")
        .agg(F.sum("delta").cast("bigint").alias("nd"))
        .withColumn("bkt", F.date_trunc("hour", F.col("bts")))
    )
    hist = net.groupBy("event_type", "bkt").agg(F.sum("nd").alias("bd"))
    off = F.coalesce(
        F.sum("bd").over(
            Window.partitionBy("event_type")
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    offsets = hist.select("event_type", "bkt", off.alias("off"))
    runs = (
        net.join(F.broadcast(offsets), ["event_type", "bkt"])
        .withColumn(
            "run",
            F.col("off")
            + F.sum("nd").over(
                Window.partitionBy("event_type", "bkt")
                .orderBy("bts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("event_type", "bts", "run")
    )
    # single-pass argmax: min over (-run, bts) structs picks the highest
    # run and, among ties, the EARLIEST instant — no second traversal of
    # the runs subtree (a peaks+join-back formulation executes it twice)
    m = runs.groupBy("event_type").agg(
        F.min(F.struct((-F.col("run")).alias("nrun"), F.col("bts"))).alias("m")
    )
    return m.select(
        "event_type",
        (-F.col("m.nrun")).cast("bigint").alias("peak_concurrency"),
        F.col("m.bts").alias("peak_ts"),
    )


# --------------------------------------------------------------------------
# q160: Benford first-digit audit over order amounts — the classic
# fraud / synthetic-data screen. Counts per leading digit of the int64
# cent amount, observed share vs Benford's log10(1 + 1/d) expectation,
# both in integer ppm (the expectation through ONE identical double
# tree, floored). Pure two-level hash aggregate + a 9-row broadcast.
# --------------------------------------------------------------------------


@query(
    "q160_benford_audit",
    oracle="""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM orders
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cents WHERE c > 0 GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM digits)
    SELECT d.digit, d.n,
           CAST((d.n * 1000000) // t.total AS BIGINT) AS observed_ppm,
           CAST(floor(ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE)) / ln(10.0) * 1000000) AS BIGINT) AS benford_ppm,
           CAST((d.n * 1000000) // t.total
                - CAST(floor(ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE)) / ln(10.0) * 1000000) AS BIGINT)
                AS BIGINT) AS dev_ppm
    FROM digits d CROSS JOIN tot t
    """,
    doc="Benford's-law first-digit audit of order amounts: per leading "
    "digit of the exact int64 cent value — count, observed share in "
    "integer ppm (truncating DIV), the Benford expectation "
    "floor(log10(1+1/d) * 1e6) via one identical double tree, and the "
    "signed deviation. The digit is taken from the decimal string (no "
    "float log10 on the data path); one hash aggregate plus a 9-row "
    "broadcast total — nothing data-sized after the scan.",
    tags=("agg", "quality", "audit", "benford", "gold"),
)
def q160_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    digits = (
        o.select(cents.alias("c"))
        .filter(F.col("c") > 0)
        .groupBy(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = digits.agg(F.sum("n").cast("bigint").alias("total"))
    benford = F.floor(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0))
        * 1000000
    ).cast("bigint")
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("CAST((n * 1000000) DIV total AS BIGINT)").alias("observed_ppm"),
            benford.alias("benford_ppm"),
            (
                F.expr("CAST((n * 1000000) DIV total AS BIGINT)") - benford
            ).cast("bigint").alias("dev_ppm"),
        )
    )


# --------------------------------------------------------------------------
# q161: int8 embedding quantization audit — symmetric per-vector int8
# compression (code = round-toward-zero of q * 127 / max|q|) with exact
# integer reconstruction-error accounting per label. Every step runs on
# the q48-convention QUANT-quantized integer vectors, so codes, the
# reconstruction, and the summed squared error are bit-identical in
# both engines — no float round() semantics anywhere. The compression
# ratio a serving tier buys (4 bytes -> 1 byte) priced in exact SSE.
# --------------------------------------------------------------------------

_SQL_QV = f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"


@query(
    "q161_int8_quantization",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {_SQL_QV} AS qv FROM embeddings),
    el AS (
      SELECT vec_id, label, unnest(qv) AS qx FROM q
    ),
    m AS (
      SELECT vec_id, CAST(MAX(abs(qx)) AS BIGINT) AS ma FROM el GROUP BY vec_id
    ),
    err AS (
      SELECT el.vec_id, el.label,
             el.qx - (CASE WHEN el.qx < 0
                           THEN -(((abs(el.qx) * 127) // m.ma) * m.ma // 127)
                           ELSE ((el.qx * 127) // m.ma) * m.ma // 127 END) AS e
      FROM el JOIN m ON el.vec_id = m.vec_id
      WHERE m.ma > 0
    ),
    sse AS (
      SELECT vec_id, label, CAST(SUM(e * e) AS BIGINT) AS sse
      FROM err GROUP BY vec_id, label
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(sse) AS BIGINT) AS sum_sse,
           CAST(MAX(sse) AS BIGINT) AS max_sse
    FROM sse GROUP BY label
    """,
    doc="Int8 quantization audit per label: vectors quantized to integer "
    f"units (floor(x * {QUANT}), the q48 parity convention), int8 code "
    "= sign-decomposed (|q| * 127) DIV max|q|, reconstruction = "
    "(|code| * max|q|) DIV 127 with the sign restored, and SSE of the "
    "integer residuals summed exactly per vector then per label. "
    "All-integer arithmetic end to end — both engines agree bit-for-"
    "bit. Spark side stays in Catalyst array land (transform/aggregate "
    "— no explode, no shuffle before the per-label aggregate); the "
    "oracle unnests to rows, an independent formulation of the same "
    "math.",
    tags=("ext", "embedding", "quantization", "compression", "audit"),
)
def q161_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qv = quantized("embedding")
    withq = e.select("vec_id", "label", qv.alias("qv")).withColumn(
        "ma", F.array_max(F.transform(F.col("qv"), lambda x: F.abs(x)))
    )
    # integer int8 round-trip residual per element; sign-decomposed DIV
    # so Spark and DuckDB truncate identically on negatives
    err_sq_sum = F.expr(
        "aggregate("
        "  transform(qv, x -> x - (CASE WHEN x < 0"
        "    THEN -((((-x) * 127) DIV ma) * ma DIV 127)"
        "    ELSE (((x * 127) DIV ma) * ma DIV 127) END)),"
        "  CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"
    )
    sse = (
        withq.filter(F.col("ma") > 0)
        .select("vec_id", "label", err_sq_sum.cast("bigint").alias("sse"))
    )
    return sse.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("sse").cast("bigint").alias("sum_sse"),
        F.max("sse").cast("bigint").alias("max_sse"),
    )


# --------------------------------------------------------------------------
# q162: exact weighted median per return flag — the robust midpoint
# (price weighted by quantity) over a 3-value group key, i.e. exactly
# the low-cardinality skew case where Window.partitionBy(flag) would
# sort a third of the table in one task. Two-pass bucket histogram
# instead: fixed-width price buckets aggregate weights (dimension-
# sized), the prefix sum locates each group's boundary bucket, and only
# boundary-bucket rows pay a row-level window — partitioned by (flag,
# bucket), bounded by the bucket width. Definition: smallest price p
# with 2 * cumweight(<= p) >= total weight (all-integer test).
# --------------------------------------------------------------------------

_WM_BUCKET = 100000  # cents per histogram bucket


@query(
    "q162_weighted_median",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    pp AS (
      SELECT l_returnflag, pc, CAST(SUM(w) AS BIGINT) AS w
      FROM r GROUP BY l_returnflag, pc
    ),
    c AS (
      SELECT l_returnflag, pc, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY pc) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM pp
    )
    SELECT l_returnflag,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN pc END) AS BIGINT) AS median_cents
    FROM c GROUP BY l_returnflag
    """,
    doc="Exact quantity-weighted median price per return flag: smallest "
    "price with 2*cumweight >= total (all-integer, no interpolation "
    "ambiguity). The flag key has 3 values — a per-group sort window "
    "would put ~a third of the table in one task — so the engine runs "
    "the two-pass bucket histogram: weights aggregate per (flag, "
    "100k-cent bucket), the dimension-sized histogram's prefix sum "
    "finds each flag's boundary bucket and the weight already below "
    "it, and ONLY boundary-bucket rows run a cumulative window "
    "(partitioned by flag+bucket, bounded by bucket width). The "
    "oracle is the direct one-window formulation — independent path, "
    "identical integers.",
    tags=("agg", "median", "robust", "skew", "twopass", "gold"),
)
def q162_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    r = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("pc"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    return weighted_median_plan(r, "l_returnflag")


def weighted_median_plan(
    r: DataFrame, group_col: str, bucket: int = _WM_BUCKET
) -> DataFrame:
    """The q162 two-pass bucket-histogram weighted median over any
    (group_col, pc, w) frame — shared by the registered query and the
    scale smoke. `pc` must be a non-negative bigint value, `w` a
    positive bigint weight."""
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
        F.sum("bw")
        .over(Window.partitionBy(group_col))
        .alias("tw"),
    )
    boundary = cum.filter(
        (2 * F.col("through") >= F.col("tw")) & (2 * F.col("below") < F.col("tw"))
    ).select(group_col, "bkt", "below", "tw")
    # second pass: only boundary-bucket rows, cumulative weight within,
    # offset by the histogram's weight below the bucket
    inb = (
        rb.join(F.broadcast(boundary), [group_col, "bkt"])
        .groupBy(group_col, "bkt", "below", "tw", "pc")
        .agg(F.sum("w").alias("w"))
    )
    run = inb.withColumn(
        "cw",
        F.col("below")
        + F.sum("w").over(
            Window.partitionBy(group_col, "bkt")
            .orderBy("pc")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        run.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy(group_col)
        .agg(
            F.max("tw").cast("bigint").alias("total_weight"),
            F.min("pc").cast("bigint").alias("median_cents"),
        )
    )


# --------------------------------------------------------------------------
# q163: Pareto frontier (skyline) of parts — cheapest price for each
# level of size: a part survives iff nothing is simultaneously >= on
# size and <= on price with one strict. The oracle states dominance
# directly (quadratic NOT EXISTS — fine at gate sf); the engine is
# linear: per-size minimum price (the size domain is dimension-sized),
# suffix-min over strictly larger sizes, survive iff cheapest at your
# size AND strictly cheaper than everything larger. Frontier points
# aggregate surviving parts.
# --------------------------------------------------------------------------


@query(
    "q163_pareto_frontier",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_size,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
      FROM part
    ),
    sky AS (
      SELECT a.p_size, a.pc FROM p a
      WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.p_size >= a.p_size AND b.pc <= a.pc
          AND (b.p_size > a.p_size OR b.pc < a.pc)
      )
    )
    SELECT p_size, pc AS price_cents, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM sky GROUP BY p_size, pc
    """,
    doc="Pareto frontier of parts (maximize size, minimize price): a part "
    "is on the skyline iff no part is >= in size and <= in price with "
    "one strict. Engine path is LINEAR in the data: min price per size "
    "(size is a bounded dimension), suffix-min over strictly larger "
    "sizes via a dimension-sized window, survivors = rows matching "
    "their size's min and strictly under the larger-size suffix-min. "
    "The oracle is the textbook quadratic NOT EXISTS — an independent "
    "statement of dominance the linear plan must reproduce exactly. "
    "Prices compared as exact int64 cents.",
    tags=("skyline", "pareto", "dominance", "gold"),
)
def q163_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_size",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("pc"),
    )
    per_size = p.groupBy("p_size").agg(F.min("pc").alias("minp"))
    # suffix-min of min-price over strictly larger sizes (dimension-sized)
    suf = per_size.select(
        "p_size",
        "minp",
        F.min("minp")
        .over(
            Window.orderBy(F.col("p_size").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("suf_larger"),
    )
    frontier_sizes = suf.filter(
        (F.col("suf_larger").isNull()) | (F.col("minp") < F.col("suf_larger"))
    ).select("p_size", "minp")
    return (
        p.join(F.broadcast(frontier_sizes), "p_size")
        .filter(F.col("pc") == F.col("minp"))
        .groupBy("p_size", F.col("pc").alias("price_cents"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )


# --------------------------------------------------------------------------
# q164: document-frequency drift between corpus halves — the
# distribution-shift monitor: words whose document-frequency rate (ppm
# of docs containing the word) moved most between the doc_id-even and
# doc_id-odd halves. Conditional-sum flags in one word-keyed aggregate,
# corpus sizes broadcast, top-25 by absolute ppm delta. The shape a
# training-mix owner runs when a new crawl snapshot lands.
# --------------------------------------------------------------------------

_DRIFT_MIN_DF = 5


@query(
    "q164_df_drift",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS word
      FROM documents
    ),
    halves AS (
      SELECT CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM documents
    ),
    dfx AS (
      SELECT word,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_a,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS df_b
      FROM w GROUP BY word
    ),
    rated AS (
      SELECT d.word, d.df_a, d.df_b,
             CAST((d.df_a * 1000000) // h.n_a AS BIGINT) AS rate_a_ppm,
             CAST((d.df_b * 1000000) // h.n_b AS BIGINT) AS rate_b_ppm
      FROM dfx d CROSS JOIN halves h
      WHERE d.df_a + d.df_b >= {_DRIFT_MIN_DF}
    )
    SELECT word, df_a, df_b, rate_a_ppm, rate_b_ppm,
           CAST(abs(rate_a_ppm - rate_b_ppm) AS BIGINT) AS drift_ppm
    FROM rated
    ORDER BY drift_ppm DESC, word LIMIT 25
    """,
    doc="Top-25 words by document-frequency drift between the doc_id-even "
    "and doc_id-odd corpus halves: per-word distinct-doc flags "
    "conditional-summed in ONE word-keyed aggregate, half sizes "
    "broadcast, rates in integer ppm (truncating DIV), ranked by "
    f"absolute delta (min combined df {_DRIFT_MIN_DF}). Distributed "
    "partial top-k; nothing but the word-keyed shuffle is data-sized.",
    tags=("text", "drift", "monitoring", "ext"),
)
def q164_df_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select("doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("word"))
        .distinct()
    )
    halves = docs.agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    dfx = w.groupBy("word").agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("df_a"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("df_b"),
    )
    rated = (
        dfx.filter(F.col("df_a") + F.col("df_b") >= _DRIFT_MIN_DF)
        .crossJoin(F.broadcast(halves))
        .select(
            "word",
            "df_a",
            "df_b",
            F.expr("CAST((df_a * 1000000) DIV n_a AS BIGINT)").alias("rate_a_ppm"),
            F.expr("CAST((df_b * 1000000) DIV n_b AS BIGINT)").alias("rate_b_ppm"),
        )
    )
    return (
        rated.select(
            "word",
            "df_a",
            "df_b",
            "rate_a_ppm",
            "rate_b_ppm",
            F.abs(F.col("rate_a_ppm") - F.col("rate_b_ppm"))
            .cast("bigint")
            .alias("drift_ppm"),
        )
        .orderBy(F.col("drift_ppm").desc(), "word")
        .limit(25)
    )


# --------------------------------------------------------------------------
# q165: calendar gap-fill with LINEAR interpolation — q135's densify
# step, but interior holes take the straight line between the previous
# and next observed close instead of repeating the last one (the repair
# a returns/volatility series wants: ffill manufactures zero-return
# days, interpolation spreads the move). All arithmetic is integer
# fixed-point: values in DECIMAL(18,4)*10000 units, the slope step a
# sign-decomposed truncating DIV — identical in both engines. Every
# window partitions on the high-cardinality user key.
# --------------------------------------------------------------------------


@query(
    "q165_gap_fill_interp",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_fp,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS r
      FROM events
    ),
    obs AS (SELECT user_id, day, v_fp AS obs_fp FROM daily WHERE r = 1),
    span AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM obs GROUP BY user_id),
    cal AS (SELECT user_id,
                   CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
            FROM span),
    j AS (SELECT c.user_id, c.day, o.obs_fp
          FROM cal c LEFT JOIN obs o ON o.user_id = c.user_id AND o.day = c.day),
    nb AS (
      SELECT user_id, day, obs_fp,
             last_value(obs_fp IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN obs_fp IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(obs_fp IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN obs_fp IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, day,
           CAST(CASE WHEN obs_fp IS NOT NULL THEN obs_fp
                ELSE pv + (CASE WHEN (nv - pv) * (day - pd) < 0
                           THEN -((-((nv - pv) * (day - pd))) // (nd - pd))
                           ELSE ((nv - pv) * (day - pd)) // (nd - pd) END)
                END AS BIGINT) AS value_fp,
           (obs_fp IS NULL) AS is_filled
    FROM nb
    """,
    doc="Daily resample + LINEAR interpolation: per key, close-of-day "
    "value (last tick wins), densified to the key's min..max calendar, "
    "interior holes take prev + (next-prev)*(day-prev_day) DIV "
    "(next_day-prev_day) in exact DECIMAL(18,4)-derived fixed-point "
    "units with a sign-decomposed truncating division (identical "
    "integers both engines; span endpoints are always observed, so "
    "every hole has both neighbors). Engine-side the oracle's densify-"
    "join-window shape is fused: daily close is a max_by hash "
    "aggregate, neighbors come from one lead() window over the "
    "observation frame, and each gap explodes with its own endpoints "
    "attached — no calendar join, no ignore-nulls pass over the "
    "span-sized frame; explode fan-out stays bounded by the date span.",
    tags=("window", "timeseries", "gapfill", "interpolation", "gold"),
)
def q165_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fused single-window formulation (r9): the oracle's densify-then-
    # neighbor shape (calendar explode -> left join -> two ignore-nulls
    # window passes over the SPAN-sized frame) is equivalent to lead()
    # neighbors over the OBSERVATION-sized frame followed by a per-gap
    # explode that carries its own (prev, next) endpoints. Same
    # integers, strictly less work: the daily close becomes a hash
    # aggregate (max_by on the (ts, event_id) tiebreak struct — partial
    # map-side combine, no sort over raw events), the span groupBy and
    # calendar join disappear, and the only window is one lead() sort
    # over distinct (user, day) observations.
    e = _t(spark, sf_dir, "events")
    # one exchange serves everything: sort within user partitions by
    # (day, tie); the last row of each day IS the daily close (max
    # (ts, event_id)), detected with lead(day) — and the second lead()
    # window reuses the same partitioning and an ordering the sorted,
    # filtered frame already satisfies, so Catalyst elides its sort
    base = e.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("v_fp"),
        F.struct("ts", "event_id").alias("tie"),
    )
    w_full = Window.partitionBy("user_id").orderBy("day", F.col("tie").asc())
    closes = base.withColumn("nxt_day", F.lead("day").over(w_full)).filter(
        (F.col("nxt_day").isNull()) | (F.col("nxt_day") != F.col("day"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    nb = closes.select(
        "user_id",
        F.col("day").alias("pd"),
        F.col("v_fp").alias("pv"),
        F.lead("v_fp").over(w).alias("nv"),
        F.lead("day").over(w).alias("nd"),
    )
    # each observation owns the half-open run [pd, nd); the last
    # observation (nd null) owns just itself — union covers the user's
    # min..max calendar exactly once per day
    runs = nb.select(
        "user_id",
        "pd",
        "pv",
        "nv",
        "nd",
        F.explode(
            F.sequence(
                "pd", F.coalesce(F.date_sub("nd", 1), "pd"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day"),
    )
    # sign-decomposed truncating integer division (den >= 2 on every
    # hole: both neighbors observed, at least one day between them)
    step = F.expr(
        "CASE WHEN (nv - pv) * datediff(`day`, pd) < 0"
        " THEN -((-((nv - pv) * datediff(`day`, pd))) DIV datediff(nd, pd))"
        " ELSE ((nv - pv) * datediff(`day`, pd)) DIV datediff(nd, pd) END"
    )
    return runs.select(
        "user_id",
        "day",
        F.when(F.col("day") == F.col("pd"), F.col("pv"))
        .otherwise(F.col("pv") + step)
        .cast("bigint")
        .alias("value_fp"),
        (F.col("day") != F.col("pd")).alias("is_filled"),
    )


# --------------------------------------------------------------------------
# q166: vocabulary growth curve — distinct 3-gram shingles introduced
# per ingestion decile (doc_id order) and the cumulative total: the
# saturation diagnostic that tells a corpus owner whether the next 10%
# of crawl still buys new content. One aggregate keyed on shingle
# (min doc_id), a broadcast of the max id, and a 10-row window.
# --------------------------------------------------------------------------


@query(
    "q166_vocab_growth",
    oracle=f"""
    WITH {_SQL_SHINGLES_X},
    firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM shingled GROUP BY shingle),
    mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    perd AS (
      SELECT CAST((f.first_doc * 10) // m.n AS INT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_new_shingles
      FROM firsts f CROSS JOIN mx m
      GROUP BY 1
    )
    SELECT decile, n_new_shingles,
           CAST(SUM(n_new_shingles) OVER (ORDER BY decile) AS BIGINT) AS cum_shingles
    FROM perd
    """,
    doc="Vocabulary growth by ingestion decile: each distinct 3-gram "
    "shingle is charged to the decile of the FIRST doc_id containing "
    "it ((first_doc * 10) DIV (max_id + 1)); output is new-shingle "
    "count per decile plus the cumulative curve. The shingle explode "
    "feeds ONE min-aggregate keyed on shingle (map-side combinable), "
    "the corpus size is a broadcast scalar, and the cumulative window "
    "runs over 10 rows. The q42 shingle construction (3-token windows "
    "over the trimmed split) on both sides.",
    tags=("text", "vocabulary", "saturation", "curation", "ext"),
)
def q166_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exploded_shingles

    docs = _t(spark, sf_dir, "documents")
    # distinct=False: MIN(doc_id) over the shingle multiset equals MIN
    # over its set, so the per-doc dedup shuffle is pure cost here (the
    # oracle's DISTINCT feeds COUNT(*) of firsts, also multiset-invariant).
    sh = exploded_shingles(docs, distinct=False)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    mx = docs.agg((F.max("doc_id") + 1).alias("n"))
    perd = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(F.expr("CAST((first_doc * 10) DIV n AS INT)").alias("decile"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_shingles"))
    )
    return perd.select(
        "decile",
        "n_new_shingles",
        F.sum("n_new_shingles")
        .over(
            Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("cum_shingles"),
    )
