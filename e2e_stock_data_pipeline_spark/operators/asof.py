"""As-of (point-in-time) join.

The reference's Gold layer implies two as-of joins with no
implementation (SURVEY.md §2.9): prices x latest treasury rate with
rate_date <= trade_date, and prices x latest filing with
filing_date <= trade_date. Spark has no ASOF JOIN builtin, so the
engine provides one built from a union + ordered window — the shape
that scales: ONE shuffle on the join key, one sort, no range
explosion, no driver collect.

Algorithm (backward as-of, ties include equality):
  1. tag right rows 1, left rows 0; union by (key, t) with left's
     payload nulled on right rows and vice versa;
  2. window per key ordered by (t, tag DESC, right-time) —
     tag DESC puts the right row *before* a left row at equal t, so
     "<=" semantics fall out;
  3. last(right_value, ignoreNulls) over unbounded-preceding..current
     fills each left row with the newest right value at or before t;
  4. keep left rows; inner semantics = drop rows with no match.

Equivalent to DuckDB `ASOF JOIN ... ON l.key = r.key AND l.t >= r.t`
(when right (key, t) pairs are unique, which callers should ensure —
otherwise the right row with the GREATEST (value_cols...) tuple wins,
pinned by a final ordering key on the value columns themselves so the
winner never depends on partition/task order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Window-sort task sizing: below MIN rows/task, per-task scheduling
# overhead dominates the sort (measured at sf1: 400k rows over 32 tasks
# is ~1.6x slower end-to-end than over 8); above MAX rows/task the
# per-partition sort risks spilling. Width is clamped to the session's
# configured shuffle parallelism except when the memory bound demands
# more — so a 100 TB input still fans out to (at least) full cluster
# width while a 400k-row input stops paying for 32 task launches.
_ASOF_MIN_ROWS_PER_TASK = 50_000
_ASOF_MAX_ROWS_PER_TASK = 5_000_000


def asof_shuffle_width(n_rows: int, spark: SparkSession) -> int:
    """Shuffle width for the as-of window given an (estimated) input row
    count: ceil(n/MIN_ROWS_PER_TASK) capped at the configured
    ``spark.sql.shuffle.partitions``, but never below
    ceil(n/MAX_ROWS_PER_TASK) (each per-partition sort must fit). Row
    counts can come from parquet footer metadata (driver-side, no job)."""
    try:
        configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        configured = 200
    want = max(1, -(-n_rows // _ASOF_MIN_ROWS_PER_TASK))
    need = max(1, -(-n_rows // _ASOF_MAX_ROWS_PER_TASK))
    return max(need, min(want, configured))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row at or before
    (direction="backward") / at or after ("forward") its time, within the
    same `on` key. ``tolerance`` (an INTERVAL string, e.g. "1 hour") caps
    staleness: matches farther than that from left_time are discarded —
    pandas merge_asof semantics (a stale treasury rate should NOT fill a
    price from months later).

    Forward is implemented as backward over negated epoch ordering — one
    code path, both directions. Result columns: all of ``left`` +
    ``asof_<right_time>`` (matched time) + ``asof_<value_col>``.
    ``how`` is "inner" or "left".
    """
    if direction == "forward":
        if tolerance is not None:
            raise ValueError("tolerance is only supported for direction='backward'")
        neg = "_asof_negt"
        l2 = left.withColumn(neg, -F.unix_micros(F.col(left_time).cast("timestamp")))
        r2 = right.withColumn(neg, -F.unix_micros(F.col(right_time).cast("timestamp")))
        out = asof_join(
            l2, r2, on, neg, neg, value_cols + [right_time], how, "backward"
        )
        return out.drop(neg, f"asof_{neg}")
    if direction != "backward":
        raise ValueError(f"unsupported direction {direction!r}")
    lcols = left.columns
    tag = "_asof_is_right"
    rtime = "_asof_rtime"

    lhs = left.select(
        F.col(on).alias("_asof_key"),
        F.col(left_time).alias("_asof_t"),
        F.lit(0).alias(tag),
        F.lit(None).cast(right.schema[right_time].dataType).alias(rtime),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.struct(*lcols).alias("_asof_payload"),
    )
    rhs = right.select(
        F.col(on).alias("_asof_key"),
        F.col(right_time).alias("_asof_t"),
        F.lit(1).alias(tag),
        F.col(right_time).alias(rtime),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_asof_payload"),
    )

    # final ordering keys: among right rows sharing (key, t) — where rtime
    # offers no extra discrimination — the value columns themselves break
    # the tie, so last() deterministically fills with the greatest
    # (value_cols...) tuple instead of whichever row the task order
    # happened to place last. Left rows all carry nulls there (nulls sort
    # first, and their relative order cannot change any fill: a left row's
    # frame sees every equal-t right row either way).
    w = (
        Window.partitionBy("_asof_key")
        .orderBy(
            F.col("_asof_t"),
            F.col(tag).desc(),
            F.col(rtime),
            *[F.col(f"_r_{c}") for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct-valued running fill instead of 1+len(value_cols)
    # window aggregates: WindowExec evaluates each aggregate separately,
    # so packing (rtime, values...) into a single last(ignorenulls)
    # struct halves (or better) the window pass — and guarantees every
    # output column comes from the SAME winning right row. The struct is
    # built under F.when(tag==1, ...): left rows must contribute a NULL
    # struct, not a struct of nulls, for ignorenulls to skip them.
    m = "_asof_match"
    filled = rhs.unionByName(lhs).select(
        "*",
        F.last(
            F.when(
                F.col(tag) == 1,
                F.struct(
                    F.col(rtime).alias("t"),
                    *[F.col(f"_r_{c}").alias(c) for c in value_cols],
                ),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias(m),
    )
    out = filled.filter(F.col(tag) == 0).select(
        "*",
        F.col(f"{m}.t").alias("_matched_t"),
        *[F.col(f"{m}.{c}").alias(f"_m_{c}") for c in value_cols],
    )
    if tolerance is not None:
        out = out.withColumn(
            "_fresh",
            F.col("_matched_t").isNotNull()
            & (F.col("_matched_t") >= F.col("_asof_t") - F.expr(f"INTERVAL {tolerance}")),
        )
        if how == "left":
            # stale matches revert to unmatched (nulls), row is kept
            out = out.withColumn(
                "_matched_t", F.when(F.col("_fresh"), F.col("_matched_t"))
            )
            for c in value_cols:
                out = out.withColumn(f"_m_{c}", F.when(F.col("_fresh"), F.col(f"_m_{c}")))
        else:
            out = out.filter(F.col("_fresh"))
        out = out.drop("_fresh")
    if how == "inner":
        out = out.filter(F.col("_matched_t").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return out.select(
        *[F.col(f"_asof_payload.{c}").alias(c) for c in lcols],
        F.col("_matched_t").alias(f"asof_{right_time}"),
        *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_filtered(
    source: DataFrame,
    on: str,
    time_col: str,
    left_filter,
    right_filter,
    left_cols: list[str],
    value_cols: list[str],
    how: str = "inner",
    shuffle_width: int | None = None,
) -> DataFrame:
    """Same-source as-of join: backward as-of between two DISJOINT
    filtered views of ONE DataFrame (e.g. purchases vs views of the
    same event stream) without materializing the union of two scans.

    ``asof_join`` is source-agnostic: it unions two inputs, which for
    the common "both sides are filters of the same table" case scans
    and shuffles the table twice. Here the union is a tag expression
    on a single scan — rows matching ``right_filter`` act as the right
    side, rows matching ``left_filter`` as the left, everything else is
    dropped before the one key-shuffle + sort. Same window fill as
    asof_join (ties: a right row at equal time matches, tag-desc
    ordering), bit-identical results (pinned by test against
    asof_join on the same inputs).

    ``left_filter`` and ``right_filter`` must be disjoint predicates —
    a row satisfying both would act only as a right row here, whereas
    asof_join's union would duplicate it on both sides.

    Output: ``left_cols`` + ``asof_<time_col>`` + ``asof_<c>`` for each
    value col. ``how`` is "inner" or "left".

    ``shuffle_width``: explicit partition count for the window exchange
    (see :func:`asof_shuffle_width`). The default exchange inherits the
    session's ``spark.sql.shuffle.partitions`` — right for big inputs,
    but for an input of a few hundred thousand rows the per-task
    scheduling overhead dominates the tiny per-partition sorts; callers
    that know the input size (e.g. from parquet footer metadata) should
    pass ``asof_shuffle_width(n_rows, spark)``.
    """
    # explicit disjunction BEFORE the computed tag: a filter on the CASE
    # expression can't push to the parquet scan, the raw predicate can.
    # After that filter every surviving row matches at least one side, so
    # the tag needs ONE branch (right? 1 : 0) — the two-WHEN form plus an
    # isNotNull filter re-evaluated both predicates per row (up to four
    # extra string compares per scanned row at sf1).
    b = source.filter(left_filter | right_filter).withColumn(
        "_asof_tag", F.when(right_filter, F.lit(1)).otherwise(F.lit(0))
    )
    if shuffle_width is not None:
        # hash-repartition on the window key: satisfies the window's
        # ClusteredDistribution, so this REPLACES (not precedes) the
        # ENSURE_REQUIREMENTS exchange — one shuffle either way, at the
        # caller-chosen width
        b = b.repartition(shuffle_width, on)
    # value columns as final ordering keys: multiple RIGHT rows sharing
    # (key, time) — possible over raw event data — would otherwise fill
    # left rows with whichever one the task order placed last; ordering
    # by the values pins the greatest (value_cols...) tuple. Left rows'
    # relative order is irrelevant: every equal-time right row sorts
    # before them (tag desc) and left rows contribute only nulls to the
    # ignorenulls last().
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(time_col),
            F.col("_asof_tag").desc(),
            *[F.col(c) for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_r = F.col("_asof_tag") == 1
    # one struct-valued fill (same rationale as asof_join): a single
    # window aggregate carries the matched time and every value column
    # from the same winning right row
    filled = b.select(
        "*",
        F.last(
            F.when(
                is_r,
                F.struct(
                    F.col(time_col).alias("t"),
                    *[F.col(c).alias(c) for c in value_cols],
                ),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("_asof_match"),
    )
    out = filled.filter(~is_r).select(
        "*",
        F.col("_asof_match.t").alias(f"asof_{time_col}"),
        *[F.col(f"_asof_match.{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{time_col}").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return out.select(
        *left_cols,
        f"asof_{time_col}",
        *[f"asof_{c}" for c in value_cols],
    )
