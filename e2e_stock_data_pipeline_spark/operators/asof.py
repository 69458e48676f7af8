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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    filled = rhs.unionByName(lhs).select(
        "*",
        F.last(F.col(rtime), ignorenulls=True).over(w).alias("_matched_t"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col(tag) == 0)
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
    """
    tag = F.when(right_filter, F.lit(1)).when(left_filter, F.lit(0))
    # explicit disjunction BEFORE the computed tag: a filter on the CASE
    # expression can't push to the parquet scan, the raw predicate can
    b = (
        source.filter(left_filter | right_filter)
        .withColumn("_asof_tag", tag)
        .filter(F.col("_asof_tag").isNotNull())
    )
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
    filled = b.select(
        "*",
        F.last(F.when(is_r, F.col(time_col)), ignorenulls=True)
        .over(w)
        .alias(f"asof_{time_col}"),
        *[
            F.last(F.when(is_r, F.col(c)), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(~is_r)
    if how == "inner":
        out = out.filter(F.col(f"asof_{time_col}").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return out.select(
        *left_cols,
        f"asof_{time_col}",
        *[f"asof_{c}" for c in value_cols],
    )
