"""Skew-mitigation joins (SURVEY.md §4 / the 100 TB design notes).

AQE's skew-join splitting handles sort-merge skew automatically; salting
is the explicit fallback for the cases AQE can't fix (e.g., a shuffled
hash join against a hot key in a non-AQE stage, or aggregations keyed on
a power-law column):

* salted_join: replicate the small side R times, scatter the big side's
  hot keys across R salt buckets -> no single reducer owns a hot key.
* two_phase_agg: partial agg on (key, salt) then final agg on key —
  classic map-side scatter for skewed groupBy.

Both are semantics-preserving rewrites, verified against the unsalted
plans in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Output equals big.join(small, key, how) for how in {inner, left,
    left_semi}; the shuffle key becomes (key, salt) so a hot key spreads
    over `num_salts` reducers. Use when the small side is too big to
    broadcast but small enough to replicate R times.

    Right/full-outer are rejected: the small side is replicated across
    all salts, so every unmatched small-side row would surface once per
    salt — num_salts phantom rows per miss. (left_anti is rejected for
    the mirror reason on the big side.) The salt is derived from the full
    row content (pmod of hash over every column), not a random id: hot-key
    rows still scatter across salts (their non-key columns differ) while
    task retries re-produce byte-identical salts.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi", "left_semi"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r}: the "
            "replicated small side would emit unmatched rows once per salt"
        )
    spark = big.sparkSession
    salts = F.broadcast(spark.range(num_salts).select(F.col("id").cast("int").alias("_salt")))
    big_s = big.withColumn(
        "_salt",
        (F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(num_salts))).cast("int"),
    )
    small_s = small.crossJoin(salts)
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    num_salts: int = 16,
) -> DataFrame:
    """Skew-safe groupBy: partial aggregate on (key, salt), final on key.

    agg_exprs maps output column -> one of 'sum'/'count'/'min'/'max' over
    an input column, e.g. {"total": "sum:value", "n": "count:*"}.
    (Spark's hash aggregate already does map-side partials; the explicit
    two-phase form additionally randomizes the FIRST shuffle so one hot
    key spreads across reducers.)
    """
    # Row-content salt: deterministic across task retries (unlike
    # monotonically_increasing_id), still scatters a hot key's rows.
    salt = (F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(num_salts))).cast("int")
    partial_aggs, final_aggs = [], []
    for out_col, spec in agg_exprs.items():
        op, col = spec.split(":", 1)
        tmp = f"_p_{out_col}"
        if op == "count":
            partial_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(tmp))
            final_aggs.append(F.sum(tmp).alias(out_col))
        elif op == "sum":
            partial_aggs.append(F.sum(col).alias(tmp))
            final_aggs.append(F.sum(tmp).alias(out_col))
        elif op == "min":
            partial_aggs.append(F.min(col).alias(tmp))
            final_aggs.append(F.min(tmp).alias(out_col))
        elif op == "max":
            partial_aggs.append(F.max(col).alias(tmp))
            final_aggs.append(F.max(tmp).alias(out_col))
        else:
            raise ValueError(f"unsupported agg {spec!r}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*partial_aggs)
        .groupBy(key)
        .agg(*final_aggs)
    )
