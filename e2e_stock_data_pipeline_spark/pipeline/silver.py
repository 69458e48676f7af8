"""Silver layer: quality gate + keep-latest upsert (reference:
docs/databricks_setup.md:146-198 — `MERGE INTO silver USING (dedup
subquery) ... WHEN MATCHED AND row_num=1 THEN UPDATE SET *`).

delta-spark isn't importable in this environment, so `merge_upsert`
implements the same semantics engine-side (union + ROW_NUMBER keep-
latest + full rewrite); when Delta IS available the same call routes
through DeltaTable.merge — gated on import, not on a fork of the logic.

Scale note: the rewrite path shuffles on the merge key once; with Delta
the shuffle shrinks to matched files only (partition pruning on the
key), which is why the table keeps `partition_cols`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import keep_last

try:  # pragma: no cover - delta not present in this environment
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    DeltaTable = None
    HAVE_DELTA = False


def apply_quality_gate(
    df: DataFrame, predicates: list, quarantine_path: str | None = None
) -> DataFrame:
    """Split rows by conjunctive quality predicates (P4/P5); violations go
    to a quarantine sink instead of being silently dropped."""
    cond = None
    for p in predicates:
        cond = p if cond is None else (cond & p)
    if cond is None:
        return df
    if quarantine_path is not None:
        df.filter(~cond).write.mode("append").parquet(quarantine_path)
    return df.filter(cond)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
) -> None:
    """Upsert: newest row per key wins across existing target + updates.

    The semantics contract (pinned by the MERGE matrix test in
    tests/test_pipeline.py, which any future native-Delta route must
    also pass):

    * source is deduped to its newest row per key first (the
      reference's ``row_num = 1`` guard, docs/databricks_setup.md:
      183-197);
    * a matched target row is replaced iff the source row's
      ``order_col`` is **newer or equal** — i.e. the update wins ties
      (the Delta route's ``s.order >= t.order`` condition; the rewrite
      path encodes the same policy with a source-precedence tie-break
      column). This is deliberately stricter than the reference's
      unconditional ``WHEN MATCHED THEN UPDATE SET *``: a late-arriving
      OLDER source row must not clobber newer silver data;
    * unmatched source rows insert; target rows never disappear;
    * re-running the same merge is a no-op (idempotent);
    * multiple SOURCE rows tied on ``order_col`` resolve by a content
      hash over all columns (deterministic on every engine/partitioning
      — ADVICE r7; identical duplicate rows are interchangeable, so the
      arbitrary-but-stable hash order is sufficient).
    """
    helper_clash = {"_src_pri", "_tie", "_rn"} & set(updates.columns)
    if helper_clash:
        raise ValueError(
            f"merge_upsert input carries reserved helper column(s) "
            f"{sorted(helper_clash)}; rename them before merging (they would "
            "silently corrupt the tie-break policy)"
        )

    def with_tie(df: DataFrame) -> DataFrame:
        # content hash over the DATA columns only, fixed column order
        return df.withColumn("_tie", F.xxhash64(*[F.col(c) for c in updates.columns]))

    if HAVE_DELTA and DeltaTable.isDeltaTable(spark, target_path):  # pragma: no cover
        deduped = keep_last(with_tie(updates), keys, [order_col, "_tie"]).drop("_tie")
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(deduped.alias("s"), " AND ".join(f"t.{k} = s.{k}" for k in keys))
            .whenMatchedUpdateAll(condition=f"s.{order_col} >= t.{order_col}")
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    import os

    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
    else:  # first run: nothing to merge with (avoids a noisy read probe)
        existing = None
    if existing is None:
        result = keep_last(with_tie(updates), keys, [order_col, "_tie"]).drop("_tie")
    else:
        # _src_pri makes the update win order-col ties deterministically,
        # matching the Delta route's `s.order >= t.order`; _tie resolves
        # same-source order-col ties by content hash.
        merged = with_tie(existing).withColumn("_src_pri", F.lit(0)).unionByName(
            with_tie(updates).withColumn("_src_pri", F.lit(1))
        )
        result = keep_last(merged, keys, [order_col, "_src_pri", "_tie"]).drop(
            "_src_pri", "_tie"
        )
    # Can't overwrite the path being read: stage to a sibling temp dir,
    # then swap (distributed write, no driver materialization).
    import shutil

    tmp = target_path.rstrip("/") + "._merge_tmp"
    result.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.replace(tmp, target_path)
