"""Incremental rollup maintenance — a continuous aggregate over a
stream (the hypertable-rollup pattern): each micro-batch's partial
aggregates are MERGED-ADDED into a persistent rollup table, so the
rollup equals the full-history aggregate at every point without ever
rescanning history.

Only decomposable aggregates participate (count/sum/min/max — the same
algebra Spark's own partial aggregation uses); avg derives as sum/count
at read time. Exactly-once per epoch comes from foreachBatch
checkpointing + the idempotent staged rewrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _merge_add(
    spark: SparkSession, target: str, partial: DataFrame, keys: list[str]
) -> None:
    agg_cols = [c for c in partial.columns if c not in keys]
    if os.path.exists(target):
        existing = spark.read.parquet(target)
        merged = (
            existing.unionByName(partial)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in agg_cols])
        )
    else:
        merged = partial
    tmp = target.rstrip("/") + "._rollup_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target):
        shutil.rmtree(target)
    os.replace(tmp, target)


def hourly_rollup_partial(batch: DataFrame) -> DataFrame:
    """Decomposable partials for the hourly event rollup."""
    return (
        batch.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("value_sum"),
        )
    )


def _last_epoch_path(target: str) -> str:
    return target.rstrip("/") + "._last_epoch"


def _read_last_epoch(target: str) -> int:
    p = _last_epoch_path(target)
    if os.path.exists(p):
        with open(p) as f:
            return int(f.read().strip())
    return -1


def _write_last_epoch(target: str, epoch_id: int) -> None:
    with open(_last_epoch_path(target), "w") as f:
        f.write(str(epoch_id))


def apply_epoch(batch: DataFrame, target: str, epoch_id: int) -> bool:
    """Apply one micro-batch's partials to the rollup, once per epoch.

    merge-ADD is NOT naturally idempotent (unlike keep-latest merges), so
    the epoch guard makes replays after partial failures safe: an epoch
    already applied to the target is skipped. (Delta solves this with
    txnAppId/txnVersion; this is the parquet-sink equivalent.) Returns
    True when applied, False when skipped as a replay.
    """
    if epoch_id <= _read_last_epoch(target):
        return False
    _merge_add(
        batch.sparkSession,
        target,
        hourly_rollup_partial(batch),
        ["bucket_start", "event_type"],
    )
    _write_last_epoch(target, epoch_id)
    return True


def stream_hourly_rollup(stream: DataFrame, target: str, checkpoint: str):
    """availableNow stream maintaining the hourly rollup incrementally."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_epoch(batch, target, epoch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
