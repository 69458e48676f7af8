"""foreachBatch streaming upsert — the production Silver pattern the
reference describes but never implements (docs/databricks_setup.md:
170-198 MERGE, :277-291 DLT streaming dedup): each micro-batch is
deduplicated keep-latest and merged into the Silver table, so
re-delivered or late files UPDATE rather than duplicate.

foreachBatch gives the batch-side merge exactly-once-per-epoch
semantics (epoch id checkpointed); combined with the idempotent
keep-latest merge, replays are harmless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..pipeline.silver import merge_upsert


def stream_merge_upsert(
    stream: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
):
    """Start an availableNow stream that merges each micro-batch into the
    target with keep-latest semantics. Returns the StreamingQuery."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(batch.sparkSession, target_path, batch, keys, order_col)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
