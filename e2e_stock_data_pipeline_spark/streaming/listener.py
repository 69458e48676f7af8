"""Streaming observability: a StreamingQueryListener that folds each
micro-batch's progress into the engine's run-metrics sink — the
streaming-side analog of the reference's per-run JSON metrics
(ingest_fmp_prices.py:580-604) plus what Databricks surfaced in the
jobs UI.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressMetricsListener(StreamingQueryListener):
    """Collects per-batch progress rows; flush() writes one metrics JSON
    via pipeline/metrics.write_run_metrics."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - not fired by availableNow
        pass

    def summary(self) -> dict:
        return {
            "queries_started": len(set(self.started)),
            "queries_terminated": len(set(self.terminated)),
            "batches": len(self.progress),
            "rows_processed": sum(p["num_input_rows"] for p in self.progress),
        }

    def flush(self, log_root: str) -> str:
        from ..pipeline.metrics import write_run_metrics

        return write_run_metrics(self.summary(), log_root)
