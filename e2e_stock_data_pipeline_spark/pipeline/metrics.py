"""Run-metrics sink (K5 — reference: ingest_fmp_prices.py:580-604,
fmp_dump_raw.py:731-752: a JSON metrics object per run written to
logs/ingest/date=YYYY-MM-DD/run-<ts>.json).

Same layout here, plus fold_results() to aggregate per-task outcomes
the way the reference folds its per-symbol results driver-side (A5).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable
from datetime import datetime, timezone


def fold_results(results: Iterable[dict]) -> dict:
    """Fold per-task result dicts into run totals (A5 metric folds)."""
    rows = errors = ok = 0
    for r in results:
        rows += int(r.get("rows_fetched", 0))
        if r.get("error"):
            errors += 1
        else:
            ok += 1
    return {"tasks_ok": ok, "tasks_failed": errors, "rows_fetched": rows}


def write_run_metrics(
    metrics: dict, log_root: str, now: datetime | None = None
) -> str:
    """Write one JSON metrics object under date=YYYY-MM-DD/run-<ts>.json."""
    now = now or datetime.now(timezone.utc)
    d = now.strftime("%Y-%m-%d")
    ts = now.strftime("%Y%m%dT%H%M%S%fZ")
    dest_dir = os.path.join(log_root, f"date={d}")
    os.makedirs(dest_dir, exist_ok=True)
    path = os.path.join(dest_dir, f"run-{ts}.json")
    payload = dict(metrics, run_at=now.isoformat())
    with open(path, "w") as f:
        json.dump(payload, f, sort_keys=True)
    return path


def read_run_metrics(spark, log_root: str):
    """Metrics log as a DataFrame (hive-partitioned by date)."""
    return spark.read.option("basePath", log_root).json(f"{log_root}/date=*/")
