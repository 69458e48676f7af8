"""Spark 4 Python DataSource for the endpoint registry — the ingestion
tier as a FIRST-CLASS Spark source (reference: stock_pipeline/scripts/
fmp_dump_raw.py:81-113 registry; ingest_fmp_prices.py:541-550 bounded
fan-out), so `spark.read.format("stock_endpoint")` plans symbol fetches
as input partitions and executes them ON EXECUTORS.

Two ingestion paths now exist, with an explicit trade:

* `sources/ingest.py` IngestClient — driver-side, ONE shared rate
  limiter: the strict-API-budget path (a global min-interval cannot be
  enforced across executors without external coordination).
* this DataSource — partition-parallel: each InputPartition carries a
  symbol batch; retry/backoff runs per task; `min_interval` spaces
  requests within a partition, so the worst-case global rate is
  (#partitions / min_interval). Use it when the API budget is per-key
  or generous (bulk backfills), the driver path when the budget is
  strict and global.

Transports resolve from a dotted "module:callable" option at read time
(executors import it — no closure pickling), with a deterministic
"echo" transport built in for tests, demos, and offline runs.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .ingest import ENDPOINTS, RECORD_SCHEMA, build_record, with_retry

DEFAULT_BATCH = 16


def deterministic_request_id(endpoint: str, symbol: str | None, as_of: str) -> str:
    """uuid5 of the fetch coordinates: task retries and offset replays
    produce byte-identical rows (a random uuid4 would silently break the
    replay-equality that exactly-once recovery relies on)."""
    import uuid

    return str(uuid.uuid5(uuid.NAMESPACE_URL, f"stock-endpoint:{endpoint}:{symbol}:{as_of}"))


def echo_transport(url: str, params: dict) -> tuple[list, int]:
    """Deterministic offline transport: one synthetic payload per call,
    derived from the url — lets the source run end-to-end with no
    network (tests, demos, dry runs)."""
    sym = url.rstrip("/").split("/")[-1] or "MARKET"
    return [{"date": "2026-01-02", "symbol": sym, "echo": url, **params}], 200


def demo_price_transport(url: str, params: dict) -> tuple[list, int]:
    """Deterministic offline PRICE transport: five plausible daily bars
    per symbol, values derived from a hash of (symbol, day) — lets the
    full normalize -> bronze -> silver -> gold pipeline run with no
    network (demo.py, offline smoke tests)."""
    import hashlib

    sym = url.rstrip("/").split("/")[-1] or "MARKET"
    bars = []
    for day in range(6, 11):  # 2026-01-06 .. 2026-01-10 (weekdays)
        h = int(hashlib.sha256(f"{sym}:{day}".encode()).hexdigest()[:8], 16)
        base = 50.0 + (h % 5000) / 100.0
        spread = (h >> 8) % 300 / 100.0
        bars.append(
            {
                "date": f"2026-01-{day:02d}",
                "open": round(base, 2),
                "high": round(base + spread, 2),
                "low": round(max(base - spread, 1.0), 2),
                "close": round(base + spread / 2, 2),
                "volume": 1000 + h % 100000,
            }
        )
    return bars, 200


def resolve_transport(spec: str) -> Callable[[str, dict], tuple[list, int]]:
    """'module.path:callable' -> transport; 'echo'/'demo_prices' -> the
    built-in offline stubs."""
    if spec == "echo":
        return echo_transport
    if spec == "demo_prices":
        return demo_price_transport
    mod, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"transport spec {spec!r} must be 'module:callable' or 'echo'")
    return getattr(importlib.import_module(mod), attr)


class SymbolBatch(InputPartition):
    def __init__(self, symbols: Sequence[str | None]):
        self.symbols = list(symbols)


class EndpointReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = ENDPOINTS[options.get("endpoint", "prices")]
        raw = options.get("symbols", "")
        self.symbols = [s.strip().upper() for s in raw.split(",") if s.strip()]
        self.as_of_date = options.get("as_of_date", "1970-01-01")
        self.fetched_at = options.get("fetched_at", self.as_of_date + "T00:00:00+00:00")
        self.transport_spec = options.get("transport", "echo")
        self.batch_size = int(options.get("batch_size", str(DEFAULT_BATCH)))
        self.attempts = int(options.get("attempts", "5"))
        self.min_interval = float(options.get("min_interval", "0"))

    def partitions(self) -> Sequence[InputPartition]:
        targets: list[str | None] = (
            list(self.symbols) if self.endpoint.per_symbol else [None]
        )
        return [
            SymbolBatch(targets[i : i + self.batch_size])
            for i in range(0, len(targets), self.batch_size)
        ] or [SymbolBatch([None])]

    def read(self, partition: SymbolBatch) -> Iterator[tuple]:
        import time

        transport = resolve_transport(self.transport_spec)
        fields = [f.name for f in RECORD_SCHEMA.fields]
        last = 0.0
        for sym in partition.symbols:
            if self.min_interval > 0:
                wait = last + self.min_interval - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
            url = self.endpoint.url_template.format(symbol=sym or "")

            def call():
                return transport(url, dict(self.endpoint.params))

            payloads, status = with_retry(call, attempts=self.attempts)
            for p in payloads:
                rec = build_record(
                    p, self.endpoint.name, sym, self.as_of_date, self.fetched_at,
                    status,
                    request_id=deterministic_request_id(
                        self.endpoint.name, sym, self.as_of_date
                    ),
                )
                yield tuple(rec[f] for f in fields)


class EndpointStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the offset is a DATE CURSOR over snapshot days —
    each microbatch fetches the next `max_days_per_batch` days for every
    symbol (the nightly-cron ingestion of the reference, re-expressed as
    a replayable streaming source). readBetweenOffsets re-fetches a
    committed range deterministically, which is what makes checkpoint
    recovery exactly-once END-TO-END for a deterministic transport (the
    offline/echo case and any snapshot-parameterized API endpoint)."""

    def __init__(self, options: dict):
        import datetime as dt

        self.endpoint = ENDPOINTS[options.get("endpoint", "prices")]
        raw = options.get("symbols", "")
        self.symbols = [s.strip().upper() for s in raw.split(",") if s.strip()]
        self.from_date = options.get("from_date", "1970-01-01")
        self.end_date = options.get("end_date") or str(dt.date.today())
        self.transport_spec = options.get("transport", "echo")
        self.attempts = int(options.get("attempts", "5"))
        self.max_days = int(options.get("max_days_per_batch", "1"))

    def initialOffset(self) -> dict:
        return {"next_date": self.from_date}

    def _fetch_range(self, start_date: str, end_exclusive: str) -> Iterator[tuple]:
        import datetime as dt

        transport = resolve_transport(self.transport_spec)
        fields = [f.name for f in RECORD_SCHEMA.fields]
        targets: list[str | None] = (
            list(self.symbols) if self.endpoint.per_symbol else [None]
        )
        day = dt.date.fromisoformat(start_date)
        stop = dt.date.fromisoformat(end_exclusive)
        while day < stop:
            as_of = str(day)
            for sym in targets:
                url = self.endpoint.url_template.format(symbol=sym or "")

                def call():
                    return transport(url, dict(self.endpoint.params, date=as_of))

                payloads, status = with_retry(call, attempts=self.attempts)
                for p in payloads:
                    rec = build_record(
                        p, self.endpoint.name, sym, as_of,
                        as_of + "T00:00:00+00:00", status,
                        request_id=deterministic_request_id(
                            self.endpoint.name, sym, as_of
                        ),
                    )
                    yield tuple(rec[f] for f in fields)
            day += dt.timedelta(days=1)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        import datetime as dt

        cur = dt.date.fromisoformat(start["next_date"])
        stop = min(
            cur + dt.timedelta(days=self.max_days),
            dt.date.fromisoformat(self.end_date) + dt.timedelta(days=1),
        )
        if stop <= cur:
            return iter([]), dict(start)
        end = {"next_date": str(stop)}
        # iter(list), not a bare generator: Spark's prefetch cache both
        # next()s and copy.copy()s the returned iterator, and only
        # list/tuple iterators support both
        return iter(list(self._fetch_range(str(cur), str(stop)))), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(list(self._fetch_range(start["next_date"], end["next_date"])))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the cursor fully describes progress


class EndpointDataSource(DataSource):
    """spark.read.format("stock_endpoint")
        .option("endpoint", "income").option("symbols", "AAPL,MSFT")
        .option("as_of_date", "2026-08-12").option("transport", "pkg.mod:fn")
        .load()

    Streaming: spark.readStream.format("stock_endpoint")
        .option("from_date", "2026-08-01").option("end_date", "2026-08-12")
        .option("symbols", "AAPL").load() — one microbatch per date-cursor
    advance (see EndpointStreamReader).
    """

    @classmethod
    def name(cls) -> str:
        return "stock_endpoint"

    def schema(self):
        return RECORD_SCHEMA

    def reader(self, schema) -> EndpointReader:
        return EndpointReader(dict(self.options))

    def simpleStreamReader(self, schema) -> EndpointStreamReader:
        return EndpointStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(EndpointDataSource)
