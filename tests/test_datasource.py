"""Spark 4 Python DataSource tests: the endpoint registry as a real
`spark.read.format(...)` source — partition planning per symbol batch,
executor-side fetch through a resolvable transport, locked record
schema, retry behavior."""

from __future__ import annotations

import json

import pytest

from e2e_stock_data_pipeline_spark.sources import datasource as DS
from e2e_stock_data_pipeline_spark.sources.ingest import RECORD_SCHEMA


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    DS.register(spark)


def _load(spark, **options):
    r = spark.read.format("stock_endpoint")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


class TestEndpointDataSource:
    def test_per_symbol_rows_and_schema(self, spark):
        df = _load(
            spark,
            endpoint="income",
            symbols="aapl,MSFT,goog",
            as_of_date="2026-08-12",
        )
        assert df.schema == RECORD_SCHEMA
        rows = {r.symbol: r for r in df.collect()}
        assert set(rows) == {"AAPL", "MSFT", "GOOG"}
        assert rows["AAPL"].endpoint == "income"
        assert rows["AAPL"].as_of_date == "2026-08-12"
        payload = json.loads(rows["AAPL"].payload)
        assert payload["period"] == "annual"  # endpoint params reached the call
        assert len(rows["AAPL"].hash) == 64

    def test_market_wide_single_partition(self, spark):
        reader = DS.EndpointReader(
            {"endpoint": "treasury_rates", "symbols": "IGNORED,ALSO"}
        )
        parts = reader.partitions()
        assert len(parts) == 1 and parts[0].symbols == [None]
        df = _load(spark, endpoint="treasury_rates", symbols="IGNORED")
        rows = df.collect()
        assert len(rows) == 1 and rows[0].symbol is None

    def test_partition_planning_batches(self, spark):
        syms = ",".join(f"S{i}" for i in range(50))
        reader = DS.EndpointReader(
            {"endpoint": "income", "symbols": syms, "batch_size": "8"}
        )
        parts = reader.partitions()
        assert [len(p.symbols) for p in parts] == [8] * 6 + [2]
        # distributed read sees every symbol exactly once
        df = _load(spark, endpoint="income", symbols=syms, batch_size="8")
        got = sorted(r.symbol for r in df.collect())
        assert got == sorted(f"S{i}" for i in range(50))

    def test_transport_resolution_by_dotted_path(self, spark):
        df = _load(
            spark,
            endpoint="income",
            symbols="AAPL",
            transport="e2e_stock_data_pipeline_spark.sources.datasource:echo_transport",
        )
        assert df.count() == 1

    def test_unknown_transport_spec_raises(self):
        with pytest.raises(ValueError, match="module:callable"):
            DS.resolve_transport("not-a-spec")

    def test_filter_then_count_is_lazy_source(self, spark):
        # a projection/filter over the source composes like any DataFrame
        df = _load(spark, endpoint="income", symbols="A,B,C,D")
        assert df.filter(df.symbol.isin("A", "B")).count() == 2


class TestEndpointStream:
    """availableNow with a simple stream reader drains one prefetched
    batch per start() — so these tests run the query repeatedly against
    one checkpoint, exactly the scheduled-nightly-run shape the cursor
    is designed for, and assert the cursor never refetches a day."""

    def _run(self, spark, dest, ckpt, end_date, symbols="AAPL,MSFT"):
        q = (
            spark.readStream.format("stock_endpoint")
            .option("endpoint", "income")
            .option("symbols", symbols)
            .option("from_date", "2026-08-01")
            .option("end_date", end_date)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def _drain(self, spark, dest, ckpt, end_date, symbols="AAPL,MSFT", max_runs=8):
        seen = -1
        for _ in range(max_runs):
            self._run(spark, dest, ckpt, end_date, symbols)
            n = spark.read.parquet(dest).count()
            if n == seen:
                break
            seen = n
        return seen

    def test_date_cursor_exactly_once_across_runs(self, spark, tmp_path):
        dest, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        n = self._drain(spark, dest, ckpt, "2026-08-03")
        out = spark.read.parquet(dest)
        # 3 days x 2 symbols x 1 payload each, no dupes across the runs
        assert n == 6
        got = {(r.as_of_date, r.symbol) for r in out.collect()}
        assert got == {
            (d, s)
            for d in ("2026-08-01", "2026-08-02", "2026-08-03")
            for s in ("AAPL", "MSFT")
        }

    def test_extended_end_date_resumes_from_cursor(self, spark, tmp_path):
        dest, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        assert self._drain(spark, dest, ckpt, "2026-08-02", symbols="AAPL") == 2
        # extend the horizon: cursor resumes at 08-03, fetches 3 more days
        assert self._drain(spark, dest, ckpt, "2026-08-05", symbols="AAPL") == 5
        out = spark.read.parquet(dest)
        assert out.select("as_of_date").distinct().count() == 5

    def test_offsets_are_replayable(self):
        from e2e_stock_data_pipeline_spark.sources.datasource import (
            EndpointStreamReader,
        )

        r = EndpointStreamReader(
            {"endpoint": "income", "symbols": "AAPL",
             "from_date": "2026-08-01", "end_date": "2026-08-04",
             "max_days_per_batch": "2"}
        )
        start = r.initialOffset()
        rows1, end1 = r.read(start)
        replay = list(r.readBetweenOffsets(start, end1))
        assert list(rows1) == replay  # deterministic transport -> exact replay
        assert end1 == {"next_date": "2026-08-03"}
        rows2, end2 = r.read(end1)
        assert end2 == {"next_date": "2026-08-05"}
        assert len(list(rows2)) == 2
        # exhausted cursor: empty batch, offset unchanged
        rows3, end3 = r.read(end2)
        assert list(rows3) == [] and end3 == end2
