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
