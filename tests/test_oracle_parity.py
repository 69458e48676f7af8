"""Golden parity suite: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate: row count, column names/types
(loosely), and an order-insensitive exact value comparison — floats
must match bit-for-bit, which the queries guarantee by construction
(exact decimal aggregation / identical double expression trees).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules
from e2e_stock_data_pipeline_spark.sources.tables import TABLE_NAMES

REGISTRY = load_all_query_modules()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def normalize(rows, colnames):
    """Sort columns by name, then rows; exact values (no float fuzz)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = float(v)
                if math.isnan(v):
                    v = "NaN"
            out.append((v is None, str(type(v).__name__) if False else "", repr(v)))
        return tuple(out)

    return sorted((key(r) for r in rows))


oracle_cases = sorted(n for n, s in REGISTRY.items() if s.oracle)
rows_only_cases = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", oracle_cases)
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = oracle_con.execute(spec.oracle)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: column names differ: spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    ns, no = normalize(spark_rows, spark_cols), normalize(oracle_rows, oracle_cols)
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"


@pytest.mark.parametrize("name", rows_only_cases)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir)
    assert sdf.count() >= 0
