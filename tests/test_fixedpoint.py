"""fixedpoint.units: the rint fast path must be bit-equal to the
BigDecimal reference extraction on every money/rate column the engine
sums (the <=2-decimal-place contract). Guard pinned at sf0.1 (600k
lineitem rows); r11 also spot-verified zero disagreements on all 60M
sf10 rows x 4 columns before the swap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.functions.fixedpoint import units
from e2e_stock_data_pipeline_spark.sources import tables

SF = "/root/testdata/sf0.1"

CASES = [
    ("lineitem", "l_extendedprice", "decimal(12,2)"),
    ("lineitem", "l_discount", "decimal(3,2)"),
    ("lineitem", "l_tax", "decimal(3,2)"),
    ("lineitem", "l_quantity", "decimal(12,2)"),
    ("orders", "o_totalprice", "decimal(12,2)"),
    ("events", "value", "decimal(12,2)"),
    ("customer", "c_acctbal", "decimal(12,2)"),
]


@pytest.mark.parametrize("table,col,dectype", CASES)
def test_units_matches_decimal_reference(spark, table, col, dectype):
    df = tables.load(spark, SF, table)
    ref = (F.col(col).cast(dectype) * 100).cast("bigint")
    n_bad = df.select(
        (~units(col).eqNullSafe(ref)).cast("int").alias("bad")
    ).agg(F.sum("bad")).collect()[0][0]
    assert n_bad == 0, f"{table}.{col}: {n_bad} rows disagree"


def test_units_rejects_nothing_silently(spark):
    """Negative values and exact .5 cent boundaries (in contract: 2dp
    inputs never sit between units) still extract exactly."""
    df = spark.createDataFrame(
        [(-1000.01,), (0.0,), (-0.99,), (123456789.25,), (52000.10,)],
        "v double",
    )
    got = [r[0] for r in df.select(units("v")).collect()]
    assert got == [-100001, 0, -99, 12345678925, 5200010]
