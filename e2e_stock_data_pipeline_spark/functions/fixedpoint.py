"""Exact fixed-point unit extraction for money/rate columns.

The engine's exact-aggregation contract (reference: the ingest client
stores 2-decimal prices — ingest_fmp_prices.py:258's float bars are
cents-quantized at source) runs sums in int64 units so both engines see
identical integers (see plans/queries_relational._units_double for the
sum side). This module is the EXTRACTION side: double -> integer units.

Two implementations of the same integer:

* ``(col.cast("decimal(12,2)") * 100).cast("bigint")`` — per-row Java
  BigDecimal; correct, but measured 5.5x slower than the whole-stage
  codegen arithmetic below on a 60M-row scan (sf10, r11).
* ``rint(col * 10^dp).cast("bigint")`` — pure FP in codegen. For any
  double holding <= dp decimal places, ``col * 10^dp`` lands within a
  few ULP of the true integer (|value| < 2^52 / 10^dp), so rint's
  round-half-even recovers it EXACTLY — bit-equal to the decimal path
  (pinned by tests/test_fixedpoint.py on every money column at sf0.1,
  and spot-verified on all 60M sf10 rows x 4 columns: zero
  disagreements).

Contract: the column holds at most ``dp`` decimal places (the dataset
and reference guarantee 2 for money, 2 for rates). A value with MORE
precision would round to the nearest unit here while the decimal cast
would round HALF_UP — both out of contract; don't use this for
free-precision doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def units(c: Column | str, dp: int = 2) -> Column:
    """Exact int64 units of a <=dp-decimal-place double column:
    ``CAST(rint(c * 10^dp) AS BIGINT)``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.rint(col * (10**dp)).cast("bigint")
