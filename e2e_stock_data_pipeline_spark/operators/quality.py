"""Data-driven expectations runner (reference: validation/
expectations_prices.json:1-43 — a Great Expectations suite the repo
declares but never executes; docs/databricks_setup.md:273-274 DLT
@expect_or_drop). Here the rules are DATA (dicts in the GE shape) and
the runner compiles them into one Catalyst predicate, splitting input
into (valid, quarantine) — expectations become an executed operator
instead of doc-ware.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExpectationResult:
    rule: str
    column: str
    violations: int


_SUPPORTED = {
    "expect_column_to_exist",
    "expect_column_values_to_not_be_null",
    "expect_column_values_to_be_between",
}


def _rule_predicate(df: DataFrame, rule: dict) -> Column | None:
    kind = rule["expectation_type"]
    col = rule["kwargs"]["column"]
    if kind == "expect_column_to_exist":
        if col not in df.columns:
            raise ValueError(f"expectation failed structurally: column {col!r} missing")
        return None  # structural, no row predicate
    if kind == "expect_column_values_to_not_be_null":
        return F.col(col).isNotNull()
    if kind == "expect_column_values_to_be_between":
        lo = rule["kwargs"].get("min_value")
        hi = rule["kwargs"].get("max_value")
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col(col) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
        # GE semantics: null passes a between check; not-null is its own rule
        return F.col(col).isNull() | pred
    raise ValueError(f"unsupported expectation_type {kind!r} (supported: {_SUPPORTED})")


def compile_suite(df: DataFrame, suite: dict) -> Column:
    """AND of all row-level predicates in a GE-shaped suite."""
    cond = F.lit(True)
    for rule in suite.get("expectations", []):
        p = _rule_predicate(df, rule)
        if p is not None:
            cond = cond & p
    return cond


def run_suite(
    df: DataFrame, suite: dict, quarantine_path: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantine). One pass per side; violations are
    kept, not dropped (the reference's @expect_or_drop silently discards).
    """
    cond = compile_suite(df, suite)
    valid = df.filter(cond)
    bad = df.filter(~cond | cond.isNull())
    if quarantine_path is not None:
        bad.write.mode("append").parquet(quarantine_path)
    return valid, bad


def audit_suite(df: DataFrame, suite: dict) -> list[ExpectationResult]:
    """Per-rule violation counts in ONE aggregation pass (A3-style
    conditional aggregates), not one job per rule."""
    aggs, names = [], []
    for rule in suite.get("expectations", []):
        p = _rule_predicate(df, rule)
        if p is None:
            continue
        label = f"{rule['expectation_type']}:{rule['kwargs']['column']}"
        names.append((label, rule["kwargs"]["column"]))
        aggs.append(F.sum((~p | p.isNull()).cast("int")).alias(label))
    if not aggs:
        return []
    row = df.agg(*aggs).collect()[0]
    return [
        ExpectationResult(label.split(":")[0], col, row[label] or 0)
        for label, col in names
    ]
