"""Focused semantics test for the r17 q109 rewrite: group median via a
bounded-domain value histogram (cumulative-coverage middle pick) must
reproduce the sorted-middle definition in all three parity cases —
odd count, even count with a tied middle, even count with distinct
middle values — including when one histogram bucket covers BOTH middle
positions and when the two positions land in different buckets."""

from __future__ import annotations

import os

import pandas as pd

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _lineitem(tmp_path, groups: dict[str, list[float]]) -> str:
    rows = []
    k = 0
    for flag, qtys in groups.items():
        for q in qtys:
            k += 1
            rows.append(
                {
                    "l_orderkey": k,
                    "l_linenumber": 1,
                    "l_quantity": float(q),
                    "l_returnflag": flag,
                }
            )
    pd.DataFrame(rows).to_parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    return str(tmp_path)


def _naive_median(qtys: list[float]) -> float:
    s = sorted(qtys)
    n = len(s)
    mid = [s[(n + 1) // 2 - 1], s[(n + 2) // 2 - 1]]
    return sum(mid) / 2.0


def test_histogram_median_parity_cases(spark, tmp_path):
    groups = {
        "A": [3.0, 1.0, 2.0],  # odd: median is the single middle row
        "B": [5.0, 7.0, 5.0, 5.0],  # even, tied middle within one bucket
        "C": [10.0, 1.0, 3.0, 2.0],  # even, distinct middle values
        "D": [2.0, 3.0, 2.0, 3.0],  # even, middle positions split buckets
        "E": [42.0],  # singleton group
    }
    d = _lineitem(tmp_path, groups)
    out = {
        r["l_returnflag"]: r
        for r in REG["q109_exact_group_median"].spark(spark, d).collect()
    }
    assert set(out) == set(groups)
    for flag, qtys in groups.items():
        assert out[flag]["n_rows"] == len(qtys), flag
        assert out[flag]["median_qty"] == _naive_median(qtys), flag
