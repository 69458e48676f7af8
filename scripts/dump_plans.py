"""Dump the formatted physical plan of named queries to per-query files.

Used for the optimization-round evidence trail (plans/rN/<query>_before.txt
/ _after.txt): run once from a worktree of the pre-round commit and once
from HEAD so the judge can diff plan shapes without running Spark.

    python scripts/dump_plans.py <out_dir> <suffix> <query> [<query> ...]

e.g.  python scripts/dump_plans.py plans/r17 after q184_set_similarity_join
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)

    registry = load_all_query_modules()
    spark = get_spark(app_name="dump-plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"MISSING {name}", file=sys.stderr)
            rc = 1
            continue
        df = spec.spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
