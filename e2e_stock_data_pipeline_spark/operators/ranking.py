"""Distributed global ranking.

`Window.orderBy(...)` with no partition key collapses the whole table
into ONE task (Spark even warns) — fine at 60k rows, fatal at 100 TB.
The scalable equivalent is the classic two-pass:

  1. range-partition + sort on the order key (distributed sort — the
     same machinery as orderBy);
  2. count rows per partition, prefix-sum the tiny per-partition counts
     driver-side;
  3. global rank = partition offset + intra-partition row_number
     (a window PARTITIONED by the sorted partition id — distributed).

global_ntile derives tiles from the rank arithmetically with exactly
SQL NTILE's distribution (first `total % n` tiles one row larger).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[Column | str], rank_col: str = "rank") -> DataFrame:
    """Dense global row_number over an arbitrary ordering, distributed."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parted = df.repartitionByRange(*cols).sortWithinPartitions(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # repartitionByRange SAMPLES its boundaries per job — pin the computed
    # partitioning so the count pass and the output pass see the SAME
    # partitions (otherwise offsets are garbage at scale).
    parted = parted.localCheckpoint(eager=True)
    counts = {r._pid: r.cnt for r in parted.groupBy("_pid").count().withColumnRenamed("count", "cnt").collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.coalesce(
        *[F.when(F.col("_pid") == pid, F.lit(off)) for pid, off in offsets.items()],
        F.lit(0),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        parted.withColumn(rank_col, (offset_col + F.row_number().over(w)).cast("bigint"))
        .drop("_pid")
    )


def global_ntile(
    df: DataFrame, order_cols: list[Column | str], n: int, tile_col: str = "tile"
) -> DataFrame:
    """NTILE(n) over a global ordering without a single-partition window.

    SQL NTILE semantics exactly: base = total div n rows per tile, the
    first total mod n tiles take one extra row (front-loaded).
    """
    ranked = global_rank(df, order_cols, "_grank")
    total = ranked.count()
    base, rem = divmod(total, n)
    boundary = (base + 1) * rem  # last rank inside the bigger tiles
    r = F.col("_grank")
    if base == 0:  # more tiles than rows: tile == rank
        tile = r.cast("int")
    else:
        tile = (
            F.when(r <= boundary, F.ceil(r / (base + 1)))
            .otherwise(rem + F.ceil((r - boundary) / base))
            .cast("int")
        )
    return ranked.withColumn(tile_col, tile).drop("_grank")


def _sort_child(c: Column) -> Column:
    """Return the value expression under a sort-ordered Column.

    ``F.col("v").desc()`` wraps the column in a SortOrder expression —
    orderable, but not evaluable: feeding it to xxhash64 fails analysis.
    For hashing we only need the VALUE (salt spread is direction-
    independent), so unwrap SortOrder children and pass plain columns
    through untouched.
    """
    try:
        node = c._jc.node()  # classic Spark 4: Column wraps a ColumnNode
        if node.getClass().getSimpleName() == "SortOrder":
            from pyspark.sql import SparkSession

            jvm = SparkSession.getActiveSession()._jvm
            return Column(jvm.org.apache.spark.sql.Column(node.child()))
    except Exception:
        pass  # non-classic backends / API drift: hash the column as given
    return c


def salted_group_topk(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    n_salts: int = 32,
    salt_col: Column | None = None,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-``k`` rows per group under ``order_cols`` without a data-sized
    per-group sort — the small-k sibling of :func:`bucketed_group_keep`.

    Classic two-phase partial top-k: rows first rank within
    (keys..., salt) and only the per-salt top-k survive (every window
    partition is ~1/n_salts of a group, so an arbitrarily skewed group
    key never sorts in one task); the true per-group top-k is a subset
    of those <= k*n_salts survivors, so a second window over the
    reduced set yields exactly the naive per-group row_number result.
    ``order_cols`` must be a total order (include a unique tiebreaker)
    or the result is nondeterministic. ``salt_col`` defaults to a
    deterministic xxhash64 spread over ``n_salts``; callers may pass
    their own (e.g. pmod of a row id) — determinism of the RESULT never
    depends on the salt, only skew-safety does. Sort-ordered Columns
    (``F.col("v").desc()``) are fine in ``order_cols``: the default salt
    strips the SortOrder wrapper before hashing (xxhash64 over a raw
    SortOrder fails analysis).
    """
    if salt_col is None:
        salt_col = F.pmod(
            F.xxhash64(*[F.col(c) for c in keys], *[_sort_child(c) for c in order_cols]),
            F.lit(n_salts),
        )
    pre = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_salt", salt_col)
        .withColumn("_prnk", F.row_number().over(pre))
        .filter(F.col("_prnk") <= k)
        .drop("_prnk")
    )
    final = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final))
        .filter(F.col(rank_col) <= k)
        .drop("_salt")
    )


def bucketed_group_keep(
    df: DataFrame,
    keys: list[str],
    targets: DataFrame,
    id_col: str = "doc_id",
    seed: int = 11,
    target_col: str = "n_target",
    n_bucket_shift: int = 50,
) -> DataFrame:
    """Keep the per-group top-``target_col`` rows ordered by
    (portable_hash64(id_col, seed), id_col) WITHOUT a data-sized
    per-group sort — the skew-safe keep stage shared by q127's
    temperature mixture and q129's per-source cap.

    ``targets`` is a dimension-sized (keys..., target_col) frame;
    groups ABSENT from it are dropped entirely (inner join — a cap of
    0 and a missing row behave the same). The group key may be
    arbitrarily skewed (that is the point): rows are
    bucketed by an ORDER-PRESERVING hash range (arithmetic shiftright
    of the positive 60-bit rank hash -> 1024 contiguous monotone
    buckets at the default shift of 50), a
    dimension-sized (group x <=1024 buckets) histogram is prefix-summed
    per group, buckets wholly above the target are pruned by a
    broadcast semi-join BEFORE any sort, and per-group rank decomposes
    as earlier-bucket count + within-bucket row_number — the only
    data-sized window partitions on (keys..., bucket), max partition
    ~1/1024 of a group. Bit-equal to the naive per-group row_number
    keep (property-tested via queries_ext6.naive_window_keep).

    Returns (id_col, keys...) of kept rows.
    """
    from ..functions.hashing import portable_hash64

    h = portable_hash64(id_col, seed=seed)
    # The coalesce on _b is a nullability fence (the df67656/r17
    # with_quantized_norm pattern): _b is a JOIN key below, and a
    # NULLABLE computed key gets an inferred isnotnull(_b) pushed to the
    # scan with the whole sha2 rank hash inlined — the hash evaluated
    # once more per row just for the null check (visible in the r17
    # q127/q129/q134 plans). The -1 sentinel is unreachable for non-null
    # id_col (portable_hash64 is a sha2 fold of a concat — non-null in,
    # non-null out) and must never be read as a real bucket.
    bucketed = df.select(
        id_col,
        *keys,
        h.alias("_h"),
        F.coalesce(F.shiftright(h, n_bucket_shift), F.lit(-1)).alias("_b"),
    )
    hist = bucketed.groupBy(*keys, "_b").agg(F.count(F.lit(1)).alias("_bc"))
    w_cum = (
        Window.partitionBy(*keys).orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    classified = (
        hist.withColumn("_before", F.coalesce(F.sum("_bc").over(w_cum), F.lit(0)))
        .join(targets, keys)
        .filter(F.col("_before") < F.col(target_col))
        .select(*keys, "_b", "_before", target_col)
    )
    w_b = Window.partitionBy(*keys, "_b").orderBy("_h", id_col)
    return (
        bucketed.join(F.broadcast(classified), [*keys, "_b"])
        .withColumn("_rnk", F.row_number().over(w_b))
        .filter(F.col("_before") + F.col("_rnk") <= F.col(target_col))
        .select(id_col, *keys)
    )


def bucketed_budget_keep(
    df: DataFrame,
    keys: list[str],
    budgets: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 11,
    budget_col: str = "budget",
    n_bucket_shift: int = 50,
) -> DataFrame:
    """Keep each group's hash-ordered PREFIX whose cumulative
    ``weight_col`` stays within ``budget_col`` — the weighted sibling of
    :func:`bucketed_group_keep` (count caps are the weight==1 case).

    The training-data use: token-budget sampling, where a language's
    keep decision is "take docs in deterministic hash order until the
    token budget is spent". Same skew-safe decomposition: bucket by the
    order-preserving hash range, histogram per (group, bucket) sums
    WEIGHTS instead of counting rows, prefix-sum the dimension-sized
    histogram, prune buckets whose cumulative start already exceeds the
    budget broadcast-side, and run ONE running-sum window over the
    surviving buckets partitioned on (keys..., bucket) — a row is kept
    iff earlier-bucket weight + its within-bucket running sum
    (inclusive) fits the budget. Rows of whole-kept buckets pass the
    uniform filter trivially; only ~1/1024 of a group ever sorts in one
    partition. Groups absent from ``budgets`` are dropped (inner join).

    Returns (id_col, keys..., weight_col) of kept rows.
    """
    from ..functions.hashing import portable_hash64

    h = portable_hash64(id_col, seed=seed)
    # same _b nullability fence as bucketed_group_keep (q134's plan
    # showed the inferred isnotnull inlining the sha2 hash at the scan);
    # -1 unreachable for non-null id_col, never a real bucket
    bucketed = df.select(
        id_col, *keys, weight_col, h.alias("_h"),
        F.coalesce(F.shiftright(h, n_bucket_shift), F.lit(-1)).alias("_b"),
    )
    hist = bucketed.groupBy(*keys, "_b").agg(
        F.sum(weight_col).cast("bigint").alias("_bw")
    )
    w_cum = (
        Window.partitionBy(*keys).orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    classified = (
        hist.withColumn(
            "_before", F.coalesce(F.sum("_bw").over(w_cum), F.lit(0)).cast("bigint")
        )
        .join(budgets, keys)
        .filter(F.col("_before") < F.col(budget_col))
        .select(*keys, "_b", "_before", budget_col)
    )
    w_run = (
        Window.partitionBy(*keys, "_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(classified), [*keys, "_b"])
        .withColumn("_run", F.sum(weight_col).over(w_run).cast("bigint"))
        .filter(F.col("_before") + F.col("_run") <= F.col(budget_col))
        .select(id_col, *keys, weight_col)
    )
