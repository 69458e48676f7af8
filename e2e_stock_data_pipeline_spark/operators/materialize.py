"""Spill-safe eager materialization for iterative operators.

Iterative operators (connected components, PageRank, BFS, k-core,
greedy coverage) must materialize their loop-carried frames once per
round — re-deriving them would re-execute the whole upstream pipeline
per iteration. The obvious tool, ``localCheckpoint(eager=True)``,
defaults to DESERIALIZED memory-and-disk storage: each task unrolls its
partition as full JVM row objects in a growing array before the block
manager can account for it. At sf10 the q56 near-dup graph symmetrizes
to 672M edge rows in 32 inherited partitions — 21M row objects per
task, 32 concurrent tasks — and the unroll OOMs an 8 GiB heap before a
single block is evicted (observed: GCLocker retry failures on ~16 MB
array growth steps, then Java heap space in the localCheckpoint job).

:func:`materialize` fixes both failure modes:

* DISK_ONLY storage — tasks stream-serialize their partition straight
  to local block files, so unroll memory is bounded by the serializer
  buffer regardless of partition size. (MEMORY_AND_DISK serialized was
  tried first and still OOMed: 32 concurrent unrolls of ~400 MB blocks
  compete with the join's execution memory in the unified pool, and
  the reservation accounting trails the serializer's buffer growth.)
  On a warm box the OS page cache serves the re-reads at memory speed,
  and the per-round deserialization cost is identical to what a
  serialized in-memory level would pay — this is the local-mode analog
  of the cluster-scale checkpoint-to-durable-storage the operator docs
  prescribe;
* sized re-widening — after materializing, the (now cheap) row count
  is checked against a per-task bound and the frame is reshuffled to
  ``ceil(n / 5M)`` partitions when the inherited width would leave
  multi-GB partitions for every downstream round (the same
  rows-per-task rule as operators/asof.asof_shuffle_width).

Pass ``cols`` when downstream rounds join the frame on specific keys:
the widening repartition then hash-partitions on those columns so the
co-location the caller set up survives.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Same bound as operators/asof.py: a cached/sorted partition beyond this
# row count risks unspillable pressure; below it, fewer tasks win.
MAX_ROWS_PER_TASK = 5_000_000


def materialize(df: DataFrame, *cols: str, widen: bool = True) -> DataFrame:
    """Eagerly materialize ``df`` with serialized spill-safe storage,
    re-widening to ``ceil(rows / MAX_ROWS_PER_TASK)`` partitions (hash
    partitioned on ``cols`` when given) if the inherited partitioning
    is coarser than the bound. Returns the materialized frame; the
    interim narrow frame is unpersisted when a re-widen happens.

    ``widen=False`` skips the re-widen: correct when every downstream
    consumer re-exchanges the frame anyway (scan-side map partitions
    stream, they hold no sort/agg state, so the 5M-row bound doesn't
    apply). For CC's 336M-row sf10 edge set the re-widen was a SECOND
    full checkpoint write plus a full shuffle — ~60 s of pure overhead
    (r12 measurement)."""
    out = df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    if not widen:
        return out
    n = out.count()  # scan of the just-cached blocks — cheap
    parts = out.rdd.getNumPartitions()
    need = max(1, -(-n // MAX_ROWS_PER_TASK))
    if need > parts:
        wide = out.repartition(need, *cols) if cols else out.repartition(need)
        wide = wide.localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
        unpersist_materialized(out)
        return wide
    return out


def unpersist_materialized(df: DataFrame) -> bool:
    """Release the block-manager storage behind a frame returned by
    :func:`materialize`. ``Dataset.unpersist()`` is NOT enough: it only
    clears CacheManager entries, and a localCheckpoint's persistence
    lives on the internal RDD wrapped by the LogicalRDD plan node — so
    iterative operators that called ``.unpersist()`` per round were
    silently accumulating every round's blocks (found in r12 while
    wiring the session-lifecycle release). Reaches the RDD through the
    analyzed plan; returns False (and leaves cleanup to the session-
    level registry.release sweep) if the plan isn't a LogicalRDD."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:  # noqa: BLE001 — non-checkpoint plan or dead session
        return False
