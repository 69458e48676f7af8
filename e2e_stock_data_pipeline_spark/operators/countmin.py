"""Deterministic Count-Min sketch as a Catalyst composition [EXT].

Frequency estimation in sublinear memory — the counter-valued sibling
of the Bloom filter (operators/bloom.py) in the engine's sketch tier
(HLL q37, Misra-Gries q93, Bloom q132): k hash rows x m counters,
update adds each item's weight to one counter per row, estimate is the
MIN over the k counters the item hashes to. Collisions only ever ADD,
so the estimate is an OVERCOUNT or exact — the classic one-sided error
bound (est <= exact + 2N/m with prob >= 1 - 2^-k), property-tested as
`est >= exact` with a measured error ceiling.

Determinism: positions come from the engine's portable sha256-prefix
hash with the row index spliced into the hashed bytes, counters are
plain integer sums — a SQL oracle replays sketch build AND estimates
bit-for-bit (q133). The sketch is a dimension-sized (row, pos, counter)
frame (<= k*m rows), broadcast at the estimate site; the build is one
map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _pos(col: str | Column, s: int, m: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(portable_hash64(c, seed=s), F.lit(m))


def countmin_build(
    items: DataFrame, col: str, m: int = 4096, k: int = 3
) -> DataFrame:
    """Build the sketch over item OCCURRENCES (one count per input row):
    a (s, pos, counter) frame, <= k*m rows."""
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), _pos(col, s, m).alias("pos"))
                    for s in range(k)
                ]
            )
        ).alias("_sp")
    )
    return (
        rows.select(F.col("_sp.s").alias("s"), F.col("_sp.pos").alias("pos"))
        .groupBy("s", "pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("counter"))
    )


def countmin_estimate(
    df: DataFrame, col: str, sketch: DataFrame, m: int = 4096, k: int = 3
) -> DataFrame:
    """Append ``cm_est``: the Count-Min frequency estimate for ``col``
    of each (distinct) input row. A missing sketch cell means no item
    hashed there — coalesced to 0 via left join so absent values
    estimate 0, preserving est >= exact."""
    cols = df.columns
    probes = df.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), _pos(col, s, m).alias("pos"))
                    for s in range(k)
                ]
            )
        ).alias("_sp"),
    ).select(*cols, F.col("_sp.s").alias("s"), F.col("_sp.pos").alias("pos"))
    return (
        probes.join(F.broadcast(sketch), ["s", "pos"], "left")
        .groupBy(*cols)
        .agg(F.min(F.coalesce("counter", F.lit(0).cast("bigint"))).alias("cm_est"))
    )
