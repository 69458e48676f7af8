"""Deterministic Bloom filter as a Catalyst composition [EXT].

The memory-bound scale path for set-membership pre-filters (eval-set
decontamination being the canonical training-data use): instead of
broadcast-joining every corpus shingle against the full eval shingle
set, build an m-bit filter ONCE over the eval side — a dimension-sized
(word_idx, word) frame of 32-bit words — broadcast it, and test each
corpus shingle with k constant-time bit probes. Probe cost is
independent of |eval|; the filter for m=65536 bits is 2048 rows.

Everything is deterministic and integer-exact: positions come from the
engine's portable sha256-prefix hash (functions/hashing.py) with the
seed spliced into the hashed string, words pack bits 0..31 via
shiftleft/bit_or, and membership is a bitwise AND — so a SQL oracle
replays the filter build AND the probe verdicts bit-for-bit (q132).
False positives exist by construction (rate ~(1 - e^(-k*n/m))^k);
false negatives cannot (property-tested against the exact join).

Bits are packed 32 per 64-bit word (not 64) so `1 << bit` stays far
from the sign bit in BOTH engines — no signed-overflow edge to reason
about in Spark bigint or DuckDB BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

BITS_PER_WORD = 32


def _positions(col: str | Column, m_bits: int, k: int) -> Column:
    """Array of the k bloom positions for a value (portable hash, seeds 0..k-1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[F.pmod(portable_hash64(c, seed=s), F.lit(m_bits)) for s in range(k)])


def bloom_build(
    items: DataFrame, col: str, m_bits: int = 65536, k: int = 3
) -> DataFrame:
    """Build the filter: a (word_idx, word) frame with one row per
    NON-EMPTY 32-bit word. Dimension-sized (<= m_bits/32 rows) —
    broadcast it at the probe site. Duplicate items are harmless
    (bit_or is idempotent)."""
    return (
        items.select(F.explode(_positions(col, m_bits, k)).alias("_pos"))
        .select(
            F.expr(f"_pos div {BITS_PER_WORD}").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {BITS_PER_WORD} AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` value is (maybe-)present: all k bit
    probes set. Missing word rows mean unset bits, so the inner join to
    the broadcast filter silently (and correctly) fails those probes.
    Input rows must be distinct on the columns the caller cares about —
    the probe returns the original columns of each surviving row."""
    cols = df.columns
    probed = df.select(
        *cols, F.posexplode(_positions(col, m_bits, k)).alias("_s", "_pos")
    ).select(
        *cols,
        "_s",
        F.expr(f"_pos div {BITS_PER_WORD}").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {BITS_PER_WORD} AS INT))"
        ).alias("_bit"),
    )
    hits = (
        probed.join(F.broadcast(bloom), "word_idx")
        .filter(F.col("word").bitwiseAND(F.col("_bit")) != 0)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    return hits.filter(F.col("_h") == k).select(*cols)
