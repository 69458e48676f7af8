"""Hash expression helpers — JVM-side, no Python UDFs.

The reference computes SHA-256 content hashes driver-side with
``hashlib.sha256(json.dumps(payload, sort_keys=True))`` for dedup keys
and lineage (reference: stock_pipeline/scripts/fmp_dump_raw.py:222-223,
ingest_fmp_prices.py:281-284). Here the canonical hash is a Catalyst
expression (``sha2`` over a delimited concat) so it runs vectorized in
whole-stage codegen, and — critically for the oracle gate — is
reproducible in ANSI SQL (DuckDB ``sha256``).

``portable_hash64`` is the engine's seedable 60-bit hash used by
MinHash / SimHash / LSH banding: the first 15 hex chars of
sha2(seed || x). 15 hex chars = 60 bits, always positive in an int64 in
both engines (DuckDB: ('0x' || substr(sha256(x),1,15))::BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unit separator — cannot appear in the data, so concat is injective.
SEP = "\x1f"


def canonical_sha256(*cols: Column | str) -> Column:
    """sha256 hex digest of the SEP-joined string form of ``cols``."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws(SEP, *[c.cast("string") for c in cs]), 256)


def canonical_sha256_sql(*exprs: str) -> str:
    """DuckDB-equivalent SQL text of :func:`canonical_sha256`."""
    casts = ", ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return f"sha256(concat_ws(chr(31), {casts}))"


def portable_hash64(col: Column | str, seed: int = 0) -> Column:
    """Deterministic 60-bit positive hash, identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    digest = F.sha2(F.concat(F.lit(f"s{seed}:"), c.cast("string")), 256)
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB-equivalent SQL text of :func:`portable_hash64`."""
    return (
        f"CAST(('0x' || substr(sha256('s{seed}:' || CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
