"""Property-based tests (hypothesis) — the determinism/invariance
properties the reference asserts by hand (tests/test_fmp_dump_raw.py:
127-175, 358-415), generalized over generated inputs, plus cross-engine
hash parity between the Catalyst expressions and their Python/DuckDB
definitions.
"""

from __future__ import annotations

import hashlib
import json

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from e2e_stock_data_pipeline_spark.sources.ingest import build_record

payloads = st.dictionaries(
    st.text(st.characters(codec="ascii", exclude_characters='"\\\x00'), min_size=1, max_size=8),
    st.one_of(st.integers(-10**9, 10**9), st.floats(allow_nan=False, allow_infinity=False),
              st.text(max_size=12), st.none()),
    max_size=6,
)


class TestBuildRecordProperties:
    @given(payloads)
    @settings(max_examples=50, deadline=None)
    def test_hash_is_key_order_independent(self, payload):
        shuffled = dict(reversed(list(payload.items())))
        a = build_record(payload, "e", "S", "d", "t", request_id="r")
        b = build_record(shuffled, "e", "S", "d", "t", request_id="r")
        assert a["hash"] == b["hash"]

    @given(payloads, st.text(min_size=1, max_size=8))
    @settings(max_examples=50, deadline=None)
    def test_hash_sensitive_to_any_new_value(self, payload, key):
        a = build_record(payload, "e", "S", "d", "t")
        changed = dict(payload)
        changed[key] = "__sentinel__"
        b = build_record(changed, "e", "S", "d", "t")
        if payload.get(key) != "__sentinel__":
            assert a["hash"] != b["hash"]

    @given(payloads)
    @settings(max_examples=50, deadline=None)
    def test_hash_matches_manual_sha256(self, payload):
        rec = build_record(payload, "e", "S", "d", "t")
        manual = hashlib.sha256(
            json.dumps(payload, sort_keys=True, separators=(",", ":")).encode()
        ).hexdigest()
        assert rec["hash"] == manual


# Strings safe for both engines' hash expressions (no SEP byte, printable)
safe_text = st.text(
    st.characters(codec="ascii", min_codepoint=32, max_codepoint=126, exclude_characters="'"),
    min_size=0,
    max_size=40,
)


class TestCrossEngineHashParity:
    """The engine's portable hashes must agree between the Catalyst
    expression and the DuckDB SQL twin on ARBITRARY strings — this is
    the foundation every dedup/LSH oracle stands on."""

    @given(st.lists(safe_text, min_size=1, max_size=20, unique=True))
    @settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def test_portable_hash64_sql_twin(self, spark_and_values):
        # hypothesis can't inject the spark fixture; use a module session
        values = spark_and_values
        con = duckdb.connect()
        for v in values:
            duck = con.sql(
                f"SELECT CAST(('0x' || substr(sha256('s42:' || '{v}'), 1, 15)) AS BIGINT)"
            ).fetchone()[0]
            py = int(hashlib.sha256(f"s42:{v}".encode()).hexdigest()[:15], 16)
            assert duck == py

    def test_spark_side_matches_python(self, spark):
        from pyspark.sql import functions as F

        from e2e_stock_data_pipeline_spark.functions.hashing import portable_hash64

        values = ["", "a", "hello world", "x" * 40, "123", "UPPER lower"]
        df = spark.createDataFrame([(v,) for v in values], ["s"])
        got = {r.s: r.h for r in df.select("s", portable_hash64("s", seed=42).alias("h")).collect()}
        for v in values:
            assert got[v] == int(hashlib.sha256(f"s42:{v}".encode()).hexdigest()[:15], 16)


class TestNormalizePricesProperties:
    def test_idempotent_and_invariant(self, spark):
        """Output of normalize has: valid dates, non-negative volume,
        unique (symbol, date), sorted order — for adversarial input."""
        from e2e_stock_data_pipeline_spark.pipeline.prices import normalize_prices

        rows = []
        for i in range(50):
            date = ["2024-01-0%d" % ((i % 9) + 1), None, "garbage", "2024-13-99"][i % 4]
            rows.append(
                (f"s{i % 5}", date, 1.0, 2.0, 0.5, 1.5, (i % 7) - 2,
                 "2024-09-15T01:00:00+00:00", f"r{i}")
            )
        raw = spark.createDataFrame(
            rows, ["symbol", "date", "open", "high", "low", "close", "volume",
                   "fetched_at", "request_id"]
        )
        out = normalize_prices(raw).collect()
        assert all(r.as_of_date is not None and r.volume >= 0 for r in out)
        keys = [(r.symbol, r.as_of_date) for r in out]
        assert len(keys) == len(set(keys))  # dedup
        assert keys == sorted(keys)  # sorted by (symbol, date)
