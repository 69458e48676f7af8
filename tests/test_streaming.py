"""Structured Streaming tests: incremental file-stream bronze ingestion
(checkpointed exactly-once across restarts), rescue-column JSON parse,
schema evolution loop, and watermark window aggregates — the Auto
Loader surface rebuilt on OSS (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_stock_data_pipeline_spark.sources import tables
from e2e_stock_data_pipeline_spark.streaming import bronze
from e2e_stock_data_pipeline_spark.streaming.windows import (
    streaming_dedup,
    tumbling_counts,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write_chunk(df, path: str):
    df.coalesce(1).write.mode("append").parquet(path)


class TestBronzeFileStream:
    def test_incremental_exactly_once(self, spark, sf_dir, tmp_path):
        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "bronze", "ckpt"])
        events = tables.load(spark, sf_dir, "events")
        _write_chunk(events.filter(F.col("event_id") % 2 == 0), src)

        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        bronze.run_bronze_stream(stream, dest, ckpt)
        n1 = spark.read.parquet(dest).count()
        assert n1 == events.filter(F.col("event_id") % 2 == 0).count()

        # second batch of files: restart processes ONLY the new ones
        _write_chunk(events.filter(F.col("event_id") % 2 == 1), src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        bronze.run_bronze_stream(stream, dest, ckpt)
        out = spark.read.parquet(dest)
        assert out.count() == events.count()  # no duplicates from re-reading
        # lineage columns present
        assert {"_processing_time", "_input_file"} <= set(out.columns)
        assert out.filter(F.col("_input_file").isNull()).count() == 0

    def test_json_rescue_column(self, spark, tmp_path):
        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "bronze", "ckpt"])
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as f:
            f.write(json.dumps({"symbol": "AAPL", "v": 1}) + "\n")
            f.write('{"symbol": "MSFT", "v": broken\n')  # corrupt line
        schema = bronze.rescue_schema(
            T.StructType([
                T.StructField("symbol", T.StringType()),
                T.StructField("v", T.LongType()),
            ])
        )
        stream = bronze.read_file_stream(spark, src, schema, "json")
        bronze.run_bronze_stream(stream, dest, ckpt)
        out = spark.read.parquet(dest)
        rescued = out.filter(F.col(bronze.RESCUE_COL).isNotNull()).collect()
        assert len(rescued) == 1 and "broken" in rescued[0][bronze.RESCUE_COL]
        assert out.filter(F.col("symbol") == "AAPL").count() == 1

    def test_schema_evolution_loop(self, spark, tmp_path):
        src = str(tmp_path / "src")
        loc = str(tmp_path / "schemas")
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as f:
            f.write('{"symbol": "AAPL", "v": 1}\n')
        s1, evolved = bronze.evolve_schema(spark, src, loc)
        assert not evolved and set(s1.fieldNames()) == {"symbol", "v"}
        # new column appears in newly landed files
        with open(os.path.join(src, "b.json"), "w") as f:
            f.write('{"symbol": "MSFT", "v": 2, "new_col": "x"}\n')
        s2, evolved = bronze.evolve_schema(spark, src, loc)
        assert evolved and "new_col" in s2.fieldNames()
        # stable afterwards (registry persisted)
        s3, evolved = bronze.evolve_schema(spark, src, loc)
        assert not evolved and s3.fieldNames() == s2.fieldNames()


class TestStreamingWindows:
    def test_tumbling_stream_matches_batch(self, spark, sf_dir, tmp_path):
        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        events = tables.load(spark, sf_dir, "events")
        _write_chunk(events, src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        agg = tumbling_counts(stream)
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.bucket_start, r.event_type): (r.n, r.total_value)
            for r in spark.read.parquet(dest).collect()
        }
        expect = {
            (r.bucket_start, r.event_type): (r.n, r.total_value)
            for r in tumbling_counts(events).collect()
        }
        # append mode emits only windows sealed by the watermark; every
        # emitted window must match the batch result exactly
        assert got and all(expect[k] == v for k, v in got.items())

    def test_streaming_dedup(self, spark, sf_dir, tmp_path):
        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        events = tables.load(spark, sf_dir, "events").limit(100)
        dup = events.unionByName(events)  # exact duplicate rows
        _write_chunk(dup, src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        dd = streaming_dedup(stream, ["event_id"])
        q = (
            dd.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert spark.read.parquet(dest).count() == 100


class TestStatefulOperator:
    def test_running_user_stats(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming.stateful import running_user_stats
        import pyspark.sql.functions as F

        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        events = tables.load(spark, sf_dir, "events").limit(300)
        _write_chunk(events, src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        out = running_user_stats(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("user_stats")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r.user_id: (r.n_events, round(r.total_value, 6), r.max_value)
            for r in spark.sql("SELECT * FROM user_stats").collect()
        }
        expect = {
            r.user_id: (r.n, round(r.t, 6), r.m)
            for r in events.groupBy("user_id")
            .agg(F.count("value").alias("n"), F.sum("value").alias("t"), F.max("value").alias("m"))
            .collect()
        }
        assert got == expect


class TestStreamingCusum:
    def test_matches_literal_recursion_across_restart(self, spark, sf_dir, tmp_path):
        """The deployment twin of q174: batch calibrates (mean, h), the
        stream carries the recursion. Two micro-batches with a restart
        between them must land exactly where one pass of the literal
        Python recursion lands (state survives the checkpoint)."""
        from e2e_stock_data_pipeline_spark.streaming.stateful import streaming_cusum
        import pyspark.sql.functions as F

        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        events = (
            tables.load(spark, sf_dir, "events")
            .orderBy("ts", "event_id")
            .limit(400)
        )
        rows = events.select(
            "user_id", "ts", "event_id",
            (F.col("value").cast("decimal(18,4)") * 10000)
            .cast("bigint").alias("x_fp"),
        ).collect()
        mean_fp, h_fp = 1_000_000, 2_000_000

        # literal recursion in (ts, event_id) order per user
        expect = {}
        for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
            s, mx, alarms = expect.get(r.user_id, (0, 0, 0))
            s = max(0, s + (r.x_fp - mean_fp))
            mx = max(mx, s)
            if s > h_fp:
                alarms += 1
            expect[r.user_id] = (s, mx, alarms)

        # split time-ordered halves into two files; run, restart, run
        n = events.count()
        first = events.limit(n // 2)
        second = events.subtract(first)

        out = str(tmp_path / "out")

        def run_once():
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")

            def sink(bdf, bid):
                bdf.withColumn("batch_id", F.lit(bid)).write.mode(
                    "append"
                ).parquet(out)

            q = (
                streaming_cusum(stream, mean_fp, h_fp)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _write_chunk(first, src)
        run_once()
        _write_chunk(second, src)
        run_once()  # restarts from the checkpoint; state must survive

        # final state per user = the emission from the highest batch id
        got = {}
        for r in sorted(
            spark.read.parquet(out).collect(), key=lambda r: r.batch_id
        ):
            got[r.user_id] = (r.cusum_fp, r.max_cusum_fp, r.n_alarms)
        assert got == expect


class TestCusumClosedForm:
    def test_vectorized_kernel_equals_literal_loop(self):
        """Property (r12): the vectorized Lindley closed form inside
        _make_cusum_update is bit-identical to the per-row recursion for
        random int64 series, arbitrary carry-in state, and arbitrary
        micro-batch split points."""
        import random

        import pandas as pd

        from e2e_stock_data_pipeline_spark.streaming.stateful import _make_cusum_update

        class FakeState:
            def __init__(self):
                self.exists = False
                self._v = None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self.exists = True
                self._v = v

        for seed in range(8):
            rng = random.Random(seed)
            n = rng.randint(1, 200)
            mean_fp = rng.randint(-50, 50) * 10_000
            h_fp = rng.randint(1, 40) * 10_000
            xs = [rng.randint(-100, 100) * 10_000 for _ in range(n)]
            # literal recursion
            s = mx = alarms = 0
            for x in xs:
                s = max(0, s + (x - mean_fp))
                mx = max(mx, s)
                if s > h_fp:
                    alarms += 1
            # vectorized kernel across a random batch split (carry-in path)
            update = _make_cusum_update(mean_fp, h_fp)
            state = FakeState()
            cut = rng.randint(0, n)
            last = None
            for lo, hi in ((0, cut), (cut, n)):
                chunk = xs[lo:hi]
                pdf = pd.DataFrame(
                    {
                        "ts": list(range(lo, hi)),
                        "event_id": list(range(lo, hi)),
                        "x_fp": chunk,
                    }
                )
                out = list(update(("u",), [pdf], state))
                if len(chunk) or last is None:
                    last = out[0]
            got = (
                int(last["cusum_fp"][0]),
                int(last["max_cusum_fp"][0]),
                int(last["n_alarms"][0]),
            )
            assert got == (s, mx, alarms), f"seed={seed} n={n} cut={cut}"

    def test_int64_overflow_surfaces_as_error_not_wrong_counts(self):
        """The numpy kernel can wrap where the old Python-int loop could
        not; the guard must turn that into OverflowError instead of a
        silently wrong alarm count (ADVICE r12)."""
        import pandas as pd
        import pytest

        from e2e_stock_data_pipeline_spark.streaming.stateful import _make_cusum_update

        class FakeState:
            exists = False
            _v = None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self.exists, self._v = True, v

        # two near-int64-max deltas: cumsum would wrap negative
        big = 2**62
        update = _make_cusum_update(0, 10_000)
        pdf = pd.DataFrame({"ts": [0, 1, 2], "event_id": [0, 1, 2], "x_fp": [big] * 3})
        with pytest.raises(OverflowError, match="int64 bound"):
            list(update(("u",), [pdf], FakeState()))
        # sane magnitudes still pass untouched through the guard
        pdf = pd.DataFrame({"ts": [0, 1], "event_id": [0, 1], "x_fp": [10_000, 20_000]})
        out = list(update(("u",), [pdf], FakeState()))
        assert int(out[0]["cusum_fp"][0]) == 30_000


class TestForeachBatchUpsert:
    def test_stream_merge_keeps_latest(self, spark, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming.foreach_batch import stream_merge_upsert

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "silver", "ckpt"])
        schema = "symbol string, trade_date string, close double, v long"
        spark.createDataFrame(
            [("AAPL", "2024-09-13", 1.5, 1), ("AAPL", "2024-09-16", 1.6, 1)], schema
        ).coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_merge_upsert(stream, dest, ckpt, ["symbol", "trade_date"], "v")
        q.awaitTermination()
        assert spark.read.parquet(dest).count() == 2

        # late correction + new symbol arrive in a second file
        spark.createDataFrame(
            [("AAPL", "2024-09-16", 9.9, 2), ("MSFT", "2024-09-16", 5.0, 2)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_merge_upsert(stream, dest, ckpt, ["symbol", "trade_date"], "v")
        q.awaitTermination()
        got = {(r.symbol, r.trade_date): r.close for r in spark.read.parquet(dest).collect()}
        assert got == {
            ("AAPL", "2024-09-13"): 1.5,
            ("AAPL", "2024-09-16"): 9.9,  # updated by the late batch
            ("MSFT", "2024-09-16"): 5.0,
        }


class TestLateDataPolicy:
    def test_watermark_drops_late_events_in_append_aggregation(self, spark, tmp_path):
        """The engine's documented late-data policy (SURVEY §7 T8): events
        later than the watermark are dropped by streaming aggregation;
        the batch merge backstop (foreachBatch upsert) is the catch-all."""
        import datetime as dt

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        base = dt.datetime(2024, 1, 1, 0, 0, 0)

        def mk(rows):
            return spark.createDataFrame(
                [(i, t, 0, "view", 1.0, None) for i, t in rows],
                "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
            )

        # batch 1: events up to 12:00 -> watermark advances to ~10:00 (2h lag)
        mk([(1, base), (2, base + dt.timedelta(hours=12))]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        from e2e_stock_data_pipeline_spark.streaming.windows import tumbling_counts
        from tests.test_streaming import EVENTS_SCHEMA

        def run_once():
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
            q = (
                tumbling_counts(stream)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .option("path", dest)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        # batch 2: an event at 01:00 — far behind the 10:00 watermark
        mk([(3, base + dt.timedelta(hours=1))]).coalesce(1).write.mode("append").parquet(src)
        run_once()
        out = spark.read.parquet(dest)
        hour1 = out.filter(F.col("bucket_start") == base + dt.timedelta(hours=1)).collect()
        # the late event's window either never appears or excludes it
        assert all(r.n == 0 for r in hour1) if hour1 else True
        # and the on-time windows were emitted exactly once
        hour0 = out.filter(F.col("bucket_start") == base).collect()
        assert len(hour0) == 1 and hour0[0].n == 1

    def test_agg_watermark_drop_is_counted_not_silent(self, spark, tmp_path):
        """Policy: a drop must be OBSERVABLE — Spark accounts every
        behind-watermark row in numRowsDroppedByWatermark, and the engine's
        tests pin that contract (ARCHITECTURE.md late-data table)."""
        import datetime as dt

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        base = dt.datetime(2024, 1, 1, 0, 0, 0)

        def mk(rows):
            return spark.createDataFrame(
                [(i, t, 0, "view", 1.0, None) for i, t in rows],
                "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
            )

        from e2e_stock_data_pipeline_spark.streaming.windows import tumbling_counts

        def run_once():
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
            q = (
                tumbling_counts(stream)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .option("path", dest)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return sum(
                op.get("numRowsDroppedByWatermark", 0)
                for p in q.recentProgress
                for op in p.get("stateOperators", [])
            )

        mk([(1, base), (2, base + dt.timedelta(hours=12))]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        assert run_once() == 0  # nothing late yet
        mk([(3, base + dt.timedelta(hours=1))]).coalesce(1).write.mode("append").parquet(src)
        assert run_once() >= 1  # the late row is dropped AND counted

    def test_route_late_events_quarantines_not_drops(self, spark, tmp_path):
        """The explicit quarantine form: rows a watermarked agg would drop
        land in the late sink with lateness metadata; on-time rows pass."""
        import datetime as dt

        from e2e_stock_data_pipeline_spark.streaming.late import route_late_events

        src, main, late_p, ckpt = (
            str(tmp_path / d) for d in ["src", "main", "late", "ckpt"]
        )
        base = dt.datetime(2024, 1, 1, 0, 0, 0)

        def mk(rows):
            return spark.createDataFrame(
                [(i, t, 0, "view", 1.0, None) for i, t in rows],
                "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
            )

        def run_once():
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
            q = route_late_events(stream, "ts", "2 hours", main, late_p, ckpt)
            q.awaitTermination()

        # batch 1: max event time 12:00 -> horizon becomes 10:00
        mk([(1, base), (2, base + dt.timedelta(hours=12))]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once()
        # batch 2: 01:00 is behind the 10:00 horizon; 13:00 is on time
        mk(
            [(3, base + dt.timedelta(hours=1)), (4, base + dt.timedelta(hours=13))]
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()

        main_ids = {r.event_id for r in spark.read.parquet(main).collect()}
        late_rows = spark.read.parquet(late_p).collect()
        assert main_ids == {1, 2, 4}
        assert {r.event_id for r in late_rows} == {3}
        # 01:00 is 9 h behind the 10:00 horizon
        assert late_rows[0].late_by_seconds == 9 * 3600.0

    def test_late_audit_plan_is_the_streaming_splitters_batch_twin(
        self, spark, tmp_path
    ):
        """The q124 batch plan and route_late_events apply the SAME horizon
        rule: feed the splitter one file per arrival batch (each run_once
        = one micro-batch via the sidecar high-water mark), then replay
        the identical rows through late_audit_plan with the same batch
        assignment and delay, and demand identical per-batch late counts
        and on-time/late totals."""
        import datetime as dt

        from e2e_stock_data_pipeline_spark.streaming.late import (
            late_audit_plan,
            route_late_events,
        )

        src, main, late_p, ckpt = (
            str(tmp_path / d) for d in ["src", "main", "late", "ckpt"]
        )
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        # (event_id, event time, arrival batch): batch 1 has one straggler
        # behind the 10-minute horizon, batch 2 has two (one extreme), and
        # each batch also advances the high-water mark.
        rows = [
            (1, base, 0),
            (2, base + dt.timedelta(hours=1), 0),
            (3, base + dt.timedelta(minutes=30), 1),  # 30 min late
            (4, base + dt.timedelta(hours=2), 1),
            (5, base - dt.timedelta(hours=5), 2),  # extreme straggler
            (6, base + dt.timedelta(hours=1, minutes=55), 2),  # 5 min: on time
            (7, base + dt.timedelta(hours=3), 2),
        ]

        def mk(batch):
            return spark.createDataFrame(
                [(i, t, 0, "view", 1.0, None) for i, t, b in rows if b == batch],
                "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
            )

        for b in range(3):
            mk(b).coalesce(1).write.mode("append").parquet(src)
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
            q = route_late_events(stream, "ts", "10 minutes", main, late_p, ckpt)
            q.awaitTermination()

        stream_late = {r.event_id for r in spark.read.parquet(late_p).collect()}
        stream_main = {r.event_id for r in spark.read.parquet(main).collect()}
        assert stream_late == {3, 5}
        assert stream_main == {1, 2, 4, 6, 7}

        epoch = dt.datetime(1970, 1, 1)
        batched = spark.createDataFrame(
            [(int((t - epoch).total_seconds() * 1_000_000), b) for _, t, b in rows],
            "ev_us long, batch long",
        )
        audit = {
            r.batch: (r.n_events, r.n_late, r.max_late_by_us)
            for r in late_audit_plan(batched, 600_000_000).collect()
        }
        # batch 1: event 3 is 20 min behind the 00:50 horizon; batch 2:
        # event 5 is 6 h 50 min behind the 01:50 horizon, event 6 clears
        # it by 5 min.
        assert audit[0] == (2, 0, None)
        assert audit[1] == (2, 1, 20 * 60 * 1_000_000)
        assert audit[2] == (3, 1, (6 * 3600 + 50 * 60) * 1_000_000)
        assert sum(n for _, n, _ in audit.values()) == len(stream_late)


class TestSchemaDriftEndToEnd:
    def test_drift_restart_widens_bronze(self, spark, tmp_path):
        """The full Auto-Loader-replacement loop: land files -> infer+pin
        schema -> stream -> NEW COLUMN arrives -> evolve_schema detects ->
        restart stream with widened schema -> bronze holds both eras
        (old rows null for the new column)."""
        src, dest, ckpt, loc = (str(tmp_path / d) for d in ["src", "bronze", "ckpt", "schemas"])
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as f:
            f.write('{"symbol": "AAPL", "v": 1}\n')

        schema, evolved = bronze.evolve_schema(spark, src, loc)
        assert not evolved
        stream = bronze.read_file_stream(spark, src, bronze.rescue_schema(schema), "json")
        bronze.run_bronze_stream(stream, dest, ckpt)

        with open(os.path.join(src, "b.json"), "w") as f:
            f.write('{"symbol": "MSFT", "v": 2, "rating": "AA"}\n')
        schema, evolved = bronze.evolve_schema(spark, src, loc)
        assert evolved and "rating" in schema.fieldNames()
        stream = bronze.read_file_stream(spark, src, bronze.rescue_schema(schema), "json")
        bronze.run_bronze_stream(stream, dest, ckpt)

        out = spark.read.option("mergeSchema", "true").parquet(dest)
        rows = {r.symbol: r for r in out.collect()}
        assert len(rows) == 2
        assert rows["MSFT"].rating == "AA"
        assert rows["AAPL"].asDict().get("rating") is None  # old era: null


class TestProgressListener:
    def test_listener_captures_batches_and_flushes(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming.listener import ProgressMetricsListener

        listener = ProgressMetricsListener()
        spark.streams.addListener(listener)
        try:
            src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
            events = tables.load(spark, sf_dir, "events").limit(200)
            _write_chunk(events, src)
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
            bronze.run_bronze_stream(stream, dest, ckpt)
            import time

            for _ in range(20):  # listener events arrive async
                if listener.progress and listener.terminated:
                    break
                time.sleep(0.5)
            s = listener.summary()
            assert s["rows_processed"] == 200 and s["batches"] >= 1
            path = listener.flush(str(tmp_path / "logs"))
            row = spark.read.json(path).collect()[0]
            assert row.rows_processed == 200
        finally:
            spark.streams.removeListener(listener)


class TestIncrementalRollup:
    def test_rollup_equals_full_aggregate(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming.rollup import (
            hourly_rollup_partial,
            stream_hourly_rollup,
        )

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "rollup", "ckpt"])
        events = tables.load(spark, sf_dir, "events")

        # two arrivals, incremental maintenance after each
        _write_chunk(events.filter(F.col("event_id") % 2 == 0), src)
        q = stream_hourly_rollup(
            bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet"), dest, ckpt
        )
        q.awaitTermination()
        _write_chunk(events.filter(F.col("event_id") % 2 == 1), src)
        q = stream_hourly_rollup(
            bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet"), dest, ckpt
        )
        q.awaitTermination()

        got = {
            (r.bucket_start, r.event_type): (r.n, float(r.value_sum))
            for r in spark.read.parquet(dest).collect()
        }
        expect = {
            (r.bucket_start, r.event_type): (r.n, float(r.value_sum))
            for r in hourly_rollup_partial(events).collect()
        }
        assert got == expect  # incremental == full-history aggregate


    def test_epoch_replay_does_not_double_count(self, spark, sf_dir, tmp_path):
        """merge-ADD + epoch guard: replaying an already-applied epoch (the
        failure-recovery path) must not inflate the rollup; a genuinely
        new epoch still applies."""
        from e2e_stock_data_pipeline_spark.streaming import rollup as R

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "rollup", "ckpt"])
        events = tables.load(spark, sf_dir, "events").limit(500)
        _write_chunk(events, src)
        q = R.stream_hourly_rollup(
            bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet"), dest, ckpt
        )
        q.awaitTermination()
        snapshot = lambda: sorted(
            (r.bucket_start, r.event_type, r.n) for r in spark.read.parquet(dest).collect()
        )
        before = snapshot()
        batch = spark.read.parquet(src).drop("_processing_time", "_input_file")

        applied = R.apply_epoch(batch, dest, epoch_id=0)  # replay of epoch 0
        assert not applied and snapshot() == before

        applied = R.apply_epoch(batch, dest, epoch_id=R._read_last_epoch(dest) + 1)
        assert applied
        after = {k[:2]: k[2] for k in snapshot()}
        assert all(after[k[:2]] == 2 * k[2] for k in before)  # doubled counts


class TestMicroBatching:
    def test_max_files_per_trigger_produces_multiple_batches(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming.listener import ProgressMetricsListener

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        events = tables.load(spark, sf_dir, "events").limit(300)
        for i in range(3):  # three separate files
            _write_chunk(events.filter(F.col("event_id") % 3 == i), src)
        listener = ProgressMetricsListener()
        spark.streams.addListener(listener)
        try:
            stream = bronze.read_file_stream(
                spark, src, EVENTS_SCHEMA, "parquet", max_files_per_trigger=1
            )
            bronze.run_bronze_stream(stream, dest, ckpt)
            import time

            for _ in range(20):
                if len(listener.progress) >= 3:
                    break
                time.sleep(0.5)
            assert spark.read.parquet(dest).count() == 300
            assert len(listener.progress) >= 3  # one micro-batch per file
        finally:
            spark.streams.removeListener(listener)


class TestMissingFileResilience:
    def test_source_file_deleted_between_runs(self, spark, sf_dir, tmp_path):
        """T5 ignoreMissingFiles: a source file deleted after checkpointing
        must not fail subsequent runs."""
        import glob as _glob
        import os as _os

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        events = tables.load(spark, sf_dir, "events")
        _write_chunk(events.filter(F.col("event_id") % 2 == 0), src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        bronze.run_bronze_stream(stream, dest, ckpt)
        n1 = spark.read.parquet(dest).count()

        # delete the already-processed source file, land a new one
        for f in _glob.glob(f"{src}/*.parquet"):
            _os.remove(f)
        _write_chunk(events.filter(F.col("event_id") % 2 == 1), src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        bronze.run_bronze_stream(stream, dest, ckpt)  # must not raise
        assert spark.read.parquet(dest).count() == events.count()
        assert n1 == events.filter(F.col("event_id") % 2 == 0).count()


class TestStreamingOhlc:
    def test_stream_matches_batch_candles(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming.windows import hourly_ohlc

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        events = tables.load(spark, sf_dir, "events")
        _write_chunk(events, src)
        stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
        q = (
            hourly_ohlc(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.bucket_start): (r.open, r.high, r.low, r.close, r.n_ticks)
            for r in spark.read.parquet(dest).collect()
        }
        expect = {
            (r.user_id, r.bucket_start): (r.open, r.high, r.low, r.close, r.n_ticks)
            for r in hourly_ohlc(events).collect()
        }
        # append emits watermark-sealed windows; all emitted must match batch
        assert got and all(expect[k] == v for k, v in got.items())


class TestRollupAtomicity:
    """The epoch marker commits in the SAME rename as the merged data
    (ADVICE r1): no crash window where data reflects epoch N but the
    marker says N-1 (double-count on replay), and no rmtree window
    where the table is lost entirely."""

    def _batch(self, spark, sf_dir):
        return tables.load(spark, sf_dir, "events").limit(200)

    def test_marker_lives_inside_data_dir(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming import rollup as R

        dest = str(tmp_path / "rollup")
        batch = self._batch(spark, sf_dir)
        assert R.apply_epoch(batch, dest, epoch_id=0)
        assert os.path.exists(os.path.join(dest, "_last_epoch"))
        assert R._read_last_epoch(dest) == 0
        # Spark ignores underscore files: the table still reads clean
        assert spark.read.parquet(dest).count() > 0

    def test_recover_restores_renamed_aside_table(self, spark, sf_dir, tmp_path):
        import shutil as _sh

        from e2e_stock_data_pipeline_spark.streaming import rollup as R

        dest = str(tmp_path / "rollup")
        batch = self._batch(spark, sf_dir)
        R.apply_epoch(batch, dest, epoch_id=0)
        before = sorted(map(tuple, spark.read.parquet(dest).collect()))
        # simulate a crash between rename-aside and swap
        os.rename(dest, dest + "._rollup_old")
        # next apply_epoch heals first, then refuses the replayed epoch
        assert not R.apply_epoch(batch, dest, epoch_id=0)
        assert sorted(map(tuple, spark.read.parquet(dest).collect())) == before
        _sh.rmtree(dest)

    def test_no_stale_aside_dir_after_success(self, spark, sf_dir, tmp_path):
        from e2e_stock_data_pipeline_spark.streaming import rollup as R

        dest = str(tmp_path / "rollup")
        batch = self._batch(spark, sf_dir)
        R.apply_epoch(batch, dest, epoch_id=0)
        R.apply_epoch(batch, dest, epoch_id=1)
        assert not os.path.exists(dest + "._rollup_old")
        assert not os.path.exists(dest + "._rollup_tmp")
        assert R._read_last_epoch(dest) == 1


class TestFailureInjection:
    """Crash-replay semantics (VERDICT r1 #8): a batch whose sink write
    landed but whose checkpoint commit was lost (crash in the window
    between the two) is REPLAYED on restart; exactly-once must come from
    the sink — the parquet file sink's _spark_metadata transaction log,
    and the rollup's in-rename epoch marker."""

    def _recovered_checkpoint_missing_last_commit(self, ckpt: str) -> str:
        """A copy of the checkpoint as a recovering driver would find it
        after crashing between the sink commit and the checkpoint commit:
        offsets WAL complete, newest commit-log entry missing. (A copy,
        not in-place surgery — Spark 4 guards an in-session checkpoint
        path against concurrent modification.)"""
        import shutil as _sh

        recovered = ckpt + "_recovered"
        _sh.copytree(ckpt, recovered)
        commits = sorted(
            f for f in os.listdir(os.path.join(recovered, "commits")) if f.isdigit()
        )
        os.remove(os.path.join(recovered, "commits", commits[-1]))
        # drop the Hadoop checksum shadow too, or the local FS reports the
        # re-created commit file as already existing
        crc = os.path.join(recovered, "commits", f".{commits[-1]}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        return recovered

    def test_mid_stream_kill_and_restart_exactly_once(self, spark, sf_dir, tmp_path):
        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "bronze", "ckpt"])
        events = tables.load(spark, sf_dir, "events").limit(900)
        for m in range(3):  # three source files
            _write_chunk(events.filter(F.col("event_id") % 3 == m), src)

        # availableNow + 1 file per batch; stop the query as soon as the
        # first batch lands (kill mid-stream, before the backlog drains)
        stream = bronze.read_file_stream(
            spark, src, EVENTS_SCHEMA, "parquet", max_files_per_trigger=1
        )
        q = (
            bronze.with_lineage(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        while not os.path.exists(os.path.join(ckpt, "commits", "0")):
            pass
        q.stop()
        q.awaitTermination()

        # restart with the same checkpoint: drain the rest
        stream = bronze.read_file_stream(
            spark, src, EVENTS_SCHEMA, "parquet", max_files_per_trigger=1
        )
        bronze.run_bronze_stream(stream, dest, ckpt)
        assert spark.read.parquet(dest).count() == events.count()

    def test_lost_checkpoint_commit_replays_without_duplicates(
        self, spark, sf_dir, tmp_path
    ):
        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "bronze", "ckpt"])
        events = tables.load(spark, sf_dir, "events").limit(600)
        for m in range(2):
            _write_chunk(events.filter(F.col("event_id") % 2 == m), src)
        stream = bronze.read_file_stream(
            spark, src, EVENTS_SCHEMA, "parquet", max_files_per_trigger=1
        )
        bronze.run_bronze_stream(stream, dest, ckpt)
        n_committed = spark.read.parquet(dest).count()
        assert n_committed == events.count()

        # simulate the crash window: sink committed, checkpoint commit lost
        recovered = self._recovered_checkpoint_missing_last_commit(ckpt)
        stream = bronze.read_file_stream(
            spark, src, EVENTS_SCHEMA, "parquet", max_files_per_trigger=1
        )
        bronze.run_bronze_stream(stream, dest, recovered)
        # the replayed batch overwrote its own batch id in _spark_metadata:
        # a Spark read sees each input row exactly once
        assert spark.read.parquet(dest).count() == n_committed

    def test_rollup_lost_commit_replay_is_skipped_by_epoch_guard(
        self, spark, sf_dir, tmp_path
    ):
        from e2e_stock_data_pipeline_spark.streaming import rollup as R

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "rollup", "ckpt"])
        events = tables.load(spark, sf_dir, "events").limit(500)
        _write_chunk(events, src)
        q = R.stream_hourly_rollup(
            bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet"), dest, ckpt
        )
        q.awaitTermination()
        before = sorted(
            (r.bucket_start, r.event_type, r.n)
            for r in spark.read.parquet(dest).collect()
        )

        # lose the checkpoint commit: restart replays the epoch into
        # foreachBatch; the merged-in epoch marker must reject it
        recovered = self._recovered_checkpoint_missing_last_commit(ckpt)
        q = R.stream_hourly_rollup(
            bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet"), dest, recovered
        )
        q.awaitTermination()
        after = sorted(
            (r.bucket_start, r.event_type, r.n)
            for r in spark.read.parquet(dest).collect()
        )
        assert after == before  # no double-count from the replayed epoch


class TestStreamStreamJoin:
    """Watermarked two-stream join with a bounded enrichment window —
    inner results equal the batch join; outer rows flush only after the
    watermark passes their match window (bounded state, no retraction)."""

    DELAY = "30 minutes"

    def _sources(self, spark, sf_dir, tmp_path):
        events = tables.load(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = events.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
        _write_chunk(clicks, cdir)
        _write_chunk(purchases, pdir)
        return clicks, purchases, cdir, pdir

    def _schema(self):
        return T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_id", T.LongType()),
            ]
        )

    def _run(self, spark, cdir, pdir, dest, ckpt, how):
        from e2e_stock_data_pipeline_spark.streaming.join import stream_stream_join

        cs = spark.readStream.schema(self._schema()).parquet(cdir)
        ps = spark.readStream.schema(self._schema()).parquet(pdir)
        joined = stream_stream_join(
            cs, ps, key="user_id", left_ts="ts", right_ts="ts",
            watermark="10 minutes", max_delay=self.DELAY, how=how,
        ).select(
            F.col("l.user_id").alias("user_id"),
            F.col("l.event_id").alias("click_id"),
            F.col("l.ts").alias("click_ts"),
            F.col("r.event_id").alias("purchase_id"),
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def _batch_expected(self, clicks, purchases):
        c, p = clicks.alias("c"), purchases.alias("p")
        return {
            (r.user_id, r.click_id, r.purchase_id)
            for r in c.join(
                p,
                (F.col("c.user_id") == F.col("p.user_id"))
                & (F.col("p.ts") >= F.col("c.ts"))
                & (F.col("p.ts") <= F.col("c.ts") + F.expr(f"INTERVAL {self.DELAY}")),
            )
            .select(
                F.col("c.user_id").alias("user_id"),
                F.col("c.event_id").alias("click_id"),
                F.col("p.event_id").alias("purchase_id"),
            )
            .collect()
        }

    def test_inner_equals_batch_join(self, spark, sf_dir, tmp_path):
        clicks, purchases, cdir, pdir = self._sources(spark, sf_dir, tmp_path)
        dest, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, cdir, pdir, dest, ckpt, "inner")
        got = {
            (r.user_id, r.click_id, r.purchase_id)
            for r in spark.read.parquet(dest).collect()
        }
        expected = self._batch_expected(clicks, purchases)
        assert got == expected and len(expected) > 0

    def test_left_outer_flushes_on_watermark_advance(self, spark, sf_dir, tmp_path):
        clicks, purchases, cdir, pdir = self._sources(spark, sf_dir, tmp_path)
        dest, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, cdir, pdir, dest, ckpt, "leftOuter")
        matched = self._batch_expected(clicks, purchases)
        matched_click_ids = {m[1] for m in matched}
        unmatched_expected = {
            r.event_id for r in clicks.collect()
        } - matched_click_ids

        # availableNow ends with a no-data batch that advances the
        # watermark past the backlog, so unmatched clicks flush with null
        # purchase ids in the same run — EXCEPT clicks whose match window
        # is still inside the final watermark horizon (they cannot be
        # proven unmatched yet and stay in state: correct semantics)
        import datetime as _dt

        wm = min(
            clicks.agg(F.max("ts")).first()[0],
            purchases.agg(F.max("ts")).first()[0],
        ) - _dt.timedelta(minutes=10)
        flushable = {
            r.event_id
            for r in clicks.collect()
            if r.event_id in unmatched_expected
            and r.ts + _dt.timedelta(minutes=30) < wm
        }
        rows = spark.read.parquet(dest).collect()
        null_rows = {r.click_id for r in rows if r.purchase_id is None}
        assert flushable <= null_rows <= unmatched_expected
        got_matched = {
            (r.user_id, r.click_id, r.purchase_id)
            for r in rows
            if r.purchase_id is not None
        }
        assert got_matched == matched

        # late rows behind the watermark are dropped, not re-joined: a
        # second run over a late click file adds nothing
        import datetime as _dt

        late = spark.createDataFrame(
            [(1, _dt.datetime(2024, 1, 2), 10**9)], self._schema()
        )
        _write_chunk(late, cdir)
        self._run(spark, cdir, pdir, dest, ckpt, "leftOuter")
        rows2 = spark.read.parquet(dest).collect()
        assert {r.click_id for r in rows2 if r.click_id == 10**9} == set()
        assert len(rows2) == len(rows)


class TestTransformWithState:
    def test_tws_matches_apply_in_pandas_with_state(self, spark, sf_dir, tmp_path):
        """The Spark 4 StatefulProcessor twin produces the same running
        stats as the applyInPandasWithState form and the batch aggregate.
        Requires protobuf (the TWS state-server wire protocol); skipped
        where it isn't installed — the applyInPandasWithState form above
        covers the semantics either way."""
        import pytest as _pytest

        _pytest.importorskip(
            "google.protobuf",
            reason="transformWithState state server needs protobuf (not in this env)",
        )
        from e2e_stock_data_pipeline_spark.streaming.stateful import (
            running_user_stats_tws,
        )

        old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        try:
            src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
            events = tables.load(spark, sf_dir, "events").limit(300)
            _write_chunk(events, src)
            stream = bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet")
            out = running_user_stats_tws(stream)
            q = (
                out.writeStream.format("memory")
                .queryName("user_stats_tws")
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = {
                r.user_id: (r.n_events, round(r.total_value, 6), r.max_value)
                for r in spark.sql("SELECT * FROM user_stats_tws").collect()
            }
            expect = {
                r.user_id: (r.n, round(r.t, 6), r.m)
                for r in events.groupBy("user_id")
                .agg(
                    F.count("value").alias("n"),
                    F.sum("value").alias("t"),
                    F.max("value").alias("m"),
                )
                .collect()
            }
            assert got == expect
        finally:
            if old is not None:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    def test_processor_logic_batch_twin_without_state_server(self, spark, sf_dir):
        """Evidence for the protobuf-gated skip above: drive
        RunningStatsProcessor's handleInputRows directly through a fake
        typed-state harness (the part the state server would provide),
        feeding each key's rows as a 3-micro-batch sequence, and demand
        the final emission equals the batch aggregate AND the
        runtime-tested GroupState twin's semantics (count ignores
        nulls; max of none is null). Everything but the wire protocol
        runs for real."""
        import pandas as pd

        from e2e_stock_data_pipeline_spark.streaming.stateful import (
            RunningStatsProcessor,
        )

        if RunningStatsProcessor is None:
            pytest.skip("Spark < 4.0: no StatefulProcessor API")

        class FakeValueState:
            def __init__(self):
                self._v = None

            def exists(self):
                return self._v is not None

            def get(self):
                return self._v

            def update(self, v):
                self._v = tuple(v)

        class FakeHandle:
            def __init__(self):
                self.states = {}

            def getValueState(self, name, schema):
                return self.states.setdefault(name, FakeValueState())

        events = tables.load(spark, sf_dir, "events").limit(300)
        rows = events.select("user_id", "value", "event_id").collect()
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r.user_id, []).append((r.event_id, r.value))

        got = {}
        for uid, kv in by_key.items():
            proc = RunningStatsProcessor()
            proc.init(FakeHandle())
            vals = [v for _, v in sorted(kv)]
            # three micro-batches per key, the middle one possibly empty —
            # the state hand-off across handleInputRows calls is the point
            chunks = [vals[0::3], vals[1::3], vals[2::3]]
            last = None
            for chunk in chunks:
                out = list(
                    proc.handleInputRows(
                        (uid,), [pd.DataFrame({"value": chunk})], None
                    )
                )
                assert len(out) == 1
                last = out[0]
            proc.close()
            got[uid] = (
                int(last["n_events"].iloc[0]),
                round(float(last["total_value"].iloc[0]), 6),
                last["max_value"].iloc[0],
            )

        expect = {
            r.user_id: (
                r.n,
                round(r.t, 6) if r.t is not None else None,
                r.m,
            )
            for r in events.groupBy("user_id")
            .agg(
                F.count("value").alias("n"),
                F.sum("value").alias("t"),
                F.max("value").alias("m"),
            )
            .collect()
        }
        assert got == expect


class TestStateStoreKnob:
    """r14: the RocksDB provider is one config knob away (VERDICT item 5).

    The r13 experiment proved RocksDB throughput-neutral with 4.3x
    smaller resident state; session.get_spark / configure_existing now
    expose it via state_store="rocksdb" or SPARK_GRAFT_STATE_STORE.
    The full streaming suite runs green under both providers
    (BENCH_NOTES r14 records the paired runs)."""

    ROCKS = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    KEY = "spark.sql.streaming.stateStore.providerClass"

    def test_param_flips_provider_on_session(self, spark):
        from e2e_stock_data_pipeline_spark.session import get_spark

        old = spark.conf.get(self.KEY, None)
        try:
            s = get_spark(master="local[8]", shuffle_partitions=8,
                          state_store="rocksdb")
            assert s is spark  # getOrCreate reuses the test session
            assert s.conf.get(self.KEY) == self.ROCKS
        finally:
            if old is None:
                spark.conf.unset(self.KEY)
            else:
                spark.conf.set(self.KEY, old)

    def test_env_var_flips_provider_via_configure_existing(self, spark, monkeypatch):
        from e2e_stock_data_pipeline_spark.session import configure_existing

        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
        old = spark.conf.get(self.KEY, None)
        try:
            configure_existing(spark)
            assert spark.conf.get(self.KEY) == self.ROCKS
        finally:
            if old is None:
                spark.conf.unset(self.KEY)
            else:
                spark.conf.set(self.KEY, old)

    def test_unknown_provider_rejected(self):
        import pytest as _pytest

        from e2e_stock_data_pipeline_spark.session import _state_store_conf

        with _pytest.raises(ValueError):
            _state_store_conf("leveldb")

    def test_default_is_sparks_builtin(self, monkeypatch):
        from e2e_stock_data_pipeline_spark.session import _state_store_conf

        monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
        assert _state_store_conf(None) is None
