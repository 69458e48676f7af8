"""SQL surface tests (K6 DDL + §7 step 7: every query answerable via
spark.sql over registered views) and stream-stream joins (beyond the
reference's streaming surface), and the run-metrics sink (K5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.sources import tables
from e2e_stock_data_pipeline_spark.sources.tables import register_temp_views


class TestSqlSurface:
    def test_views_and_sql_query(self, spark, sf_dir):
        register_temp_views(spark, sf_dir)
        df = spark.sql(
            """
            SELECT l_returnflag, COUNT(*) AS n
            FROM lineitem WHERE l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'
            GROUP BY l_returnflag
            """
        )
        assert df.count() > 0

    def test_create_view_ddl(self, spark, sf_dir):
        register_temp_views(spark, sf_dir)
        spark.sql(
            """
            CREATE OR REPLACE TEMP VIEW event_features AS
            SELECT user_id, ts, value,
                   AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ma_20,
                   (value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                     / LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ret
            FROM events
            """
        )
        out = spark.sql("SELECT * FROM event_features WHERE ma_20 IS NOT NULL")
        assert out.count() == tables.load(spark, sf_dir, "events").count()

    def test_schema_ddl(self, spark):
        spark.sql("CREATE DATABASE IF NOT EXISTS engine_test_db")
        assert spark.catalog.databaseExists("engine_test_db")
        spark.sql("DROP DATABASE engine_test_db")


class TestStreamStreamJoin:
    def test_purchases_join_recent_views(self, spark, sf_dir, tmp_path):
        """Stream-stream inner join with watermarks + time-bound condition —
        each purchase joined to views of the same user within the prior
        hour; result must equal the identical batch join."""
        from e2e_stock_data_pipeline_spark.streaming import bronze
        from tests.test_streaming import EVENTS_SCHEMA, _write_chunk

        src, dest, ckpt = (str(tmp_path / d) for d in ["src", "out", "ckpt"])
        events = tables.load(spark, sf_dir, "events")
        _write_chunk(events, src)

        def split(df):
            base = df.withColumn("ts", F.col("ts").cast("timestamp"))
            p = base.filter(F.col("event_type") == "purchase").select(
                F.col("user_id"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
            )
            v = base.filter(F.col("event_type") == "view").select(
                F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
                F.col("event_id").alias("v_id"),
            )
            return p, v

        sp, sv = split(bronze.read_file_stream(spark, src, EVENTS_SCHEMA, "parquet"))
        joined = sp.withWatermark("p_ts", "2 hours").join(
            sv.withWatermark("v_ts", "2 hours"),
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        q = (
            joined.writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r.p_id, r.v_id) for r in spark.read.parquet(dest).collect()}

        bp, bv = split(events)
        expect = {
            (r.p_id, r.v_id)
            for r in bp.join(
                bv,
                (F.col("user_id") == F.col("v_user"))
                & (F.col("v_ts") <= F.col("p_ts"))
                & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            ).collect()
        }
        # stream emits the subset already sealed by the watermark; at
        # availableNow over a single load, all-but-tail matches
        assert got and got <= expect


class TestMetricsSink:
    def test_fold_and_roundtrip(self, spark, tmp_path):
        from e2e_stock_data_pipeline_spark.pipeline.metrics import (
            fold_results,
            read_run_metrics,
            write_run_metrics,
        )

        folded = fold_results(
            [
                {"rows_fetched": 100},
                {"rows_fetched": 50},
                {"rows_fetched": 0, "error": "HTTP 500"},
            ]
        )
        assert folded == {"tasks_ok": 2, "tasks_failed": 1, "rows_fetched": 150}
        p = write_run_metrics(folded, str(tmp_path / "logs"))
        assert "date=" in p and p.endswith(".json")
        df = read_run_metrics(spark, str(tmp_path / "logs"))
        row = df.collect()[0]
        assert row.rows_fetched == 150 and row.tasks_ok == 2


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir):
        from e2e_stock_data_pipeline_spark.sources.bucketing import read_table, write_bucketed

        orders = tables.load(spark, sf_dir, "orders")
        lineitem = tables.load(spark, sf_dir, "lineitem")
        write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", ["o_orderkey"], num_buckets=8,
        )
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bo.join(bl, "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # bucket co-location: join runs with NO Exchange (shuffle)
            assert "Exchange" not in plan, plan[:2000]
            n = joined.count()
            plain = orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).count()
            assert n == plain
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestDataFrameSqlEquivalence:
    def test_spark_sql_twins_match_dataframe_api(self, spark, sf_dir):
        """Dual surface: the spark.sql dialect twins return IDENTICAL
        results to the canonical DataFrame implementations."""
        from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules
        from e2e_stock_data_pipeline_spark.plans.spark_sql import SPARK_SQL

        reg = load_all_query_modules()
        register_temp_views(spark, sf_dir)
        for name, sql in SPARK_SQL.items():
            df_rows = sorted(
                tuple(repr(v) for v in r) for r in reg[name].spark(spark, sf_dir).collect()
            )
            sql_rows = sorted(tuple(repr(v) for v in r) for r in spark.sql(sql).collect())
            assert df_rows == sql_rows, f"{name}: DataFrame vs spark.sql results differ"
