"""Spark-SQL dialect twins for representative registry queries
(SURVEY §7 step 7: every capability answerable through BOTH the
DataFrame API and spark.sql). The DataFrame version stays the engine's
canonical implementation; these strings run over
`sources.tables.register_temp_views` and must return IDENTICAL results
(tests/test_sql_surface.py asserts it).
"""

SPARK_SQL = {
    "q01_pricing_summary": """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q06_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q10_group_having_dupes": """
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS n
        FROM orders
        GROUP BY o_custkey, CAST(o_orderdate AS DATE)
        HAVING COUNT(*) > 1
    """,
    "q13_topk_active_users": """
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY user_id
        ORDER BY n_events DESC, user_id
        LIMIT 20
    """,
    "q21_moving_averages": """
        SELECT event_id, user_id, ts, value,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w5 AS DOUBLE) / COUNT(value) OVER w5 AS ma_5,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w20 AS DOUBLE) / COUNT(value) OVER w20 AS ma_20
        FROM events
        WINDOW
          w5 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
          w20 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    "q24_keep_last_dedup": """
        SELECT user_id, event_type, event_id, ts, value
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) t WHERE rn = 1
    """,
    "q29_tumbling_hourly": """
        SELECT window.start AS bucket_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY window(ts, '1 hour'), event_type
    """,
    "q52_big_orders": """
        WITH big AS (
          SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) >= 250
        )
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice, b.total_qty
        FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
    """,
    "q76_bulk_part_suppliers": """
        SELECT s.s_suppkey, s.s_name, s.s_acctbal
        FROM supplier s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND l.l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > CAST(45 AS DECIMAL(18,4))
        )
        AND s.s_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_6', 'NATION_9', 'NATION_11')
        )
    """,
    "q78_idle_rich_customers": """
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS a
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.a
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP_NTZ'1998-01-01 00:00:00'
          )
        GROUP BY c.c_nationkey
    """,
}
