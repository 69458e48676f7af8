"""Generate a local sf1/sf10 dataset (mult x sf0.1; mult=10 -> 6M
lineitem "sf1", mult=100 -> 60M "sf10") for the bench headroom
experiments — NOT driver testdata (that is read-only; this lands in the
gitignored /root/repo/.bench_sf1/sf{mult/10}/).

Schemas and value distributions mirror the driver's sf0.1 tables
(probed ranges: see BENCH_NOTES r7); all randomness is DuckDB hash()
based, so the dataset is bit-reproducible. region/nation are fixed dims
and are copied verbatim from sf0.1.

    python scripts/gen_sf1.py [scale_mult]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

SEGMENTS = "['BUILDING','MACHINERY','AUTOMOBILE','HOUSEHOLD','FURNITURE']"
PRIORITIES = "['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']"
TYPES = "['STANDARD','SMALL','MEDIUM','LARGE','ECONOMY','PROMO']"
EVENT_TYPES = "['view','click','purchase','signup','error']"
LANGS = "['en','en','en','de','fr','es','pt']"  # en-heavy like the source
VOCAB = (
    "['batch','part','spark','line','column','order','small','sort','fast',"
    "'value','scan','a','hash','slow','group','agg','filter','query','big',"
    "'key','window','row','table','stream','merge','data','vector','join',"
    "'plan','shard']"
)


def main(mult: int = 10) -> None:
    sf = mult / 10
    OUT = f"/root/repo/.bench_sf1/sf{int(sf) if sf == int(sf) else sf}"
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def write(name: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n:,} rows")

    for dim in ("region", "nation"):
        write(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

    n_cust, n_supp, n_part = 15_000 * mult, 1_000 * mult, 20_000 * mult
    n_ord, n_li = 150_000 * mult, 600_000 * mult
    n_ev, n_doc, n_vec = 100_000 * mult, 5_000 * mult, 2_000 * mult

    write(
        "customer",
        f"""
        SELECT i AS c_custkey,
               'Customer#' || i AS c_name,
               CAST(hash(i + 11) % 25 AS INTEGER) AS c_nationkey,
               ROUND(CAST(hash(i + 12) % 1100000 AS DOUBLE) / 100 - 1000, 2) AS c_acctbal,
               {SEGMENTS}[CAST(hash(i + 13) % 5 AS INT) + 1] AS c_mktsegment
        FROM (SELECT unnest(range({n_cust})) AS i)
        """,
    )
    write(
        "supplier",
        f"""
        SELECT i AS s_suppkey,
               'Supplier#' || i AS s_name,
               CAST(hash(i + 21) % 25 AS INTEGER) AS s_nationkey,
               ROUND(CAST(hash(i + 22) % 1100000 AS DOUBLE) / 100 - 1000, 2) AS s_acctbal
        FROM (SELECT unnest(range({n_supp})) AS i)
        """,
    )
    write(
        "part",
        f"""
        SELECT i AS p_partkey,
               {VOCAB}[CAST(hash(i + 31) % 30 AS INT) + 1] || ' ' ||
               {VOCAB}[CAST(hash(i + 32) % 30 AS INT) + 1] AS p_name,
               'Brand#' || (CAST(hash(i + 33) % 5 AS INT) + 1)
                        || (CAST(hash(i + 34) % 5 AS INT) + 1) AS p_brand,
               {TYPES}[CAST(hash(i + 35) % 6 AS INT) + 1] AS p_type,
               CAST(hash(i + 36) % 50 AS INTEGER) + 1 AS p_size,
               900.0 + CAST(hash(i + 37) % 1000 AS DOUBLE) / 10 AS p_retailprice
        FROM (SELECT unnest(range({n_part})) AS i)
        """,
    )
    write(
        "orders",
        f"""
        SELECT i AS o_orderkey,
               CAST(hash(i + 41) % {n_cust} AS BIGINT) AS o_custkey,
               CASE WHEN hash(i + 42) % 100 < 3 THEN 'P'
                    WHEN hash(i + 42) % 2 = 0 THEN 'O' ELSE 'F' END AS o_orderstatus,
               ROUND(1000 + CAST(hash(i + 43) % 49900000 AS DOUBLE) / 100, 2) AS o_totalprice,
               TIMESTAMP '1995-01-01'
                 + CAST(hash(i + 44) % 2404 AS INT) * INTERVAL 1 DAY AS o_orderdate,
               {PRIORITIES}[CAST(hash(i + 45) % 5 AS INT) + 1] AS o_orderpriority
        FROM (SELECT unnest(range({n_ord})) AS i)
        """,
    )
    write(
        "lineitem",
        f"""
        SELECT CAST(i // 4 AS BIGINT) AS l_orderkey,
               CAST(hash(i + 51) % {n_part} AS BIGINT) AS l_partkey,
               CAST(hash(i + 52) % {n_supp} AS BIGINT) AS l_suppkey,
               CAST(i % 4 AS INTEGER) + 1 AS l_linenumber,
               CAST(hash(i + 53) % 50 AS DOUBLE) + 1 AS l_quantity,
               ROUND(900 + CAST(hash(i + 54) % 10410000 AS DOUBLE) / 100, 2) AS l_extendedprice,
               CAST(hash(i + 55) % 11 AS DOUBLE) / 100 AS l_discount,
               CAST(hash(i + 56) % 9 AS DOUBLE) / 100 AS l_tax,
               ['A','N','R'][CAST(hash(i + 57) % 3 AS INT) + 1] AS l_returnflag,
               ['O','F'][CAST(hash(i + 58) % 2 AS INT) + 1] AS l_linestatus,
               TIMESTAMP '1995-01-02'
                 + CAST(hash(i + 59) % 2494 AS INT) * INTERVAL 1 DAY AS l_shipdate
        FROM (SELECT unnest(range({n_li})) AS i)
        """,
    )
    # events: ~monotone ts over 30 days with ~1s jitter (the source table's
    # shape: corr(event_id, ts) ~ 0.99998), 10x the users
    span_us = 30 * 86_400 * 1_000_000
    write(
        "events",
        f"""
        SELECT i AS event_id,
               make_timestamp(epoch_us(TIMESTAMP '2024-01-01')
                 + i * ({span_us} // {n_ev})
                 + CAST(hash(i + 61) % 2000000 AS BIGINT)) AS ts,
               CAST(hash(i + 62) % {1_500 * mult} AS BIGINT) AS user_id,
               {EVENT_TYPES}[CAST(hash(i + 63) % 5 AS INT) + 1] AS event_type,
               ROUND(CAST(hash(i + 64) % 56021 AS DOUBLE) / 100, 2) AS value,
               '{{"k": ' || CAST(hash(i + 65) % 100 AS INT) || '}}' AS props
        FROM (SELECT unnest(range({n_ev})) AS i)
        """,
    )
    write(
        "documents",
        f"""
        SELECT i AS doc_id,
               array_to_string(
                 list_transform(range(1, 11 + CAST(hash(i + 71) % 51 AS INT)),
                                j -> {VOCAB}[CAST(hash(i * 1000 + j) % 30 AS INT) + 1]),
                 ' ') AS text,
               {LANGS}[CAST(hash(i + 72) % 7 AS INT) + 1] AS lang,
               'src' || CAST(hash(i + 73) % 20 AS INT) AS source,
               CAST(length(array_to_string(
                 list_transform(range(1, 11 + CAST(hash(i + 71) % 51 AS INT)),
                                j -> {VOCAB}[CAST(hash(i * 1000 + j) % 30 AS INT) + 1]),
                 ' ')) AS BIGINT) AS n_chars
        FROM (SELECT unnest(range({n_doc})) AS i)
        """,
    )
    write(
        "embeddings",
        f"""
        SELECT i AS vec_id,
               list_transform(range(64),
                 d -> CAST(CAST(hash(i * 64 + d) % 2000 AS DOUBLE) / 1000 - 1 AS FLOAT))
                 AS embedding,
               CAST(hash(i + 81) % 10 AS INTEGER) AS label
        FROM (SELECT unnest(range({n_vec})) AS i)
        """,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
