"""Generate a zipf-skewed sf1-sized dataset (VERDICT r10 item 5).

Same schemas, row counts, and value distributions as scripts/gen_sf1.py
(hash()-seeded, bit-reproducible) with ONE change: the two join/group
keys the skew operators exist for follow a zipf(~1) law instead of
uniform —

  * events.user_id     ~ zipf over 1,500*mult users
  * lineitem.l_partkey ~ zipf over 20,000*mult parts
  * documents.source   ~ zipf over 20 sources (head ~23% of the corpus)
  * documents.lang     ~ 90% en (the q127 head-language regime)
  * events.event_type  ~ zipf over the 5 types (head ~43%)

Zipf via inverse-CDF of the log-uniform: key = floor(exp(u * ln(N)))-1
with u = hash-uniform in [0,1); p(key=k) ~ 1/(k+1), so key 0 carries
ln(2)/ln(N) of ALL rows (~7% at N=15k — one group is ~1000x the mean)
and the top-10 keys carry ~25%. This is data-level skew, not the
property tests' synthetic 90%-head injection: stragglers emerge from
the distribution itself.

    python scripts/gen_skewed.py [scale_mult]   # default 10 -> sf1-sized

Output: /root/repo/.bench_sf1/skew{sf}/ (gitignored scratch).
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
LANGS = "['en','en','en','de','fr','es','pt']"
SKEW_LANGS = (
    "['en','en','en','en','en','en','en','en','en','de']"  # 90% head lang
)
VOCAB = (
    "['batch','part','spark','line','column','order','small','sort','fast',"
    "'value','scan','a','hash','slow','group','agg','filter','query','big',"
    "'key','window','row','table','stream','merge','data','vector','join',"
    "'plan','shard']"
)


def zipf_key(seed_expr: str, n: int) -> str:
    """Deterministic zipf(1) key in [0, n): floor(exp(u*ln n)) - 1."""
    u = f"(CAST({seed_expr} % 1000000 AS DOUBLE) / 1000000)"
    return f"CAST(LEAST(exp({u} * ln({n})), {n}) AS BIGINT) - 1"


def main(mult: int = 10) -> None:
    sf = mult / 10
    OUT = f"/root/repo/.bench_sf1/skew{int(sf) if sf == int(sf) else sf}"
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
    n_users = 1_500 * mult

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
    # l_partkey: zipf — the hot part is joined/grouped by q-plans that
    # aggregate per part; also makes the orders join side-skewed.
    write(
        "lineitem",
        f"""
        SELECT CAST(i // 4 AS BIGINT) AS l_orderkey,
               {zipf_key(f"hash(i + 51)", n_part)} AS l_partkey,
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
    span_us = 30 * 86_400 * 1_000_000
    # user_id: zipf — the hot user is ~7% of ALL events (at sf1: ~70k
    # events in one group vs a ~67-row mean).
    write(
        "events",
        f"""
        SELECT i AS event_id,
               make_timestamp(epoch_us(TIMESTAMP '2024-01-01')
                 + i * ({span_us} // {n_ev})
                 + CAST(hash(i + 61) % 2000000 AS BIGINT)) AS ts,
               {zipf_key(f"hash(i + 62)", n_users)} AS user_id,
               {EVENT_TYPES}[CAST({zipf_key("hash(i + 63)", 5)} AS INT) + 1] AS event_type,
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
               {SKEW_LANGS}[CAST(hash(i + 72) % 10 AS INT) + 1] AS lang,
               'src' || CAST({zipf_key("hash(i + 73)", 20)} AS INT) AS source,
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
    # print the realized skew so the notes can quote it
    for t, k in (
        ("events", "user_id"),
        ("events", "event_type"),
        ("lineitem", "l_partkey"),
        ("documents", "source"),
        ("documents", "lang"),
    ):
        top = con.execute(
            f"""SELECT {k}, COUNT(*) c FROM '{OUT}/{t}.parquet'
                GROUP BY 1 ORDER BY c DESC LIMIT 3"""
        ).fetchall()
        tot = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}.{k} head: " + ", ".join(f"{k_}={c} ({c/tot:.1%})" for k_, c in top))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
