"""End-to-end walkthrough: the reference's whole medallion pipeline on
this engine, offline (echo transport, no network), in one run:

    python demo.py [workdir]

ingest (Spark DataSource, executor-side fetch) -> bronze file stream
(checkpointed, lineage columns) -> silver merge-upsert (keep-newest)
-> gold window features (one shuffle) -> dedup + text quality over the
documents table -> curation (quality gate -> training packs) ->
run-metrics JSON. Prints a one-line summary per stage; everything it
calls is the same code the 112 registered queries and the test suite
exercise.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import functions as F

from e2e_stock_data_pipeline_spark.operators.dedup import (
    exploded_shingles,
    lsh_candidate_pairs,
    minhash_bands,
)
from e2e_stock_data_pipeline_spark.pipeline.gold import price_features
from e2e_stock_data_pipeline_spark.pipeline.metrics import write_run_metrics
from e2e_stock_data_pipeline_spark.pipeline.prices import (
    normalize_prices,
    write_partitioned_by_day,
)
from e2e_stock_data_pipeline_spark.pipeline.silver import merge_upsert
from e2e_stock_data_pipeline_spark.session import get_spark
from e2e_stock_data_pipeline_spark.sources import datasource as DS
from e2e_stock_data_pipeline_spark.sources import tables
from e2e_stock_data_pipeline_spark.streaming import bronze

SF = "/root/testdata/sf0.001"


def main(workdir: str | None = None) -> int:
    from pyspark.sql import SparkSession

    root = workdir or tempfile.mkdtemp(prefix="engine-demo-")
    # getOrCreate may hand us a session we don't own (e.g. the test
    # suite's) — only stop what we created ourselves
    ambient = SparkSession.getActiveSession()
    spark = get_spark(app_name="engine-demo", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest: the endpoint registry as a Spark source (offline echo)
    DS.register(spark)
    raw = (
        spark.read.format("stock_endpoint")
        .option("endpoint", "prices")
        .option("symbols", "AAPL,MSFT,NVDA")
        .option("as_of_date", "2026-08-12")
        .option("transport", "demo_prices")
        .load()
    )
    print(f"[1 ingest   ] {raw.count()} records from the stock_endpoint source")

    # 2. normalize to the locked 12-column schema, day-partitioned parquet
    bars = raw.select(
        "symbol", "request_id", "fetched_at", F.from_json(
            "payload",
            "date STRING, open STRING, high STRING, low STRING, close STRING, volume STRING",
        ).alias("_p"),
    ).select("symbol", "request_id", "fetched_at", "_p.*")
    prices = normalize_prices(bars)
    write_partitioned_by_day(prices, f"{root}/raw/prices")
    print(f"[2 normalize] {prices.count()} valid bars -> dt= partitioned parquet")

    # 3. bronze: checkpointed incremental file stream with lineage
    stream = bronze.read_file_stream(
        spark, f"{root}/raw/prices/dt=*", prices.drop("as_of_date").schema, "parquet"
    )
    bronze.run_bronze_stream(stream, f"{root}/bronze/prices", f"{root}/ckpt/bronze")
    bronze_df = spark.read.parquet(f"{root}/bronze/prices")
    print(f"[3 bronze   ] {bronze_df.count()} rows, lineage cols "
          f"{sorted(c for c in bronze_df.columns if c.startswith('_'))}")

    # 4. silver: keep-newest merge-upsert (idempotent re-run safe)
    silver_src = prices.select(
        "symbol", F.col("as_of_date").cast("string").alias("trade_date"),
        "close", "fetched_at",
    )
    merge_upsert(spark, f"{root}/silver/prices", silver_src, ["symbol", "trade_date"], "fetched_at")
    merge_upsert(spark, f"{root}/silver/prices", silver_src, ["symbol", "trade_date"], "fetched_at")
    silver = spark.read.parquet(f"{root}/silver/prices")
    print(f"[4 silver   ] {silver.count()} rows after two identical merges (no dupes)")

    # 5. gold: the reference's price_features view (one shuffle, 4 features)
    gold = price_features(silver)
    print(f"[5 gold     ] features over {gold.count()} rows: "
          f"{[c for c in gold.columns if c not in silver.columns]}")

    # 6. the training-data tier: near-dup candidates + quality over documents
    docs = tables.load(spark, SF, "documents")
    cands = lsh_candidate_pairs(
        minhash_bands(exploded_shingles(docs, distinct=False))
    )
    print(f"[6 dedup    ] {cands.count()} MinHash-LSH candidate pairs over "
          f"{docs.count()} docs at sf0.001")

    # 6b. curation: quality gate -> sequence packing (the training-shard
    # plan a data pipeline hands to the tokenizer)
    from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

    reg = load_all_query_modules()
    keep = reg["q89_gopher_rules"].spark(spark, SF).filter(F.col("keep")).select("doc_id")
    packs = reg["q107_context_packing"].spark(spark, SF)
    plan = keep.join(packs, "doc_id")
    n_packs = plan.select("shard", "pack_id").distinct().count()
    print(f"[6b curate  ] {plan.count()} docs pass the Gopher gate -> "
          f"{n_packs} 512-token training packs")

    # 7. run metrics JSON
    path = write_run_metrics(
        {"stage_counts": {"bronze": bronze_df.count(), "silver": silver.count()}},
        f"{root}/logs",
    )
    print(f"[7 metrics  ] {json.loads(open(path).read())['stage_counts']} -> {path}")
    print(f"demo artifacts under {root}")
    if ambient is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
