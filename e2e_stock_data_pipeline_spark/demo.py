"""End-to-end demo: the full medallion flow plus the training-data
operators, on the driver's synthetic tables and temp dirs.

    python -m e2e_stock_data_pipeline_spark.demo [sf_dir]

What a user of the reference repo gets after switching: the same
raw -> bronze -> silver -> gold path (but executed + tested, not
notebook-ware), and the scale extensions (dedup, similarity, text).
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from .functions.calendar import build_trading_calendar
from .operators import dedup as D
from .operators.similarity import brute_force_topk
from .pipeline.gold import price_features
from .pipeline.metrics import fold_results, write_run_metrics
from .pipeline.prices import normalize_prices, write_partitioned_by_day
from .pipeline.silver import merge_upsert
from .session import get_spark
from .sources import tables
from .sources.ingest import ENDPOINTS, IngestClient, ingest_endpoint, write_ndjson_gz
from .streaming import bronze


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="engine-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="engine-demo-")
    print(f"== demo workspace: {root}")

    # 1. Ingestion tier (mock transport stands in for the market-data API)
    client = IngestClient(
        lambda url, p: ([{"date": "2024-01-31", "revenue": 7, "fillingDate": "2024-02-05"}], 200),
        sleeper=lambda s: None,
    )
    recs = ingest_endpoint(
        spark, client, ENDPOINTS["income"], ["AAPL", "MSFT"], "2024-09-15", "2024-09-15T01:00:00"
    )
    write_ndjson_gz(recs, f"{root}/raw/income")
    print(f"== raw zone: {recs.count()} NDJSON records (gzip)")

    # 2. Streaming bronze (checkpointed incremental file stream + lineage)
    schema = bronze.rescue_schema(spark.read.json(f"{root}/raw/income").schema)
    stream = bronze.read_file_stream(spark, f"{root}/raw/income", schema, "json")
    bronze.run_bronze_stream(stream, f"{root}/bronze", f"{root}/ckpt")
    print(f"== bronze: {spark.read.parquet(f'{root}/bronze').count()} rows (with lineage cols)")

    # 3. Prices: locked schema -> day-partitioned raw -> silver -> gold
    raw_prices = spark.createDataFrame(
        [
            ("aapl", "2024-09-13", 1.0, 2.0, 0.5, 1.5, 100, "2024-09-15T01:00:00+00:00", "r1"),
            ("aapl", "2024-09-16", 1.1, 2.1, 0.6, 1.6, 110, "2024-09-15T01:00:00+00:00", "r1"),
            ("msft", "2024-09-16", 9.0, 9.0, 9.0, 9.0, 50, "2024-09-15T01:00:00+00:00", "r2"),
        ],
        ["symbol", "date", "open", "high", "low", "close", "volume", "fetched_at", "request_id"],
    )
    locked = normalize_prices(raw_prices)
    write_partitioned_by_day(locked, f"{root}/prices_raw")
    silver_in = locked.select(
        "symbol", F.col("as_of_date").alias("trade_date"), "close",
        F.col("fetched_at").alias("ingest_ts"),
    )
    merge_upsert(spark, f"{root}/silver", silver_in, ["symbol", "trade_date"], "ingest_ts")
    gold = price_features(spark.read.parquet(f"{root}/silver"))
    print("== gold features:")
    gold.orderBy("symbol", "trade_date").show()

    # 4. Trading calendar dimension
    cal = build_trading_calendar(spark, "2024-09-01", "2024-09-30", holidays=["2024-09-02"])
    print(f"== calendar: {cal.filter('is_trading').count()} trading days in Sept 2024")

    # 5. Training-data operators on the synthetic corpus
    docs = tables.load(spark, sf_dir, "documents")
    sh = D.exploded_shingles(docs)
    pairs = D.lsh_candidate_pairs(D.minhash_bands(sh))
    print(f"== MinHash-LSH near-dup candidates: {pairs.count()} pairs over {docs.count()} docs")
    emb = tables.load(spark, sf_dir, "embeddings")
    knn = brute_force_topk(emb.filter(F.col("vec_id") < 3), emb.filter(F.col("vec_id") >= 3), k=3)
    print("== cosine top-3 neighbors for 3 query vectors:")
    knn.show()

    # 6. Run metrics
    path = write_run_metrics(fold_results([{"rows_fetched": recs.count()}]), f"{root}/logs")
    print(f"== metrics written: {path}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
