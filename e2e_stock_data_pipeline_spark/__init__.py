"""e2e_stock_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference repo MateoClagg/E2E-Stock-Data-Pipeline
(a stock-market medallion pipeline: raw ingestion -> Bronze -> Silver
dedup/merge -> Gold window-function features), extended with
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
    session     SparkSession factory tuned for local[N] and cluster use
    sources     batch + streaming readers (parquet/json/csv, file streams)
    functions   column-level expression helpers (hashing, text, vectors)
    operators   composed dataframe operators (dedup, as-of join, windows,
                similarity, text analysis)
    plans       the named query inventory + DuckDB oracle SQL registry
    streaming   structured-streaming pipelines (bronze loader, windows)
    pipeline    medallion layers (bronze/silver/gold) re-expressed on Spark
"""

__version__ = "0.1.0"
