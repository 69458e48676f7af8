"""Text-analysis query inventory [EXT] over `documents`: token counts,
quality scoring, language heuristic, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup as D
from ..sources import tables
from .registry import query

_SQL_WORDS = "regexp_split_to_array(trim(text), ' +')"
_SQL_STOPLIST = "('the', 'a', 'of', 'and', 'to', 'in')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "documents")


@query(
    "q44_text_stats",
    oracle=f"""
    SELECT doc_id,
      CAST(length(text) AS INT) AS n_chars_calc,
      CAST(len(ws) AS INT) AS n_tokens_ws,
      CAST(len(regexp_extract_all(text, '{T.BPE_RE}')) AS INT) AS n_tokens_bpe,
      CAST(len(list_distinct(ws)) AS INT) AS n_types,
      CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) AS avg_word_len,
      CAST(len(list_filter(ws, x -> x IN {_SQL_STOPLIST})) AS DOUBLE)
        / len(ws) AS stop_ratio
    FROM (SELECT doc_id, text, {_SQL_WORDS} AS ws FROM documents)
    """,
    doc="Per-document token/char/type counts + ratios (token counting, quality inputs).",
    tags=("text", "ext"),
    bench=True,
)
def q44_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        T.ws_token_count("text").alias("n_tokens_ws"),
        T.bpe_token_count("text").alias("n_tokens_bpe"),
        T.type_count("text").alias("n_types"),
        T.avg_word_len("text").alias("avg_word_len"),
        T.stopword_ratio("text").alias("stop_ratio"),
    )


@query(
    "q45_quality_buckets",
    oracle=f"""
    WITH w AS (SELECT source, {_SQL_WORDS} AS ws FROM documents),
    scored AS (
      SELECT source,
        least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0)
        * (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
        * least((CAST(len(list_filter(ws, x -> x IN {_SQL_STOPLIST})) AS DOUBLE)
                / len(ws)) * 10.0, 1.0) AS q
      FROM w
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality,
           CAST(SUM(CAST(floor(q * 1000000) AS BIGINT)) AS BIGINT) AS total_q_micro
    FROM scored GROUP BY source
    """,
    doc="Composite quality score per doc, aggregated per source "
    "(score sum fixed-point-ized to dodge FP summation order).",
    tags=("text", "quality", "ext"),
)
def q45_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    q = T.quality_score("text")
    # Sum of doubles is order-dependent; aggregate a fixed-point version so
    # both engines hash identically at any parallelism.
    return (
        d.select("source", q.alias("q"))
        .select("source", "q", F.floor(F.col("q") * 1000000).cast("bigint").alias("q_micro"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("q") >= 0.5, 1).otherwise(0)).cast("bigint").alias("n_high_quality"),
            F.sum("q_micro").cast("bigint").alias("total_q_micro"),
        )
    )


@query(
    "q46_lang_heuristic",
    oracle=f"""
    WITH w AS (SELECT lang, {_SQL_WORDS} AS ws FROM documents),
    pred AS (
      SELECT lang,
        CASE WHEN CAST(len(list_filter(ws, x -> x IN {_SQL_STOPLIST})) AS DOUBLE)
                  / len(ws) >= 0.08 THEN 'en' ELSE 'unk' END AS lang_pred
      FROM w
    )
    SELECT lang, lang_pred, COUNT(*) AS n
    FROM pred GROUP BY lang, lang_pred
    """,
    doc="Stopword-density language heuristic vs labeled lang (confusion counts).",
    tags=("text", "langid", "ext"),
)
def q46_lang_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    pred = F.when(T.stopword_ratio("text") >= 0.08, "en").otherwise("unk")
    return (
        d.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q47_doc_fingerprint",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws), 1)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM w
    )
    SELECT doc_id,
           MIN(CAST(('0x' || substr(sha256('s42:' || bigram), 1, 15)) AS BIGINT)) AS fingerprint
    FROM sh GROUP BY doc_id
    """,
    doc="Rolling-hash document fingerprint: min portable hash over word bigrams.",
    tags=("text", "fingerprint", "ext"),
)
def q47_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    sh = D.exploded_shingles(_docs(spark, sf_dir), n=2, distinct=False)
    return sh.groupBy("doc_id").agg(
        F.min(portable_hash64(F.col("shingle"), seed=42)).alias("fingerprint")
    )
