"""Round-3 [EXT] additions, part 2: the remaining curation stages a
large-scale training pipeline runs between dedup and tokenization —

* chunk-level corpus dedup with document reassembly (q110): the
  RefinedWeb/CCNet-style pass that removes repeated spans *across*
  documents (boilerplate headers, license blocks) while keeping the
  rest of each document intact;
* edit-distance near-dup verification over prefix-blocked candidate
  pairs (q111): the character-level complement to token-level Jaccard
  (q42b) — catches small in-place edits shingles miss;
* per-language token-budget selection (q112): greedy quality-ordered
  packing under a fixed token budget, the data-mixing step that turns
  scored documents into a training slice.

All outputs are exact integer arithmetic (counts, Levenshtein,
integer-division ppm ratios) so the driver's value-hash comparison is
bit-stable; see the cross-engine rules in plans/registry.py.

Reference parity: the reference's curation tier is doc-ware
(README.md "data quality" notes); these are the standard public-corpus
curation operators (RefinedWeb §3, CCNet) re-expressed as Catalyst
plans with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import tables
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "documents")


# Non-overlapping 30-word chunks (stride == window so reassembly is
# lossless). Spark slice() is 1-based length-counted; DuckDB list
# slicing is 1-based inclusive — [s*30+1 : s*30+30] spans 30 elements.
_CHUNK = 30
_WS = "split(trim(text), ' +')"
_SQL_WS = "regexp_split_to_array(trim(text), ' +')"


# --------------------------------------------------------------------------
# q110: chunk-level corpus dedup + reassembly
# --------------------------------------------------------------------------


@query(
    "q110_chunk_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_WS} AS ws FROM documents),
    chunks AS (
      SELECT doc_id, CAST(s AS INT) AS chunk_id,
             array_to_string(ws[(s * {_CHUNK} + 1):(s * {_CHUNK} + {_CHUNK})], ' ') AS chunk_text
      FROM w, unnest(range(0, CAST(ceil(len(ws) / {_CHUNK}.0) AS BIGINT))) AS t(s)
    ),
    kept AS (
      SELECT doc_id, chunk_id, chunk_text,
             row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn
      FROM chunks
    ),
    keptagg AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
             string_agg(chunk_text, ' ' ORDER BY chunk_id) AS clean_text
      FROM kept WHERE rn = 1 GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, CAST(ceil(len(ws) / {_CHUNK}.0) AS INT) AS n_chunks FROM w
    )
    SELECT t.doc_id, t.n_chunks,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.clean_text, '') AS clean_text
    FROM totals t LEFT JOIN keptagg k ON t.doc_id = k.doc_id
    """,
    doc="Chunk-level corpus dedup with reassembly (RefinedWeb-style): "
    "documents split into non-overlapping 30-word chunks, each distinct "
    "chunk text kept only at its first occurrence ordered by (doc_id, "
    "chunk_id), surviving chunks re-joined per document in order. "
    "Removes cross-document boilerplate spans without dropping whole "
    "docs. Two shuffles — one on chunk_text (the dedup window), one on "
    "doc_id (reassembly); both keys are high-cardinality so no hot "
    "reducer at 100 TB.",
    tags=("dedup", "chunking", "curation", "ext"),
)
def q110_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_chunks = f"CAST(ceil(size({_WS}) / {_CHUNK}.0) AS BIGINT)"
    chunk_structs = F.expr(
        f"transform(sequence(0, {n_chunks} - 1), "
        f"s -> struct(CAST(s AS INT) AS chunk_id, "
        f"array_join(slice({_WS}, s * {_CHUNK} + 1, {_CHUNK}), ' ') AS chunk_text))"
    )
    chunks = d.select("doc_id", F.explode(chunk_structs).alias("_c")).select(
        "doc_id", "_c.chunk_id", "_c.chunk_text"
    )
    first = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
    keptagg = (
        chunks.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    totals = d.select("doc_id", F.expr(n_chunks).cast("int").alias("n_chunks"))
    return totals.join(keptagg, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# --------------------------------------------------------------------------
# q111: edit-distance near-dup verification on prefix-blocked pairs
# --------------------------------------------------------------------------

_BLOCK_CAP = 20  # drop viral prefixes: per-block pair work <= cap^2/2


@query(
    "q111_editdist_neardup",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, trim(text) AS txt,
             array_to_string(({_SQL_WS})[1:5], ' ') AS bk
      FROM documents
    ),
    sized AS (
      SELECT bk FROM b GROUP BY bk HAVING COUNT(*) <= {_BLOCK_CAP}
    ),
    capped AS (SELECT b.* FROM b JOIN sized USING (bk))
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           CAST(levenshtein(a.txt, c.txt) AS INT) AS edit_dist,
           CAST((greatest(len(a.txt), len(c.txt)) - levenshtein(a.txt, c.txt))
                * 1000000 // greatest(len(a.txt), len(c.txt)) AS BIGINT) AS sim_ppm,
           (greatest(len(a.txt), len(c.txt)) - levenshtein(a.txt, c.txt)) * 1000000
             // greatest(len(a.txt), len(c.txt)) >= 800000 AS is_neardup
    FROM capped a JOIN capped c ON a.bk = c.bk AND a.doc_id < c.doc_id
    """,
    doc="Character-level near-dup verification: candidate pairs blocked "
    "on the first-5-word prefix (viral prefixes above doc-freq "
    f"{_BLOCK_CAP} dropped, bounding per-block work at cap^2/2 — same "
    "contract as q42b's posting-list cap), then exact Levenshtein "
    "distance and an integer ppm similarity. Catches small in-place "
    "edits that token-level Jaccard (q42b) misses. One shuffle on the "
    "block key; the quadratic step never leaves a bounded block.",
    tags=("dedup", "similarity", "curation", "ext"),
)
def q111_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _docs(spark, sf_dir).select(
        "doc_id",
        F.trim(F.col("text")).alias("txt"),
        F.array_join(F.slice(F.expr(_WS), 1, 5), " ").alias("bk"),
    )
    ok = b.groupBy("bk").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") <= _BLOCK_CAP)
    capped = b.join(ok.select("bk"), "bk")
    a = capped.select(F.col("bk").alias("bk_a"), F.col("doc_id").alias("doc_a"), F.col("txt").alias("ta"))
    c = capped.select(F.col("bk").alias("bk_b"), F.col("doc_id").alias("doc_b"), F.col("txt").alias("tb"))
    lev = F.levenshtein("ta", "tb")
    sim_ppm = F.expr(
        "(greatest(length(ta), length(tb)) - levenshtein(ta, tb)) * 1000000"
        " div greatest(length(ta), length(tb))"
    )
    return a.join(c, (F.col("bk_a") == F.col("bk_b")) & (F.col("doc_a") < F.col("doc_b"))).select(
        "doc_a",
        "doc_b",
        lev.cast("int").alias("edit_dist"),
        sim_ppm.cast("bigint").alias("sim_ppm"),
        (sim_ppm >= 800000).alias("is_neardup"),
    )


# --------------------------------------------------------------------------
# q112: per-language token-budget selection (greedy quality packing)
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_BUDGET = 2000  # tokens per language


@query(
    "q112_token_budget_pack",
    oracle=f"""
    WITH w AS (SELECT lang, doc_id, {_SQL_WS} AS ws FROM documents),
    scored AS (
      SELECT lang, doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(ws,
                    w -> w IN {_STOPWORDS!r})) * 1000000
                  // len(ws) AS BIGINT) AS quality_ppm
      FROM w
    ),
    ranked AS (
      SELECT *, SUM(n_tokens) OVER (PARTITION BY lang
               ORDER BY quality_ppm DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM scored
    )
    SELECT lang, doc_id, n_tokens, quality_ppm, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked WHERE cum_tokens <= {_BUDGET}
    """,
    doc="Token-budget data mixing: per language, documents are ranked by "
    "a quality signal (stopword-density ppm — natural prose scores "
    "high, keyword soup low) and greedily packed until a fixed token "
    "budget fills. The running total is one window (partitioned by "
    "lang, integer-exact), so the whole selection is a single shuffle "
    "on lang + doc sort — no driver-side loop, and per-language "
    "partitions scale independently at 100 TB.",
    tags=("text", "curation", "sampling", "ext"),
)
def q112_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    scored = _docs(spark, sf_dir).select(
        "lang",
        "doc_id",
        F.expr(f"CAST(size({_WS}) AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"CAST(size(filter({_WS}, w -> w IN ({sw}))) * 1000000"
            f" div size({_WS}) AS BIGINT)"
        ).alias("quality_ppm"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality_ppm").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= _BUDGET)
    )
