"""Round-8 query additions [EXT]:

* q128 — oracle-gated IVF ANN (VERDICT r7 item 2). The inverted-file
  index was the one ANN path without a green driver row: operators/
  similarity.ivf_topk fits a real KMeans (non-replayable by SQL), so it
  carried only recall tests. q128 applies the q123 trick to the coarse
  quantizer: seed centroids are the n_cells smallest-id candidates
  (KMeans iteration zero) refined by ONE exact Lloyd step whose
  centroid update is component-wise integer `sum div count` —
  truncation-toward-zero division matches DuckDB's `//` exactly (both
  yield -3 for -7/2), so the learned index, the probe choice, and the
  in-cell exact rerank all replay bit-for-bit in SQL over the same
  integer-quantized vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64_sql
from ..operators.similarity import ivf_rerank_topk_seeded
from ..sources import tables
from .queries_ext6 import _D2, _SQL_Q
from .registry import query

# IVF geometry shared by the Spark plan and the SQL oracle: 64-dim
# vectors, 16 cells, 4 probes per query, top-5.
_DIM, _N_CELLS, _N_PROBE, _K = 64, 16, 4, 5


@query(
    "q128_ivf_rerank",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_Q} AS q FROM embeddings),
    qs AS (SELECT vec_id, q FROM e WHERE vec_id < 5),
    cand AS (SELECT vec_id, q FROM e WHERE vec_id >= 5),
    seeds AS (
      SELECT q AS cent, row_number() OVER (ORDER BY vec_id) - 1 AS c
      FROM (SELECT vec_id, q FROM cand ORDER BY vec_id LIMIT {_N_CELLS})
    ),
    a0 AS (
      SELECT cand_id, cell FROM (
        SELECT cd.vec_id AS cand_id, s.c AS cell,
               row_number() OVER (PARTITION BY cd.vec_id
                                  ORDER BY {_D2.format(a="cd.q", b="s.cent")}, s.c) AS r
        FROM cand cd CROSS JOIN seeds s
      ) WHERE r = 1
    ),
    pos AS (SELECT unnest(range(1, {_DIM} + 1)) AS pos),
    cent AS (
      SELECT cell AS c, list(cv ORDER BY pos) AS cent FROM (
        SELECT a0.cell, p.pos,
               CAST(SUM(cd.q[p.pos]) // COUNT(*) AS BIGINT) AS cv
        FROM a0 JOIN cand cd ON a0.cand_id = cd.vec_id CROSS JOIN pos p
        GROUP BY a0.cell, p.pos
      ) GROUP BY cell
    ),
    a1 AS (
      SELECT cand_id, cell FROM (
        SELECT cd.vec_id AS cand_id, ct.c AS cell,
               row_number() OVER (PARTITION BY cd.vec_id
                                  ORDER BY {_D2.format(a="cd.q", b="ct.cent")}, ct.c) AS r
        FROM cand cd CROSS JOIN cent ct
      ) WHERE r = 1
    ),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT qq.vec_id AS query_id, ct.c AS cell,
               row_number() OVER (PARTITION BY qq.vec_id
                                  ORDER BY {_D2.format(a="qq.q", b="ct.cent")}, ct.c) AS r
        FROM qs qq CROSS JOIN cent ct
      ) WHERE r <= {_N_PROBE}
    )
    SELECT query_id, cand_id, CAST(cell AS INT) AS cell, exact_d2,
           CAST(rnk AS INT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY exact_d2, cand_id) AS rnk
      FROM (
        SELECT p.query_id, a1.cand_id, a1.cell,
               {_D2.format(a="qv.q", b="cv.q")} AS exact_d2
        FROM probes p
        JOIN a1 ON p.cell = a1.cell
        JOIN qs qv ON p.query_id = qv.vec_id
        JOIN cand cv ON a1.cand_id = cv.vec_id
      )
    ) WHERE rnk <= {_K}
    """,
    doc="IVF ANN with an oracle-replayable learned index: seed "
    "centroids (16 smallest-id candidates) + one exact Lloyd step "
    "(centroid = component-wise sum div count, truncating division "
    "identical in Spark and DuckDB), candidates indexed by refined "
    "cell, each query probes its 4 nearest cells and exact-reranks "
    "only in-cell candidates to top-5. Every centroid frame is "
    "broadcast and the search joins candidates to the BROADCAST probe "
    "frame — candidates are never shuffled on the 16-value cell key. "
    "Closes the last ANN path without oracle evidence (ivf_topk is "
    "the KMeans-fit production twin, recall-tested).",
    tags=("similarity", "ann", "ivf", "ext"),
)
def q128_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables.load(spark, sf_dir, "embeddings")
    return ivf_rerank_topk_seeded(
        e.filter(F.col("vec_id") < 5),
        e.filter(F.col("vec_id") >= 5),
        dim=_DIM,
        n_cells=_N_CELLS,
        n_probe=_N_PROBE,
        k_top=_K,
    )


# Per-(source, lang) document cap — the C4/RefinedWeb domain-quota
# primitive: no single origin may contribute more than _CAP docs per
# language to the training mix. Output is dimension-bounded (at most
# n_groups * _CAP rows at ANY scale factor), and the keep decision is
# the same deterministic hash rank as q127/q113, so the kept SET is
# reproducible on any engine and layout.
_CAP, _CAP_SEED = 8, 13


@query(
    "q129_source_lang_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY {portable_hash64_sql("doc_id", seed=_CAP_SEED)}, doc_id
             ) AS rnk
      FROM documents
    )
    SELECT doc_id, source, lang FROM ranked WHERE rnk <= {_CAP}
    """,
    doc=f"Per-(source, lang) cap at {_CAP} docs (the C4/RefinedWeb "
    "domain-quota rule): groups over the cap are clipped to their "
    f"{_CAP} smallest seeded-hash ranks, groups under it keep whole. "
    "Runs on the generic skew-safe keep "
    "(operators/ranking.bucketed_group_keep — q127's bucketed "
    "distributed rank with a composite group key): no data-sized sort "
    "on the group key, buckets wholly above the cap pruned broadcast-"
    "side before any window. Output is dimension-bounded "
    "(groups x cap rows) at every scale factor.",
    tags=("ext", "curation", "sampling", "cap"),
)
def q129_source_lang_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import bucketed_group_keep

    docs = tables.load(spark, sf_dir, "documents")
    targets = (
        docs.select("source", "lang")
        .distinct()
        .withColumn("n_target", F.lit(_CAP).cast("bigint"))
    )
    return bucketed_group_keep(
        docs.select("doc_id", "source", "lang"),
        ["source", "lang"],
        targets,
        id_col="doc_id",
        seed=_CAP_SEED,
    )
