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
