"""Text embedding via the hashing trick [EXT] — the operator that turns
`documents.text` into an `array<float>` column feeding the similarity
stack (brute-force kNN, LSH/IVF ANN, cosine near-dup).

Feature hashing is a real, production embedding baseline (no model
download, no vocab): each token maps to a bucket by hash with a ±1
sign, vectors are L2-normalized. Deterministic (sha256-derived), so
results are reproducible at any cluster size. Runs in `mapInPandas`
(Arrow batches + numpy) — the same plumbing a neural encoder UDF would
use; swapping in a sentence-transformer changes only `_embed_batch`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _token_bucket_sign(token: str, dim: int) -> tuple[int, float]:
    h = hashlib.sha256(token.encode()).digest()
    bucket = int.from_bytes(h[:4], "big") % dim
    sign = 1.0 if h[4] % 2 == 0 else -1.0
    return bucket, sign


def embed_schema(id_field: T.StructField) -> T.StructType:
    return T.StructType([id_field, T.StructField("embedding", T.ArrayType(T.FloatType()))])


def embed_text(docs: DataFrame, dim: int = 64, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, embedding): hashed bag-of-words, L2-normalized float32."""
    out_schema = embed_schema(docs.schema[id_col])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[int, float]] = {}
        for pdf in it:
            vecs = []
            for text in pdf[text_col]:
                v = np.zeros(dim, dtype="float64")
                for tok in (text or "").split():
                    if tok not in cache:
                        cache[tok] = _token_bucket_sign(tok, dim)
                    b, s = cache[tok]
                    v[b] += s
                norm = np.linalg.norm(v)
                if norm > 0:
                    v /= norm
                vecs.append(v.astype("float32").tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return docs.select(id_col, text_col).mapInPandas(batches, schema=out_schema)
