"""Multimodal column plumbing [EXT]: image/audio/video as opaque
`binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` kernels.

The Spark-side machinery here is REAL and tested: schema contracts,
batch iteration shape, partition sizing. The actual media decode is
STUBBED (`decode_image_stub`) because no image/audio libraries exist in
this container — swap `_decode_one` for a PIL/ffmpeg call and nothing
else changes.

Scale notes: media blobs make wide rows — keep
`spark.sql.files.maxPartitionBytes` modest and let `mapInPandas`
stream batches (it never holds a partition in memory at once). The
metadata struct travels with the blob so filters on (format, width,
...) prune BEFORE any decode runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("decoded_ok", T.BooleanType(), False),
    ]
)


def _decode_one(content: bytes | None, fmt: str | None) -> tuple[float | None, bool]:
    """STUB decode: deterministic fake 'feature extraction'.

    Real deployments replace this body with e.g. PIL.Image.open; the
    mapInPandas contract around it is what the engine tests.
    """
    if content is None or not fmt:
        return None, False
    return float(sum(content) / len(content)) if content else 0.0, True


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            means, oks = [], []
            for content, fmt in zip(pdf["content"], pdf["format"]):
                m, ok = _decode_one(content, fmt)
                means.append(m)
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else None for c in pdf["content"]],
                    "byte_mean": means,
                    "decoded_ok": oks,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 4) -> DataFrame:
    """'Frame sampling' stand-in: slice every Nth byte of the blob —
    exercises the binary-slicing plumbing (substr on BinaryType) that a
    real video frame sampler needs, without a codec."""
    return media.select(
        "media_id",
        F.expr(f"filter(transform(sequence(1, length(content)), i -> CASE WHEN i % {every_n_bytes} = 1 THEN substring(content, i, 1) END), x -> x IS NOT NULL)").alias(
            "sampled_bytes"
        ),
    )
