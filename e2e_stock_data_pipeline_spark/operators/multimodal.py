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


def _be_uint(col: str, start: int, nbytes: int):
    """Big-endian unsigned int from a 1-based byte range of a binary col
    (hex + base conversion — stays in whole-stage codegen)."""
    return F.conv(F.hex(F.expr(f"substring({col}, {start}, {nbytes})")), 16, 10).cast("int")


def _le_uint(col: str, start: int, nbytes: int):
    """Little-endian unsigned int: per-byte hex concatenated in reverse."""
    parts = [F.hex(F.expr(f"substring({col}, {start + i}, 1)")) for i in range(nbytes - 1, -1, -1)]
    return F.conv(F.concat(*parts), 16, 10).cast("int")


def png_metadata(media: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL (not stubbed) PNG header parse in pure Catalyst: validate the
    8-byte signature and read width/height from the IHDR chunk
    (big-endian uint32 at bytes 17-20 / 21-24). No decode library — the
    container header is plain binary arithmetic, which is exactly the
    metadata a 100 TB media pipeline extracts BEFORE deciding what to
    hand to a decoder. Returns (media_id, is_png, png_width, png_height);
    dimensions are null for non-PNG blobs."""
    sig_ok = F.hex(F.expr(f"substring({content_col}, 1, 8)")) == "89504E470D0A1A0A"
    ihdr_ok = F.expr(f"substring({content_col}, 13, 4)").cast("string") == "IHDR"
    is_png = (F.length(content_col) >= 24) & sig_ok & ihdr_ok
    return media.select(
        "media_id",
        is_png.alias("is_png"),
        F.when(is_png, _be_uint(content_col, 17, 4)).alias("png_width"),
        F.when(is_png, _be_uint(content_col, 21, 4)).alias("png_height"),
    )


def wav_metadata(media: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL WAV (RIFF) header parse in pure Catalyst: validates
    RIFF/WAVE/fmt markers and reads channels, sample rate, and bit
    depth from the little-endian PCM fmt chunk. Same design point as
    png_metadata: container metadata without a codec."""
    riff = F.expr(f"substring({content_col}, 1, 4)").cast("string") == "RIFF"
    wave = F.expr(f"substring({content_col}, 9, 4)").cast("string") == "WAVE"
    fmt = F.expr(f"substring({content_col}, 13, 4)").cast("string") == "fmt "
    is_wav = (F.length(content_col) >= 36) & riff & wave & fmt
    return media.select(
        "media_id",
        is_wav.alias("is_wav"),
        F.when(is_wav, _le_uint(content_col, 23, 2)).alias("n_channels"),
        F.when(is_wav, _le_uint(content_col, 25, 4)).alias("sample_rate"),
        F.when(is_wav, _le_uint(content_col, 35, 2)).alias("bits_per_sample"),
    )


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
