"""Multimodal column handling (SURVEY.md §2C C30): image/audio/video as
opaque ``binary`` columns + typed metadata structs.

Generalizes the reference's S3 object shape `{key, content: Buffer}`
(`/root/reference/adapters/s3/src/index.ts:167-177`) to a lakehouse
layout: ``spark.read.format("binaryFile")`` for ingest, metadata
extraction JVM-side, and decode/feature steps as Arrow-batched
``mapInPandas`` operators.

The image/audio codec libraries are not in this container, so the
*decode* internals are stubbed (deterministic fake or
NotImplementedError, clearly marked); the Spark-side plumbing — schema,
batch iteration, partition sizing — is real and tested. Swapping the
stub for PIL/libav is a one-function change on executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte sniffing: pure byte ops, JVM-side.
_MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "wav": b"RIFF",
    "pdf": b"%PDF",
}


def with_media_type(df: DataFrame, content_col: str = "content", out: str = "media_type") -> DataFrame:
    """Sniff media type from magic bytes — no Python, runs at scan speed."""
    c = F.col(content_col)
    expr = F.lit("unknown")
    for name, magic in _MAGIC.items():
        hex_prefix = magic.hex()
        expr = F.when(
            F.hex(F.substring(c, 1, len(magic))) == hex_prefix.upper(), F.lit(name)
        ).otherwise(expr)
    return df.withColumn(out, expr)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _decode_image_stub(data: bytes) -> tuple[int, int, float]:
    """STUB decoder — deterministic fake (no image libs in container).

    Real implementation: ``PIL.Image.open(io.BytesIO(data))`` → size +
    luminance. The fake derives stable pseudo-dimensions from content
    length/bytes so tests are reproducible.
    """
    n = len(data)
    width = 16 + (n % 1024)
    height = 16 + ((n // 7) % 1024)
    mean_luma = round((sum(data[:256]) / max(min(n, 256), 1)) / 255.0, 6)
    return width, height, mean_luma


def extract_image_features(df: DataFrame, content_col: str = "content", path_col: str = "path") -> DataFrame:
    """Decode + featurize via mapInPandas: Arrow batches of binary in,
    feature rows out. Partition-parallel; executors never hold more
    than one Arrow batch of images in memory."""
    content_idx_cols = [path_col, content_col]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[content_col]) if r[content_col] is not None else b""
                w, h, luma = _decode_image_stub(data)
                rows.append((r[path_col], len(data), w, h, luma))
            yield pd.DataFrame(
                rows, columns=["path", "n_bytes", "width", "height", "mean_luma"]
            )

    return df.select(*content_idx_cols).mapInPandas(op, IMAGE_FEATURES_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    frame_size: int = 4096,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling (video keyframes / audio windows): split each blob
    into fixed-size frames, keep every ``stride``-th. Real codecs would
    seek keyframes; the byte-window slicing stands in (STUB), while the
    fan-out shape (one row in → many frame rows out) is the real
    operator contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[content_col]) if r[content_col] is not None else b""
                # ceil: the trailing partial frame is real data, not waste
                n_frames = max(-(-len(data) // frame_size), 1)
                for i in range(0, n_frames, stride):
                    rows.append((r[path_col], i, data[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "frame_bytes"])

    return df.select(path_col, content_col).mapInPandas(op, AUDIO_FRAMES_SCHEMA)
