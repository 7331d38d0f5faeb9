"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a
`binary` column with a metadata struct; run decode / feature-extraction
/ resize / frame-sampling as Arrow-batched pandas functions via
``mapInPandas`` so bytes never round-trip through Python row objects.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode kernels here are deterministic fakes that are
clearly marked; the Spark-side plumbing — schema, batch iteration,
partition sizing, UDF signatures — is real and tested. Swap `_fake_*`
for a real decoder and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_mean", DoubleType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_bytes", BinaryType(), False),
    ]
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: documents' text bytes as fake payloads
    (lets the plumbing be exercised without codec libraries)."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        (F.col("n_chars") % 512 + 16).cast("long").alias("width"),
        (F.col("n_chars") % 256 + 16).cast("long").alias("height"),
        (F.col("n_chars") % 16 + 1).cast("long").alias("n_frames"),
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decode: replace with a real image/audio decoder.

    Deterministic byte-histogram projection so tests have exact goldens.
    """
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] += byte
    return [float(x) for x in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Real plumbing: batches arrive as pandas DataFrames (Arrow transfer),
    output schema is fixed, and the kernel is vectorizable per batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            feats = content.map(lambda b: _fake_decode_features(b, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "byte_mean": content.map(
                        lambda b: 0.0 if not b else sum(b) / len(b)
                    ).astype("float64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emits every `every`-th frame as
    its own row. STUB frame split (fixed-size byte slices) standing in
    for a real demuxer; the explode-shaped mapInPandas contract is real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video" or row["content"] is None:
                    continue
                payload = row["content"]
                n = max(int(row["n_frames"] or 1), 1)
                size = max(len(payload) // n, 1)
                for f in range(0, n, every):
                    out_ids.append(row["media_id"])
                    out_idx.append(f)
                    out_bytes.append(payload[f * size : (f + 1) * size])
            yield pd.DataFrame(
                {"media_id": pd.Series(out_ids, dtype="int64"),
                 "frame_idx": pd.Series(out_idx, dtype="int64"),
                 "frame_bytes": out_bytes}
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)
