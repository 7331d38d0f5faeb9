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

from collections.abc import Callable, Iterator, Sequence

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


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decode: "Callable[[bytes], list[float]] | None" = None,
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Real plumbing: batches arrive as pandas DataFrames (Arrow transfer),
    output schema is fixed, and the kernel is vectorizable per batch.

    A deployment with a real codec injects it via ``decode``: a callable
    ``payload_bytes -> list[float]`` (length ``dim``), e.g. a PIL decode
    + embedding. The callable must be importable/picklable on executors.
    Default is the deterministic byte-histogram stub.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decode if decode is not None else (lambda b: _fake_decode_features(b, dim))
        for pdf in batches:
            content = pdf["content"]
            feats = content.map(lambda b: [0.0] * dim if b is None else dec(b))
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


def sample_frames(
    media: DataFrame,
    every: int = 4,
    demux: "Callable[[bytes, int], Sequence[bytes]] | None" = None,
) -> DataFrame:
    """Frame sampling for video payloads: emits every `every`-th frame as
    its own row.

    The kernel is batch-shaped: numpy repeat/offset arrays compute the
    whole explode (which input row each output frame belongs to, and its
    frame index) with no per-row Python loop — this is the template to
    copy when a real demuxer lands. The default frame split is the STUB
    fixed-size byte slicer; a deployment injects a real demuxer via
    ``demux``: a callable ``(payload_bytes, n_frames) -> sequence of
    frame byte-strings`` (e.g. ffmpeg keyframe extraction), called once
    per video payload. Must be picklable on executors.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        empty = pd.DataFrame(
            {
                "media_id": pd.Series([], dtype="int64"),
                "frame_idx": pd.Series([], dtype="int64"),
                "frame_bytes": pd.Series([], dtype=object),
            }
        )
        for pdf in batches:
            mask = (pdf["kind"] == "video").to_numpy() & pdf["content"].notna().to_numpy()
            if not mask.any():
                yield empty
                continue
            sub = pdf.loc[mask]
            payloads = sub["content"].to_numpy(dtype=object)
            n_rows = len(sub)
            n = np.maximum(sub["n_frames"].fillna(1).to_numpy(dtype=np.int64), 1)
            # explode shape: row i emits k[i] = ceil(n[i]/every) frames
            k = (n + every - 1) // every
            row_of = np.repeat(np.arange(n_rows), k)  # output frame -> input row
            local = np.arange(row_of.size) - np.repeat(np.cumsum(k) - k, k)
            frame_idx = local * every
            if demux is not None:
                frames = [demux(p, int(nf)) for p, nf in zip(payloads, n)]
                frame_bytes = [frames[r][f] for r, f in zip(row_of, frame_idx)]
            else:
                # STUB demux: fixed-size byte slices of the payload
                lengths = np.fromiter(
                    (len(b) for b in payloads), dtype=np.int64, count=n_rows
                )
                size = np.maximum(lengths // n, 1)
                starts = frame_idx * size[row_of]
                stops = starts + size[row_of]
                frame_bytes = [
                    payloads[r][s:e] for r, s, e in zip(row_of, starts, stops)
                ]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(
                        sub["media_id"].to_numpy(dtype=np.int64)[row_of], dtype="int64"
                    ),
                    "frame_idx": pd.Series(frame_idx, dtype="int64"),
                    "frame_bytes": frame_bytes,
                }
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)
