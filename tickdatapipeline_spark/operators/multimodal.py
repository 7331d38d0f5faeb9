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

import logging
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

logger = logging.getLogger(__name__)

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
        import numpy as np

        dec = decode
        for pdf in batches:
            content = pdf["content"]
            if dec is not None:
                feats = content.map(lambda b: [0.0] * dim if b is None else dec(b))
                n_bytes = content.map(lambda b: 0 if b is None else len(b)).astype("int64")
                byte_mean = content.map(
                    lambda b: 0.0 if not b else sum(b) / len(b)
                ).astype("float64")
            else:
                # vectorized stub decode: per-row numpy view of the
                # payload, dim strided slice-sums for the histogram and
                # one exact int64 sum for the mean — same integer
                # arithmetic as _fake_decode_features (sum of uint8
                # values in int64, then float), so outputs are
                # bit-identical to the per-byte Python loop it replaces
                n = len(content)
                n_bytes = np.zeros(n, dtype=np.int64)
                byte_mean = np.zeros(n, dtype=np.float64)
                feats_arr = np.zeros((n, dim), dtype=np.float64)
                for j, b in enumerate(content):
                    if not b:
                        continue
                    arr = np.frombuffer(b, dtype=np.uint8)
                    n_bytes[j] = arr.size
                    pad = (-arr.size) % dim
                    if pad:
                        arr = np.concatenate(
                            [arr, np.zeros(pad, dtype=np.uint8)])
                    sums = arr.reshape(-1, dim).sum(axis=0, dtype=np.int64)
                    feats_arr[j] = sums
                    byte_mean[j] = int(sums.sum()) / n_bytes[j]
                feats = list(feats_arr)
                n_bytes = pd.Series(n_bytes)
                byte_mean = pd.Series(byte_mean)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "byte_mean": byte_mean,
                    "features": feats,
                }
            )

    # project to the columns the kernel touches: mapInPandas is opaque
    # to Catalyst, so without this the scan ships (and reads) every
    # input column across the Arrow boundary
    return media.select("media_id", "kind", "content").mapInPandas(
        kernel, schema=FEATURE_SCHEMA)


def media_exact_duplicates(media: DataFrame) -> DataFrame:
    """Byte-exact media dedup: one row per distinct payload digest.

    `sha2(content, 256)` is computed map-side so only the 64-char hex
    digest is shuffled — the binary payload itself never crosses the
    exchange, which is what makes this viable when `content` is a
    multi-MB image/video blob at 100 TB. `dup_cnt >= 2` rows are the
    duplicate groups; `keep_id` (min media_id) is the canonical
    representative a prune pass keeps. Singleton groups are emitted too
    so the output doubles as a content-hash manifest.

    Reference has no media surface (north-star scope per BASELINE.json);
    text-side analogue: operators/dedup.py exact hash dedup.
    """
    return (
        media.where(F.col("content").isNotNull())
        .select("media_id", F.sha2(F.col("content"), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("dup_cnt"),
            F.min("media_id").alias("keep_id"),
        )
    )


def media_near_duplicates(
    media: DataFrame,
    threshold: float = 0.999,
    planes: int = 8,
    dim: int = 8,
    max_bucket_size: "int | None" = None,
) -> DataFrame:
    """Feature-space media near-dup: decode features (stub codec), LSH-
    bucket, verify exact cosine within buckets — swap a real decoder
    into ``extract_features`` and this becomes perceptual dedup
    unchanged.

    Feature vectors are MEAN-CENTERED before the signed-random-
    projection bucketing and the cosine: raw byte-histograms (and real
    image/audio embeddings) share one dominant direction, so uncentered
    SRP would hash everything into one bucket and uncentered cosine
    saturates near 1. Centering costs ONE 1-row aggregate broadcast —
    no extra corpus pass. The per-dim means are exact-integer double
    sums (< 2^53), so the centered values are bit-identical cross-
    engine and the pair set is oracle-gated exactly.

    Scale: cost is sum of per-bucket n^2, not global n^2 — which means
    ``planes`` MUST grow with the corpus: 2^planes is the bucket count,
    so size planes ~ log2(n_media / target_bucket_size) (8 planes = 256
    buckets saturates around 10^5 items and goes quadratic — measured:
    35x wall at 10x corpus in the exhaustive gated config, vs 16 planes
    + the cap staying linear, PERF.md round 8). Pass ``max_bucket_size``
    (as `embedding_near_duplicates` does) to arm the degenerate-bucket
    skew guard in deployment. Output: (media_a, media_b, cosine) with
    media_a < media_b.
    """
    from tickdatapipeline_spark.functions.rounding import rnd
    from tickdatapipeline_spark.operators.globalorder import pin
    from tickdatapipeline_spark.operators.similarity import _dot, _norm, lsh_bucket

    # pinned (r15): the means subquery below AND the main plan both
    # consume `feats`, and without the pin the mapInPandas decode — the
    # dominant per-row cost once a real codec is injected — executed
    # TWICE per query (measured: two ~0.5 s 1-task decode stages per
    # pass at sf0.1). The pinned frame is the NARROW (media_id,
    # features) proxy, never the payload bytes (guide §8/§2.4).
    feats = pin(
        extract_features(media, dim=dim)
        .where(F.col("n_bytes") > 0)
        .select("media_id", "features")
    )
    means = feats.agg(
        *[F.avg(F.get("features", d)).alias(f"m{d}") for d in range(dim)]
    )
    mean_arr = F.array(*[F.col(f"m{d}") for d in range(dim)])
    base = feats.join(F.broadcast(means)).select(
        "media_id",
        F.zip_with(F.col("features"), mean_arr, lambda x, m: x - m).alias("v"),
    )
    base = base.select(
        "media_id",
        "v",
        lsh_bucket(F.col("v"), planes=planes, dim=dim).alias("bucket"),
        _norm(F.col("v")).alias("nrm"),
    ).where(F.col("nrm") > 0.0)
    if max_bucket_size is not None:
        from tickdatapipeline_spark.functions.scale import cap_group_sizes
        from tickdatapipeline_spark.operators.globalorder import pin

        base = cap_group_sizes(
            pin(base), ["bucket"], max_bucket_size,
            "media_near_duplicates", "max_bucket_size", logger,
        )
    a, b = base.alias("a"), base.alias("b")
    cos = rnd(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


PHASH_SIDE = 8
PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)


def _fake_decode_matrix(payload: bytes, side: int = PHASH_SIDE) -> "list[list[int]]":
    """STUB decode: replace with a real decoder (grayscale resize to
    side x side for images, mel-bin x time-bin for audio).

    Deterministic byte binning so tests/oracles have exact goldens:
    cell (r, c) sums the payload bytes at offsets ≡ r*side + c
    (mod side²) — the 2-D reshape of `_fake_decode_features`' histogram.
    """
    cells = [0] * (side * side)
    if payload:
        for i, byte in enumerate(payload):
            cells[i % (side * side)] += byte
    return [cells[r * side:(r + 1) * side] for r in range(side)]


def perceptual_fingerprints(
    media: DataFrame,
    side: int = PHASH_SIDE,
    decode_matrix: "Callable[[bytes], list[list[int]]] | None" = None,
    passthrough: "tuple[str, ...]" = (),
    keep_empty: bool = False,
) -> DataFrame:
    """pHash-style perceptual fingerprint: decode to a side x side
    intensity matrix (STUB codec — inject a real grayscale-resize via
    ``decode_matrix`` and nothing else changes), 2-D transform, keep
    the signs of the non-DC coefficients against their median as a
    64-bit key. Two fingerprints within a few bits of Hamming distance
    are perceptual near-dups even when their bytes differ (re-encode,
    crop, brightness shift) — the media analogue of simhash.

    The transform is the WALSH-HADAMARD transform (entries ±1), not the
    classic DCT: WHT coefficients of an integer matrix are exact
    BIGINTs, so the fingerprint is bit-reproducible cross-engine and
    the query is oracle-gateable (a DCT's cosines are transcendental —
    the measured cross-engine hard-NO). WHT is the standard fixed-point
    stand-in in the pHash family (Nilsimsa/blockhash lineage); it
    captures the same low-vs-high spatial frequency structure. A
    deployment wanting the classic DCT swaps this kernel and the query
    drops to rows-only gating, exactly like a real codec would.

    Bit i-1 (i = 1..side²-1, row-major coefficient order, DC excluded)
    is set iff coefficient i exceeds the exact MEDIAN of the side²-1
    non-DC coefficients (odd count — 63 for side 8 — so the median is
    the unique 32nd order statistic: integer-exact, no averaging).
    Output: (media_id, kind, phash BIGINT in [0, 2^63)), plus any
    ``passthrough`` input columns copied through the kernel unchanged —
    streaming callers pass their event-time column so the watermark
    survives the Arrow hop.

    Empty/null payloads are FILTERED by default (no bytes, no
    fingerprint — the batch queries' oracle contract). Pass
    ``keep_empty=True`` to fingerprint them as phash 0 instead (the
    zero matrix's fingerprint; note a perfectly FLAT payload also
    hashes to 0 — perceptually, "no content" and "solid color" are the
    same thing, and byte-exact identity is `media_exact_duplicates`'
    job). Streaming dedup passes this so no-content arrivals are
    deduped against each other rather than silently vanishing from the
    sink; an injected ``decode_matrix`` must then accept empty/None.
    """
    n_cells = side * side
    schema = StructType(PHASH_SCHEMA.fields + [media.schema[c] for c in passthrough])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if decode_matrix is not None:
            dec = decode_matrix
        else:
            # vectorized stub decode: n_cells strided int64 slice-sums
            # over a numpy view — bit-identical to _fake_decode_matrix's
            # per-byte loop (exact integer sums of uint8 values)
            def dec(b, _nc=n_cells, _side=side):
                if not b:
                    return np.zeros((_side, _side), dtype=np.int64)
                arr = np.frombuffer(b, dtype=np.uint8)
                pad = (-arr.size) % _nc
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
                return arr.reshape(-1, _nc).sum(
                    axis=0, dtype=np.int64).reshape(_side, _side)
        # H[i, j] = (-1)^popcount(i & j): the natural-order Hadamard
        H = np.array(
            [[-1 if bin(i & j).count("1") % 2 else 1 for j in range(side)]
             for i in range(side)],
            dtype=np.int64,
        )
        weights = np.left_shift(np.int64(1), np.arange(n_cells - 1, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                out = pd.DataFrame({
                    "media_id": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype=object),
                    "phash": pd.Series([], dtype="int64"),
                })
                for c in passthrough:
                    out[c] = pdf[c]
                yield out
                continue
            mats = np.stack([
                np.asarray(dec(b), dtype=np.int64)
                for b in pdf["content"]
            ])
            coef = np.matmul(np.matmul(H, mats), H).reshape(len(pdf), n_cells)
            flat = coef[:, 1:]  # drop the DC term (the total sum)
            med = np.sort(flat, axis=1)[:, (n_cells - 2) // 2]
            phash = ((flat > med[:, None]) * weights).sum(axis=1)
            out = pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "phash": pd.Series(phash, dtype="int64"),
            })
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            yield out

    if not keep_empty:
        media = media.where(
            F.col("content").isNotNull() & (F.length("content") > 0)
        )
    return media.mapInPandas(kernel, schema=schema)


def phash_near_duplicates(
    fingerprints: DataFrame, max_hamming: int = 8, n_bands: int = 9,
    bits: int = 63,
    max_band_bucket: "int | None" = None,
) -> DataFrame:
    """Perceptual near-dup pairs over `perceptual_fingerprints` output:
    media whose phash differs in at most ``max_hamming`` bits, found by
    the same band pigeonhole as `dedup.simhash_near_dup_pairs` — with
    max_hamming <= n_bands - 1, any qualifying pair shares at least one
    intact band, so the band-key equi-join has NO recall loss. 63 bits
    split into 9 bands of 7; verification is one bit_count per
    candidate. Output: (media_a, media_b, hamming), media_a < media_b.

    ``max_band_bucket`` is the corpus-scale skew guard (same contract
    as dedup.lsh_candidate_pairs): a 7-bit band holds only 128 distinct
    values, so a real corpus saturates every value and a degenerate one
    (e.g. near-constant payloads hashing to phash 0) can put millions
    of media into one (band, value) bucket = a quadratic join task.
    Capped buckets are dropped before the self-join — a recall trade
    the other 8 bands largely repay; the default stays None because the
    oracle-gated entry is the exhaustive contract at tiny sf.

    The no-recall-loss pigeonhole holds only for max_hamming <=
    n_bands - 1, so intermediate thresholds are rejected; max_hamming
    = bits is explicitly allowed as the CANDIDATE-CENSUS mode (no
    distance filter — every banded candidate with its exact Hamming,
    the calibration-histogram input).
    """
    assert bits % n_bands == 0 and (
        max_hamming <= n_bands - 1 or max_hamming >= bits
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    width = bits // n_bands
    fp = pin(fingerprints.select("media_id", "phash"))
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("phash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    bands = fp.select("media_id", "phash", F.explode(band_structs).alias("r")).select(
        "media_id", "phash",
        F.col("r.band").alias("band"), F.col("r.band_key").alias("band_key"),
    )
    if max_band_bucket is not None:
        from tickdatapipeline_spark.functions.scale import cap_group_sizes

        bands = cap_group_sizes(
            pin(bands), ["band", "band_key"], max_band_bucket,
            "phash_near_duplicates", "max_band_bucket", logger,
        )
    return (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("media_a"),
            F.col("r.media_id").alias("media_b"),
            F.bit_count(F.col("l.phash").bitwiseXOR(F.col("r.phash")))
            .cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


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
