"""Similarity search over the `embeddings` table (array<float> column).

- brute-force cosine top-k: the correctness baseline. Query set x full
  scan; at scale the query side is broadcast and the scan stays
  partition-parallel with a per-partition top-k (window rank) — no
  quadratic shuffle.
- LSH bucketing (random signed hyperplanes): the scale path — bucket id
  is computed per row (narrow), candidate search joins only within
  buckets. Hyperplane weights are small deterministic integers so the
  DuckDB oracle reproduces dot products exactly.

All vector math uses Catalyst higher-order functions on doubles
(float->double widening is exact); no UDFs in the hot path.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickdatapipeline_spark.functions.rounding import rnd

logger = logging.getLogger(__name__)

LSH_PLANES = 8
DIM = 64

# Deployment default for the near-dup bucket skew guard: caps the worst
# LSH bucket's self-join at ~500K pairs. Pass None explicitly for
# exhaustive (oracle-compared / small-corpus) output.
DEFAULT_MAX_BUCKET_SIZE = 1000


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left fold — same accumulation order as the oracle's
    list_reduce, so results are bit-identical."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _cos_sim(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard: a zero vector has no
    direction, so its cosine is NULL (nullif'd denominator) instead of
    an ANSI division-by-zero crash — the degenerate-corpus contract
    (scripts_dev/degenerate_sweep.py; a 100 TB corpus WILL contain a
    zero embedding eventually). NULL scores sort last in the rank
    windows (both engines default NULLS LAST for DESC), so zero
    vectors never rank; real fixtures have no zero vectors, so gated
    oracle results are unchanged."""
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def _brute_topk(base: DataFrame, k: int, query_mod: int,
                queries: "DataFrame | None" = None) -> DataFrame:
    """Brute-force cosine top-k over a (vec_id, v) frame: query vectors
    are vec_id % query_mod == 0, self excluded. Shared by cosine_topk
    (raw vectors) and ann_topk_sq8 (dequantized vectors). Pass
    ``queries`` (query_id, q) to score a DIFFERENT query
    representation against ``base`` — the asymmetric-distance hook
    (ann_topk_pq_adc: raw queries vs the reconstructed corpus)."""
    if queries is None:
        queries = base.where(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("q")
        )
    # scale contract: the QUERY side must be small (a probe set, not the
    # corpus) — broadcast is then the right plan at any corpus size. A
    # corpus-sized query side is all-pairs similarity, which is what the
    # LSH/IVF variants and embedding_near_duplicates exist for.
    # fan_out: a single-file corpus arrives as ONE partition and the
    # scoring (|corpus| x |queries| cosine folds) is per-row compute —
    # spread it; no-op at scale / on composed inputs (see fan_out)
    from tickdatapipeline_spark.functions.scale import fan_out

    joined = fan_out(base).join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    cos = rnd(_cos_sim(F.col("q"), F.col("v")), 6)
    scored = joined.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk(emb: DataFrame, k: int = 5, query_mod: int = 50) -> DataFrame:
    """Brute-force cosine top-k for query vectors (vec_id % query_mod == 0)
    against the full table (self excluded).

    Output: (query_id, neighbor_id, rank, cosine) — cosine rounded to 6
    so cross-engine ordering is on identical values.
    """
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    return _brute_topk(base, k, query_mod)


def sq8_dequantized(emb: DataFrame, levels: int = 255,
                    bounds: "tuple[list, list] | None" = None) -> DataFrame:
    """Scalar 8-bit quantization (SQ8): per-dimension corpus [min, max]
    bounds split into ``levels`` uniform steps; each component is stored
    as the nearest level code and reconstructed as
    min_d + code * (max_d - min_d) / levels.

    This is the memory-compression scale path for vector search: codes
    are 1 byte/dim vs 4-8 for floats, so a corpus 4-8x too big for
    executor memory fits after quantization, at a small recall cost
    (measurable with ann_recall). Returns (vec_id, v) with v the
    DEQUANTIZED double vector — drop-in for any scorer.

    Cross-engine exactness: bounds are min/max (order-independent), the
    quantize/dequantize chain is fixed-order IEEE double arithmetic +
    floor, so DuckDB reproduces every reconstructed component bit-for-
    bit. Scale: ONE map-side-combinable aggregate produces the 2xDIM
    bounds row, broadcast back over the corpus; quantization itself is
    map-side per-row arithmetic.

    A constant dimension (max == min) carries zero information and
    reconstructs as that constant.

    ``bounds``: optional precomputed ([min]*DIM, [max]*DIM) lists — the
    deployment artifact (computed once per corpus build, like the IVF
    ``centroids`` injection) so repeated queries skip the per-call
    bounds aggregate; default None computes them from ``emb``.
    """
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    # bounds cover exactly DIM components, so a wider/narrower vector
    # would silently dequantize its tail to NULL — fail loudly instead
    # (per-row integer compare, costs nothing; assert_true returns NULL
    # when the bound holds, so the filter keeps every row)
    base = base.where(
        F.assert_true(
            F.size("v") == DIM,
            F.lit(f"sq8_dequantized: embedding length != DIM={DIM}"),
        ).isNull()
    )
    if bounds is not None:
        mn_list, mx_list = bounds
        if len(mn_list) != DIM or len(mx_list) != DIM:
            raise ValueError(f"bounds must be two length-{DIM} lists")
        if any(float(lo) > float(hi) for lo, hi in zip(mn_list, mx_list)):
            raise ValueError("bounds must satisfy mn[i] <= mx[i] per dimension")
        bounds_df = emb.sparkSession.createDataFrame(
            [(list(map(float, mn_list)), list(map(float, mx_list)))],
            "mn array<double>, mx array<double>",
        )
    else:
        bounds_df = base.agg(
            F.array(*[F.min(F.get("v", d)) for d in range(DIM)]).alias("mn"),
            F.array(*[F.max(F.get("v", d)) for d in range(DIM)]).alias("mx"),
        )
    lv = float(levels)

    def deq(x, i):
        lo, hi = F.get(F.col("mn"), i), F.get(F.col("mx"), i)
        # clamp to the storable code range: with self-computed bounds
        # this is a no-op, but against a frozen deployment artifact a
        # new out-of-range component must SATURATE (as a real uint8
        # store would), not reconstruct near-identically
        code = F.least(
            F.greatest(
                F.floor((x - lo) * F.lit(lv) / (hi - lo) + F.lit(0.5)), F.lit(0)
            ),
            F.lit(int(levels)),
        )
        return F.when(hi > lo, lo + code * (hi - lo) / F.lit(lv)).otherwise(lo)

    return base.crossJoin(F.broadcast(bounds_df)).select(
        "vec_id", F.transform("v", deq).alias("v")
    )


def ann_topk_sq8(emb: DataFrame, k: int = 5, query_mod: int = 50,
                 levels: int = 255) -> DataFrame:
    """Cosine top-k over SQ8-quantized vectors: same output contract as
    cosine_topk, scored against the dequantized reconstruction — the
    "search the compressed corpus" path (recall < 1 by quantization
    error only; gauge it with ann_recall vs cosine_topk)."""
    return _brute_topk(sq8_dequantized(emb, levels), k, query_mod)


# Codebook shape, re-sized in r13 from the measured sf0.1 recall grid
# (scripts_dev/rerank_sweep.py + PERF.md r13): the original 4x8 shape
# (3-bit codes over 16-dim subspaces) capped rerank-50 recall@5 at
# 0.140 REGARDLESS of training — 16 dims per 8-entry codebook is
# unrecoverable quantization error at DIM=64. 16 subspaces x 32 codes
# (5-bit codes over 4-dim subspaces, 80 bits/vector = 25x compression)
# measured 0.56 untrained / 0.735 trained.
PQ_M = 16  # subspaces (DIM/PQ_M dims each)
PQ_K = 32  # codes per subspace codebook
PQ_ITERS = 4  # Lloyd iterations for the per-subspace codebook training

# Quantizer training runs on a bounded deterministic sample above this
# size (r13 verdict #1): Lloyd's assignment cost is O(corpus) PER
# ITERATION, so unbounded training turns every compaction retrain into
# 4+ full passes at 10^9 vectors. The sample is vec_id % sample_mod == 0
# with sample_mod = max(1, N // max(100*k, TRAIN_SAMPLE_TARGET)) — pure
# integer arithmetic on the corpus count, so the DuckDB oracle twins
# replay the identical predicate and the trained paths stay value-gated.
TRAIN_SAMPLE_TARGET = 100_000


def train_sample_mod(n_rows: int, k: int) -> int:
    """The shared deterministic training-sample modulus: keep every
    vec_id % mod == 0 row, sized so ~max(100*k, TRAIN_SAMPLE_TARGET)
    rows survive. 1 (no sampling) below the threshold — small corpora
    keep bit-identical full-corpus training."""
    return max(1, int(n_rows) // max(100 * int(k), TRAIN_SAMPLE_TARGET))


def _pq_sub(emb: DataFrame, n_sub: int, dim: int = DIM) -> DataFrame:
    """(vec_id, m, s): each vector exploded into its n_sub contiguous
    subvectors — the shared first stage of PQ training and encoding.
    ``dim`` defaults to the corpus DIM; the persisted-index ADC path
    passes the index's own dimensionality."""
    if dim % n_sub != 0:
        raise ValueError(f"n_sub must divide dim={dim}")
    sub_dim = dim // n_sub
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    base = base.where(
        F.assert_true(
            F.size("v") == dim,
            F.lit(f"pq_dequantized: embedding length != dim={dim}"),
        ).isNull()
    )
    subs = F.array(*[
        F.struct(
            F.lit(mm).cast("long").alias("m"),
            F.slice("v", mm * sub_dim + 1, sub_dim).alias("s"),
        )
        for mm in range(n_sub)
    ])
    return base.select("vec_id", F.explode(subs).alias("r")).select(
        "vec_id", F.col("r.m").alias("m"), F.col("r.s").alias("s")
    )


def _pq_d2(s: str, c: str) -> Column:
    """Rounded fixed-order squared L2 between subvector columns — the
    one distance every PQ stage (training assignment AND encoding
    argmin) uses, so both replay in DuckDB bit-for-bit."""
    return rnd(
        F.aggregate(
            F.zip_with(s, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_train(emb: DataFrame, n_sub: int = PQ_M, k_codes: int = PQ_K,
             iters: int = PQ_ITERS,
             sample_mod: "int | None" = None, dim: int = DIM) -> list:
    """Per-subspace Lloyd's k-means for PQ codebooks — kmeans_train's
    playbook applied to every subspace AT ONCE (one DataFrame job per
    iteration keyed on (m, code), not n_sub separate trainings).

    Training set: the deterministic sample vec_id % sample_mod == 0;
    ``sample_mod=None`` auto-sizes it with `train_sample_mod` (1 — the
    full corpus — below TRAIN_SAMPLE_TARGET rows, so small corpora
    train bit-identically to the unsampled r13 path). Bounding the
    training set keeps each Lloyd iteration O(sample) instead of
    O(corpus) — at 10^9 vectors an unsampled retrain inside
    compact_warehouse would cost 4+ full corpus passes.

    Init: the k_codes lowest vec_ids PRESENT in the training sample,
    codes numbered by rank (r13 verdict #2) — a shard whose ids start
    at 10^6 trains exactly like the same shard re-keyed from 0, where
    the former ``vec_id < k_codes`` predicate silently seeded nothing.
    Per iteration: broadcast-join the n_sub x k_codes codebook rows
    against the sampled exploded subvectors, assign each (vec_id, m)
    to its nearest code by the SAME rounded fixed-order L2^2 the
    encoder uses (ties to the lowest code), then update each (m, code)
    entry as the Q30 fixed-point integer mean of its assigned
    subvectors — deterministic AND partition-order-independent, so the
    whole training run (and therefore every PQ query) replays in
    DuckDB SQL and stays oracle-gated. Codes that attract no
    subvectors keep their previous entry (kmeans_train's empty-cell
    rule). An empty corpus returns an empty codebook.

    Scale: per iteration ONE broadcast join (n_sub x k_codes rows) +
    one groupBy((m, code), pos) fixed-point mean over the BOUNDED
    sample — n_sub x k_codes x sub_dim rows to the driver, nothing
    else leaves the executors.

    Returns [(m, code, [floats])] sorted by (m, code)."""
    spark = emb.sparkSession
    from pyspark.sql import Window

    sub = _pq_sub(emb, n_sub, dim=dim)
    if sample_mod is None:
        sample_mod = train_sample_mod(emb.count(), k_codes)
    if sample_mod > 1:
        sub = sub.where(F.col("vec_id") % sample_mod == 0)
    seed_ids = [int(r[0]) for r in
                sub.select("vec_id").distinct()
                .orderBy("vec_id").limit(k_codes).collect()]
    id2code = {vid: i for i, vid in enumerate(seed_ids)}
    cents = sorted(
        ((int(r["m"]), id2code[int(r["vec_id"])]),
         [float(x) for x in r["s"]])
        for r in sub.where(F.col("vec_id").isin(seed_ids)).collect()
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "code")
    for _ in range(iters):
        if not cents:
            break
        cb = spark.createDataFrame(
            [(m, code, c) for (m, code), c in cents],
            "m long, code long, c array<double>")
        assigned = (
            sub.join(F.broadcast(cb), on="m")
            .select("vec_id", "m", "code", "s", _pq_d2("s", "c").alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
        )
        rows = (
            assigned.select("m", "code", F.posexplode("s").alias("pos", "x"))
            .withColumn("xq", F.floor(F.col("x") * KMEANS_Q + F.lit(0.5)).cast("long"))
            .groupBy("m", "code", "pos")
            .agg(F.sum("xq").alias("sq"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        by_code: dict = {}
        for r in rows:
            by_code.setdefault((int(r["m"]), int(r["code"])), {})[
                int(r["pos"])] = (float(r["sq"]) / float(r["cnt"])) / KMEANS_Q
        cents = [
            (key, [by_code[key][i] for i in range(len(old))]
             if key in by_code else old)
            for key, old in cents  # empty codes keep their old entry
        ]
    return [(m, code, c) for (m, code), c in cents]


def pq_dequantized(emb: DataFrame, n_sub: int = PQ_M,
                   k_codes: int = PQ_K,
                   codebooks: "list | None" = None,
                   train_iters: int = PQ_ITERS,
                   train_sample_mod: "int | None" = None) -> DataFrame:
    """Product quantization (PQ): each vector splits into ``n_sub``
    contiguous subvectors; each subvector is replaced by its nearest
    entry (L2, ties to the lowest code) from that subspace's
    ``k_codes``-entry codebook. Storage per vector is n_sub small codes
    (here 16 x 5 bits = 10 bytes) against SQ8's DIM bytes — the
    memory-compression step beyond scalar quantization, at
    k_codes^n_sub effective centroids for k_codes * n_sub stored
    subvectors.

    Codebooks are TRAINED by default: per-subspace Lloyd's k-means
    (`pq_train`, ``train_iters`` iterations) over the deterministic
    ``train_sample_mod`` sample (auto-sized when None; full corpus
    below TRAIN_SAMPLE_TARGET), seeded from the k_codes lowest vec_ids
    present — the same default-trained/seed-demoted convention the
    delta loop's coarse quantizer adopted in r12. Pass
    ``codebooks`` = [(m, code, [floats])] to inject a precomputed
    codebook, or ``train_iters=0`` for the legacy seeded stand-in.
    Training is deterministic and order-independent (rounded
    assignment distances, Q30 fixed-point means), so the trained path
    stays oracle-reproducible in DuckDB.

    Cross-engine exactness: squared distances fold left in dimension
    order (the shared _dot/list_reduce convention) and round before the
    argmin; reconstruction re-concatenates codebook entries in subspace
    order — every arithmetic step replays in DuckDB bit-for-bit.

    Scale: the codebook is n_sub x k_codes rows (broadcast); subvector
    explosion is map-side; the argmin window partitions by
    (vec_id, m) — n_sub rows per vector, never corpus-wide.

    Returns (vec_id, v) with v the reconstructed double vector —
    drop-in for any scorer, like sq8_dequantized.
    """
    from pyspark.sql import Window

    sub = _pq_sub(emb, n_sub)
    if codebooks is None and train_iters > 0:
        codebooks = pq_train(emb, n_sub, k_codes, iters=train_iters,
                             sample_mod=train_sample_mod)
    if codebooks is not None:
        cb = emb.sparkSession.createDataFrame(
            [(m, code, c) for m, code, c in codebooks],
            "m long, code long, c array<double>"
        ).select("code", "m", "c")
    else:
        cb = sub.where(F.col("vec_id") < k_codes).select(
            F.col("vec_id").alias("code"), "m", F.col("s").alias("c")
        )
    scored = sub.join(F.broadcast(cb), on="m").select(
        "vec_id", "m", "code", "c", _pq_d2("s", "c").alias("d2")
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "code")
    win = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return win.groupBy("vec_id").agg(
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct("m", "c"))), lambda r: r["c"]
            )
        ).alias("v")
    )


def pq_encode(emb: DataFrame, codebooks: list, n_sub: int,
              dim: int = DIM) -> DataFrame:
    """(vec_id, codes, rnorm): the compact per-vector PQ artifact the
    persisted-index ADC probe stores instead of scoring raw vectors —
    each vector's per-subspace nearest-code assignment (the SAME
    rounded fixed-order L2^2 argmin as pq_dequantized, ties to the
    lowest code) plus the norm of its RECONSTRUCTION (sqrt of the sum
    of its chosen codebook entries' squared norms — reconstruction is
    concatenation, so the identity is exact). With codes + rnorm, an
    ADC lookup table turns cosine(query, reconstruction) into n_sub
    map-gets and one divide per candidate pair, no vector read.

    Determinism: the rnorm sum folds over subspaces in m-order (sorted
    collect, like pq_dequantized's reconstruction), never over Spark's
    nondeterministic aggregation order.

    Scale: one broadcast of the n_sub x k_codes codebook, map-side
    explode, the (vec_id, m) argmin window — n_sub rows per vector."""
    from pyspark.sql import Window

    sub = _pq_sub(emb, n_sub, dim=dim)
    cb = emb.sparkSession.createDataFrame(
        [(m, code, c) for m, code, c in codebooks],
        "m long, code long, c array<double>")
    scored = sub.join(F.broadcast(cb), on="m").select(
        "vec_id", "m", "code", "c", _pq_d2("s", "c").alias("d2"))
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "code")
    win = (scored.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .withColumn("sq", F.aggregate(
               "c", F.lit(0.0), lambda acc, x: acc + x * x)))
    ordered = F.sort_array(F.collect_list(F.struct("m", "code", "sq")))
    return win.groupBy("vec_id").agg(
        F.transform(ordered, lambda r: r["code"]).alias("codes"),
        F.sqrt(F.aggregate(
            F.transform(ordered, lambda r: r["sq"]),
            F.lit(0.0), lambda acc, x: acc + x)).alias("rnorm"),
    )


def ann_topk_pq(emb: DataFrame, k: int = 5, query_mod: int = 50,
                n_sub: int = PQ_M, k_codes: int = PQ_K,
                train_iters: int = PQ_ITERS) -> DataFrame:
    """Cosine top-k over the PQ-reconstructed corpus (symmetric
    distance: queries score through their own reconstruction too —
    the conservative variant; ADC with raw queries is one select away),
    codebooks k-means-trained by default (pq_dequantized).
    Same output contract as cosine_topk; recall < 1 by quantization
    error only (gauge with ann_recall vs cosine_topk)."""
    return _brute_topk(
        pq_dequantized(emb, n_sub, k_codes, train_iters=train_iters),
        k, query_mod)


def ann_topk_pq_adc(emb: DataFrame, k: int = 5, query_mod: int = 50,
                    n_sub: int = PQ_M, k_codes: int = PQ_K,
                    train_iters: int = PQ_ITERS) -> DataFrame:
    """ADC (asymmetric distance) PQ search — the deployment scoring
    shape ann_topk_pq's docstring points at: RAW query vectors scored
    against the PQ-RECONSTRUCTED corpus, self excluded. Only the
    corpus side carries quantization error (queries are never
    quantized and cost no storage), so ADC recall dominates the
    symmetric variant at identical bits — gauge both with ann_recall.
    Same (query_id, neighbor_id, rank, cosine) contract; same
    trained-codebook default as ann_topk_pq.

    Scale: identical to ann_topk_pq plus one extra broadcast of the
    raw query set (a probe set by the _brute_topk contract)."""
    recon = pq_dequantized(emb, n_sub, k_codes, train_iters=train_iters)
    raw_q = emb.select(
        F.col("vec_id").cast("long").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"),
    ).where(F.col("query_id") % query_mod == 0)
    return _brute_topk(recon, k, query_mod, queries=raw_q)

def ann_rerank(cand: DataFrame, emb: DataFrame, k: int) -> DataFrame:
    """Exact re-rank — the second stage of production two-stage
    retrieval (FAISS's refine / IndexRefineFlat shape): take an
    approximate stage's top-R candidate pairs, re-score ONLY those
    pairs with the raw vectors, keep the exact-cosine top-k. Buys back
    most of the quantization recall at O(queries x R) exact work
    instead of a brute-force scan — the standard deployment shape for
    PQ/IVF-PQ, whose ADC scores order candidates well but rank the
    boundary wrong.

    ``cand``: (query_id, neighbor_id, ...) from any ann_topk_* at
    k = R > k. Output: the shared (query_id, neighbor_id, rank,
    cosine) contract, cosine now EXACT (rounded 6 like cosine_topk, so
    a rerank hit scores identically to the brute-force oracle's row).

    Scale: the candidate set is O(queries x R) — broadcast into two
    id-equi-joins against the corpus (the "fetch raw vectors by id"
    step a persisted index serves from its cell-partitioned parquet);
    no scan is corpus x queries."""
    from pyspark.sql import Window

    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    pairs = F.broadcast(cand.select("query_id", "neighbor_id"))
    scored = (
        pairs
        .join(base.select(F.col("vec_id").alias("query_id"),
                          F.col("v").alias("q")), "query_id")
        .join(base.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("v").alias("nv")), "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            rnd(_cos_sim(F.col("q"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plane_weight(p: int, d: int) -> int:
    """Deterministic small-integer hyperplane component in [-3, 3]."""
    return ((p * 64 + d) * 2654435761) % 7 - 3


def lsh_bucket(vec: Column, planes: int = LSH_PLANES, dim: int = DIM) -> Column:
    """Signed-random-projection bucket id: bit p = (w_p . x > 0)."""
    v = _as_double(vec)
    bucket = F.lit(0)
    for p in range(planes):
        w = F.array(*[F.lit(float(_plane_weight(p, d))) for d in range(dim)])
        dp = _dot(w, v)
        bucket = bucket + F.when(dp > 0.0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("long")


def ann_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, bucket) assignment plus usable for bucket-local ANN join."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        lsh_bucket(F.col("embedding")).alias("bucket"),
    )


def ann_bucket_histogram(emb: DataFrame) -> DataFrame:
    """Bucket occupancy histogram — the skew diagnostic you check before
    trusting bucket-local search at scale."""
    return (
        ann_buckets(emb)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


IVF_CELLS = 8
IVF_NPROBE = 2


KMEANS_Q = 2**30  # fixed-point scale for centroid means (|x| < 1, sums < 2^43)


def kmeans_train(emb: DataFrame, k: int = IVF_CELLS, iters: int = 4,
                 seeds: "list | None" = None,
                 sample_mod: "int | None" = None) -> list:
    """Distributed Lloyd's k-means for IVF coarse quantizers.

    Training set: the deterministic sample vec_id % sample_mod == 0;
    ``sample_mod=None`` auto-sizes it with `train_sample_mod` (1 — the
    full corpus — below TRAIN_SAMPLE_TARGET rows). Each Lloyd
    iteration is then O(sample) instead of O(corpus), which is what
    keeps compact_warehouse's scheduled retrain affordable as the
    corpus grows 100x (r13 verdict #1).

    Per iteration: ONE broadcast join (k centroid rows against the
    sampled vectors) for assignment, one groupBy(cell, dim) mean for
    the update — k x DIM rows collected to the driver, nothing else
    leaves the executors. Deterministic AND order-independent: init =
    the k lowest vec_ids PRESENT in the sample, cells numbered by rank
    (identical to the former vec_id < k init on a dense-from-0 corpus,
    but a shard whose lowest id is above k now seeds correctly);
    assignment sims are rounded (rnd) with ties broken by cell id; the
    centroid mean is a Q30 fixed-point integer SUM (exact whatever the
    partition order, like the FIR Q33 accumulators) divided once in
    doubles — so the whole training run is reproducible in DuckDB SQL
    and the k-means IVF query is oracle-gated. Returns
    [(cell, [centroid floats])].

    ``seeds``: optional [(cell, [floats])] init centroids (e.g. the
    delta loop's explicit bootstrap seeds); cells must be numbered
    0..len-1. Default None uses the rank-based init above."""
    spark = emb.sparkSession
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    if sample_mod is None:
        sample_mod = train_sample_mod(emb.count(), k)
    if sample_mod > 1:
        base = base.where(F.col("vec_id") % sample_mod == 0)
    if seeds is not None:
        cents = [(int(cell), list(map(float, c))) for cell, c in seeds]
        if [c for c, _ in cents] != list(range(len(cents))):
            raise ValueError("seeds cells must be numbered 0..len-1")
    else:
        cents = [
            (i, list(r["v"])) for i, r in enumerate(
                base.orderBy("vec_id").limit(k).collect())
        ]
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, "cell long, c array<double>")
        assigned = (
            base.join(F.broadcast(cdf))
            .select(
                "vec_id", "v", "cell",
                rnd(_cos_sim(F.col("v"), F.col("c"))).alias("sim"),
            )
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
        )
        rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .withColumn("xq", F.floor(F.col("x") * KMEANS_Q + F.lit(0.5)).cast("long"))
            .groupBy("cell", "pos")
            .agg(F.sum("xq").alias("sq"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = (
                float(r["sq"]) / float(r["cnt"])
            ) / KMEANS_Q
        cents = [
            (cell, [by_cell[cell][i] for i in range(len(old))] if cell in by_cell else old)
            for cell, old in cents  # empty cells keep their old centroid
        ]
    return cents


def ivf_assign(emb: DataFrame, n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE,
               centroids: "list | None" = None) -> DataFrame:
    """IVF coarse quantization: by default centroids are the vectors
    with vec_id < n_cells (deterministic, oracle-reproducible); pass
    ``centroids`` = [(cell, [floats])] (e.g. from kmeans_train) to use a
    trained quantizer broadcast the same way.

    Output: (vec_id, v, cell, probe_cells) where cell = argmax cosine
    against the centroids and probe_cells = the nprobe nearest cells
    (for the query side of the search).
    """
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(centroids, "cell long, c array<double>")
    else:
        cents = base.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("c")
        )
    scored = base.join(F.broadcast(cents)).select(
        "vec_id", "v", "cell",
        rnd(_cos_sim(F.col("v"), F.col("c"))).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    ranked = scored.withColumn("crank", F.row_number().over(w)).where(F.col("crank") <= nprobe)
    return (
        ranked.groupBy("vec_id")
        .agg(
            F.max_by("v", -F.col("crank")).alias("v"),  # any row carries v; crank 1 row wins
            F.max_by("cell", -F.col("crank")).alias("cell"),
            F.array_sort(F.collect_list("cell")).alias("probe_cells"),
        )
    )


def ann_topk_ivf(emb: DataFrame, k: int = 5, query_mod: int = 50,
                 n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE,
                 centroids: "list | None" = None) -> DataFrame:
    """IVF top-k: each query probes its nprobe nearest cells; neighbors
    are scored only within those cells. Same output contract as
    cosine_topk (recall < 1, cost ~ nprobe/n_cells of brute force)."""
    from pyspark.sql import Window

    assigned = ivf_assign(emb, n_cells, nprobe, centroids=centroids)
    queries = assigned.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"),
        F.explode("probe_cells").alias("probe_cell"),
    )
    cand = assigned.select("vec_id", "v", "cell")
    joined = cand.join(
        F.broadcast(queries),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = rnd(_cos_sim(F.col("q"), F.col("v")))
    # no dedup needed: each neighbor lives in exactly one cell, so a query
    # probing several cells still sees it at most once
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _exists_path(spark, path: str) -> bool:
    """Hadoop-FS existence check (the delta loop's `_exists` twin)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def _anchor_vectors_schema(assigned: DataFrame, shard_dir: str) -> None:
    """Land a zero-row schema-bearing parquet file under
    ``shard_dir``/cell=0 after a partitionBy('cell') vectors write.

    partitionBy with zero rows writes NO data files (only _SUCCESS), so
    an empty build/delta would leave ``{index}/vectors`` fileless and
    every later ``spark.read.parquet`` of it dies with
    UNABLE_TO_INFER_SCHEMA — which breaks the daily-delta replay
    contract: a crash between the bootstrap ``write_ann_index`` and the
    first ``append_ann_index`` leaves centroids (so replays skip the
    bootstrap) but an unreadable vectors table, and every replay fails
    the same way (tests/test_delta_loop.py pins the recovery). The text
    index avoids this with explicit-path shard writes
    (``dedup.write_corpus_index``); the vectors table needs cell-level
    partitionBy for probe pruning, so it gets this explicit anchor file
    instead — an empty (vec_id, v) parquet appended into ``cell=0``,
    matching the in-file schema of the partitioned writes (``cell`` is
    a directory, not a file column) and adding zero rows when the
    partition has real data."""
    assigned.select("vec_id", "v").limit(0).write.mode("append").parquet(
        f"{shard_dir}/cell=0")


def write_ann_index(emb: DataFrame, path: str, n_cells: int = IVF_CELLS,
                    centroids: "list | None" = None,
                    pq: bool = False,
                    pq_n_sub: "int | None" = None,
                    pq_k_codes: int = PQ_K,
                    pq_codebooks: "list | None" = None) -> None:
    """Materialize the IVF search index as parquet: the centroid table
    (``path``/centroids: cell, c) and the cell-assigned corpus
    (``path``/vectors: vec_id, cell, v) that
    ``ann_probe_against_index`` searches. The deployment artifact for
    ingest-time semantic lookups — computed once per corpus build (pass
    ``centroids`` from kmeans_train for a trained quantizer), NOT
    recomputed per micro-batch; the embedding analogue of
    ``dedup.write_corpus_index``.

    At 100 TB the vectors table is written cell-partitioned so a probe
    reads only its nprobe cells; partitionBy keeps that pruning
    available to the parquet scan.

    Shard-partitioned layout (r10, mirroring dedup.write_corpus_index):
    the base build owns ``vectors/shard=base``; daily deltas land as
    their own ``shard=<name>`` partitions via ``append_ann_index``.
    This full rebuild wipes every shard first — the compaction path
    when the quantizer needs retraining (appends assign against the
    FROZEN base centroids; FAISS's add-with-trained-quantizer shape).

    ``pq=True`` (r14) additionally trains per-subspace PQ codebooks on
    the corpus (`pq_train`, deterministically sampled) and stores the
    ADC artifacts beside the vectors: ``path``/pq_codebooks (m, code,
    c) and the cell-partitioned ``path``/pq_codes (vec_id, codes,
    rnorm from `pq_encode`) — what lets the live-ingest probe score
    cells through n_sub map-gets per pair (`ann_probe_against_index_adc`)
    instead of full cosine folds. ``pq_n_sub=None`` auto-picks
    gcd(dim, PQ_M); a pq=False rebuild WIPES any previous PQ tables
    (stale codebooks must never pair with new vectors). Appends encode
    against the FROZEN codebooks, mirroring the centroid contract."""
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(centroids, "cell long, c array<double>")
    else:
        cents = base.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("c")
        )
    # crash-consistency: stage BOTH tables under a sibling temp dir and
    # swap last (upsert_partitioned's staging pattern). Writing live
    # centroids before live vectors could leave retrained centroids
    # paired with stale cell assignments after a crash — probes would
    # then prune to wrong cells SILENTLY. With the swap, any crash
    # window leaves at most a missing directory, which fails loudly at
    # read time; a stale-centroids/new-vectors (or the reverse) pair is
    # never observable: vectors swap in first, centroids last, so the
    # worst interleaving is new-vectors + missing-centroids.
    spark = emb.sparkSession
    from tickdatapipeline_spark.operators.dedup import _wipe_path

    tmp = f"{path}__ann_staging"
    _wipe_path(spark, tmp)
    cents.write.mode("overwrite").parquet(f"{tmp}/centroids")
    assigned = ivf_assign(emb, n_cells, nprobe=1, centroids=centroids)
    assigned.select("vec_id", "cell", "v").write.mode("overwrite") \
        .partitionBy("cell").parquet(f"{tmp}/vectors/shard=base")
    _anchor_vectors_schema(assigned, f"{tmp}/vectors/shard=base")
    subdirs = ["vectors", "centroids"]
    if pq:
        if pq_codebooks is not None:
            # injected pre-trained codebooks (the delta loop's bootstrap
            # trains on the day's keepers while the base build is empty,
            # mirroring its ann_centroids contract)
            codebooks = sorted(
                (int(m), int(code), list(map(float, c)))
                for m, code, c in pq_codebooks)
            if codebooks:
                pq_n_sub = max(m for m, _, _ in codebooks) + 1
                dim = pq_n_sub * len(codebooks[0][2])
        else:
            head = emb.select(
                _as_double(F.col("embedding")).alias("v")).head()
            dim = len(head["v"]) if head is not None else DIM
            if pq_n_sub is None:
                pq_n_sub = math.gcd(dim, PQ_M)
            codebooks = pq_train(emb, pq_n_sub, pq_k_codes, dim=dim)
        if not codebooks:
            raise ValueError(
                "pq=True needs a non-empty codebook (train data or "
                "pq_codebooks) — persisting an empty pq_codebooks table "
                "would make every later append/probe fail")
        spark.createDataFrame(
            codebooks, "m long, code long, c array<double>"
        ).write.mode("overwrite").parquet(f"{tmp}/pq_codebooks")
        codes = pq_encode(emb, codebooks, pq_n_sub, dim=dim).join(
            assigned.select("vec_id", "cell"), "vec_id")
        codes.select("vec_id", "cell", "codes", "rnorm") \
            .write.mode("overwrite").partitionBy("cell") \
            .parquet(f"{tmp}/pq_codes/shard=base")
        codes.select("vec_id", "codes", "rnorm").limit(0).write \
            .mode("append").parquet(f"{tmp}/pq_codes/shard=base/cell=0")
        # swap order keeps centroids the LAST (commit) rename: an index
        # missing centroids fails loudly everywhere, so no partial-PQ
        # state is ever silently readable
        subdirs = ["vectors", "pq_codes", "pq_codebooks", "centroids"]
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration())
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(path))
    _wipe_path(spark, f"{path}/vectors")
    _wipe_path(spark, f"{path}/centroids")
    # a pq=False rebuild drops stale PQ artifacts: codebooks trained on
    # the previous corpus paired with new vectors would score garbage
    _wipe_path(spark, f"{path}/pq_codes")
    _wipe_path(spark, f"{path}/pq_codebooks")
    for sub in subdirs:  # vectors first, centroids last — see above
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(f"{tmp}/{sub}"),
                         jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")):
            raise IOError(
                f"staging swap of {tmp}/{sub} -> {path}/{sub} failed — "
                "index left without that table; re-run write_ann_index")
    _wipe_path(spark, tmp)


def append_ann_index(emb_shard: DataFrame, path: str, shard: str) -> None:
    """Idempotent incremental maintenance for the persisted IVF index:
    assign ONE new shard of embeddings to the EXISTING centroids (read
    off ``path``/centroids — the quantizer stays frozen, FAISS's
    trained-index add contract) and land them as that shard's
    ``vectors/shard=<shard>/cell=*`` partitions — the daily-delta shape
    the dedup index already runs (`dedup.append_corpus_index`): no
    corpus-side recompute, probes read the union of shards
    transparently (the discovered ``shard`` column rides along and is
    ignored by `ann_probe_against_index`).

    Replay-idempotent: the shard directory is wiped before the write,
    so a duplicated or failed-and-retried delta job leaves the index
    equivalent instead of doubling the shard's vectors. Because the
    centroids are frozen, an append-grown index is ROW-IDENTICAL to a
    full `write_ann_index` rebuild over the unioned corpus with the
    same centroids (pinned in tests) — cell balance can drift as the
    corpus distribution does, which is when the scheduled rebuild
    (retrain + rewrite) runs, exactly like `write_corpus_index`
    compaction.

    Scale: O(shard) work — one broadcast-centroid argmin pass over the
    shard plus a cell-partitioned write; never touches existing
    shards."""
    # validate FIRST, never as a bare assert (python -O strips asserts
    # and a '/'- or '='-smuggling name would overwrite foreign paths;
    # 'base' would clobber the base build)
    if not shard or shard == "base" or "/" in shard or "=" in shard:
        raise ValueError(
            f"invalid shard name {shard!r}: must be non-empty, not 'base', "
            "and contain no '/' or '='")
    spark = emb_shard.sparkSession
    # layout-version guard: an index persisted by the pre-shard
    # write_ann_index has vectors/cell=* directly (no shard level);
    # appending shard=<name> beside those dirs would leave leaf files
    # at conflicting depths and every later read of {path}/vectors
    # would fail partition discovery. Refuse with the migration story
    # instead of poisoning the index.
    jvm = spark._jvm
    vecs = jvm.org.apache.hadoop.fs.Path(f"{path}/vectors")
    fs = vecs.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(vecs):
        for status in fs.listStatus(vecs):
            if status.getPath().getName().startswith("cell="):
                raise ValueError(
                    f"{path}/vectors has the pre-shard layout (cell=* at "
                    "the top level); run write_ann_index once to rebuild "
                    "into the shard=base layout before appending deltas")
    cents = [(r.cell, list(r.c))
             for r in spark.read.parquet(f"{path}/centroids").collect()]
    cents.sort()  # deterministic argmin tie order, O(n_cells) driver rows
    from tickdatapipeline_spark.operators.dedup import _wipe_path

    _wipe_path(spark, f"{path}/vectors/shard={shard}")
    assigned = ivf_assign(emb_shard, n_cells=len(cents), nprobe=1, centroids=cents)
    assigned.select("vec_id", "cell", "v").write.mode("overwrite") \
        .partitionBy("cell").parquet(f"{path}/vectors/shard={shard}")
    _anchor_vectors_schema(assigned, f"{path}/vectors/shard={shard}")
    # PQ-enabled index (r14): encode the shard against the FROZEN
    # codebooks — the trained-index add contract, same as centroids —
    # so the ADC probe keeps seeing every shard. O(shard) work.
    cb_path = jvm.org.apache.hadoop.fs.Path(f"{path}/pq_codebooks")
    if fs.exists(cb_path):
        codebooks = sorted(
            (int(r["m"]), int(r["code"]), list(r["c"]))
            for r in spark.read.parquet(f"{path}/pq_codebooks").collect())
        n_sub = max(m for m, _, _ in codebooks) + 1
        dim = n_sub * len(codebooks[0][2])
        _wipe_path(spark, f"{path}/pq_codes/shard={shard}")
        codes = pq_encode(emb_shard, codebooks, n_sub, dim=dim).join(
            assigned.select("vec_id", "cell"), "vec_id")
        codes.select("vec_id", "cell", "codes", "rnorm") \
            .write.mode("overwrite").partitionBy("cell") \
            .parquet(f"{path}/pq_codes/shard={shard}")
        codes.select("vec_id", "codes", "rnorm").limit(0).write \
            .mode("append").parquet(f"{path}/pq_codes/shard={shard}/cell=0")


def ann_rebuild_due(spark, path: str, max_cell_factor: float = 4.0,
                    max_empty_frac: float = 0.5) -> dict:
    """Cell-balance diagnostics for a persisted IVF index + the
    scheduled-rebuild trigger the DEPLOYMENT.md lifecycle leaves to
    the operator: appends assign against FROZEN centroids, so as the
    corpus distribution drifts, cells skew — probe cost follows the
    probed cells' population, so a cell holding ``max_cell_factor``
    times its fair share (or most cells going empty) means the
    quantizer no longer fits the data and `write_ann_index` should
    retrain.

    Returns {"n_vectors", "n_cells", "n_occupied", "max_cell_frac",
    "empty_frac", "rebuild_due", "recommended_n_cells"}. An empty
    index reports rebuild_due False (nothing to rebalance).
    ``recommended_n_cells`` is the measured sqrt(N) sizing rule
    (PERF.md r13: probe cost ~ nprobe * N / n_cells; n_cells 8 -> 64
    at N=200K cut ingest 4x) as max(IVF_CELLS, isqrt(n_vectors)) —
    `delta_loop.compact_warehouse(n_cells=None)` retrains to exactly
    this, so the rebuild the flag demands also FIXES the sizing, not
    just the balance.

    Scale: one combinable count per (partition-column) cell over the
    vectors table plus an O(n_cells) centroid read — no vector data is
    deserialized (the aggregate touches only partition values)."""
    cents = spark.read.parquet(f"{path}/centroids").select("cell")
    n_cells = cents.count()
    sizes = {int(r["cell"]): int(r["n"]) for r in
             spark.read.parquet(f"{path}/vectors")
             .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_vec = sum(sizes.values())
    occupied = sum(1 for n in sizes.values() if n > 0)
    max_frac = (max(sizes.values()) / n_vec) if n_vec else 0.0
    empty_frac = 1.0 - (occupied / n_cells) if n_cells else 0.0
    due = bool(n_vec and n_cells and (
        max_frac > max_cell_factor / n_cells
        or empty_frac > max_empty_frac))
    return {
        "n_vectors": n_vec,
        "n_cells": n_cells,
        "n_occupied": occupied,
        "max_cell_frac": round(max_frac, 6),
        "empty_frac": round(empty_frac, 6),
        "rebuild_due": due,
        "recommended_n_cells": max(IVF_CELLS, math.isqrt(n_vec)),
    }


def ann_probe_against_index(probe_emb: DataFrame, centroids_df: DataFrame,
                            vectors_df: DataFrame, k: int = 5,
                            nprobe: int = IVF_NPROBE) -> DataFrame:
    """Top-k cosine neighbors for PROBE vectors against a corpus whose
    IVF index (see ``write_ann_index``) is precomputed: each probe
    ranks the broadcast centroids, searches only its nprobe nearest
    cells, and keeps the k best — the per-micro-batch core of the
    streaming semantic-lookup path, with NO corpus-side recomputation
    (the index tables come straight off parquet).

    Output: (query_id, neighbor_id, rank, cosine) — the shared ANN
    contract. A probe whose vec_id collides with a corpus vec_id is
    still scored (no self-exclusion: the sides are different corpora).

    Scale: centroids broadcast (n_cells rows); the probe side of a
    micro-batch is small, so its exploded (probe x nprobe) frame
    broadcasts into the cell-restricted join; with a cell-partitioned
    vectors table the scan prunes to the probed cells.
    """
    from pyspark.sql import Window

    q = probe_emb.select(
        F.col("vec_id").cast("long").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"),
    )
    csim = rnd(_cos_sim(F.col("q"), F.col("c")))
    wc = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    probes = (
        q.join(F.broadcast(centroids_df))
        .select("query_id", "q", "cell", csim.alias("sim"))
        .withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= nprobe)
        .select("query_id", "q", F.col("cell").alias("probe_cell"))
    )
    cos = rnd(_cos_sim(F.col("q"), F.col("v")))
    scored = vectors_df.join(
        F.broadcast(probes), F.col("cell") == F.col("probe_cell")
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


PROBE_ADC_RERANK = 50  # candidates per probe the exact verify re-scores
# (matches the committed rerank sweeps that justified R=50 for the
# adc_rerank panel: recall@5 0.905 at sf0.1 with R=50)


def ann_probe_against_index_adc(probe_emb: DataFrame,
                                centroids_df: DataFrame,
                                codes_df: DataFrame,
                                codebooks_df: DataFrame,
                                vectors_df: DataFrame, k: int = 5,
                                nprobe: int = IVF_NPROBE,
                                rerank: int = PROBE_ADC_RERANK) -> DataFrame:
    """`ann_probe_against_index` with ADC candidate scoring (r13
    verdict #4): instead of an exact 64-dim cosine fold against EVERY
    vector in the probed cells, each probe builds a lookup table of
    subvector dot products against the broadcast PQ codebook (n_sub x
    k_codes entries), scores cell members through their stored codes —
    n_sub map-gets + one divide per pair, the classic ADC shape — keeps
    the ``rerank`` best candidates, and exact-verifies ONLY those
    against the raw vectors. Output contract and exactness of the
    RETURNED cosines match ann_probe_against_index (the verify stage is
    the same rounded exact fold); what ADC changes is WHICH candidates
    reach the verify — a true neighbor ranked below ``rerank`` by its
    reconstruction cosine is missed, the same approximation contract as
    the gated adc_rerank panel.

    ``codes_df``: (vec_id, cell, codes, rnorm) from `pq_encode` (the
    index's ``pq_codes`` table); ``codebooks_df``: (m, code, c) (its
    ``pq_codebooks`` table). The codebook is collected driver-side
    (n_sub x k_codes rows — broadcast-scale by construction).

    Scale: per micro-batch, the LUT build is O(probes x n_sub x
    k_codes) map-side work; candidate scoring reads the cell-pruned
    CODES table (n_sub bytes-scale per vector instead of dim doubles);
    the exact verify touches O(probes x rerank) vectors by id."""
    from pyspark.sql import Window

    cb_rows = [(int(r["m"]), int(r["code"]), list(r["c"]))
               for r in codebooks_df.collect()]
    if not cb_rows:
        raise ValueError("empty pq_codebooks — rebuild the index with "
                         "pq=True before using the ADC probe")
    n_sub = max(m for m, _, _ in cb_rows) + 1
    k_codes = max(c for _, c, _ in cb_rows) + 1
    dim = n_sub * len(cb_rows[0][2])

    q = probe_emb.select(
        F.col("vec_id").cast("long").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"),
    )
    csim = rnd(_cos_sim(F.col("q"), F.col("c")))
    wc = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    probes = (
        q.join(F.broadcast(centroids_df))
        .select("query_id", "q", "cell", csim.alias("sim"))
        .withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= nprobe)
        .select("query_id", "q", F.col("cell").alias("probe_cell"))
    )
    # per-probe ADC lookup table: position m*k_codes+code -> dot(q_m,
    # c), stored as ONE FLAT ARRAY ordered by that position (built off
    # the probe's subvectors x the broadcast codebook). An array beats
    # a map here (measured r14: the map variant lost to the exact fold
    # at every dim): the member-side get is a direct unsafe-array
    # offset instead of a hash probe, and transform-with-index replaces
    # the per-candidate-row sequence()+zip_with allocation. Positions
    # are argmin codes of the SAME codebook, so every get is in-bounds
    # by construction — ANSI element_at stays strict and loud.
    qsub = _pq_sub(
        q.select(F.col("query_id").alias("vec_id"),
                 F.col("q").alias("embedding")), n_sub, dim=dim)
    cb = probe_emb.sparkSession.createDataFrame(
        cb_rows, "m long, code long, c array<double>")
    lut = (
        qsub.join(F.broadcast(cb), on="m")
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("m") * k_codes + F.col("code")).cast("long").alias("idx"),
            _dot(F.col("s"), F.col("c")).alias("val"))
        .groupBy("query_id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("idx", "val"))),
            lambda r: r["val"]).alias("lut"))
    )
    qn = q.select("query_id", _norm(F.col("q")).alias("qnorm"))
    probes2 = (probes.drop("q").join(lut, "query_id").join(qn, "query_id"))
    # fold order is m-ascending (transform preserves codes order), the
    # same addition sequence as the previous map formulation
    adc_dot = F.aggregate(
        F.transform(
            "codes",
            lambda code, mi: F.element_at(
                F.col("lut"),
                (mi.cast("long") * k_codes + code + 1).cast("int"))),
        F.lit(0.0), lambda acc, x: acc + x)
    cand = (
        codes_df.join(F.broadcast(probes2),
                      F.col("cell") == F.col("probe_cell"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                rnd(adc_dot / (F.col("qnorm") * F.col("rnorm")), 6)
                .alias("adc_cos"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id"))
    top = (cand.withColumn("arank", F.row_number().over(wa))
           .where(F.col("arank") <= rerank)
           .select("query_id", "neighbor_id"))
    # exact verify of candidates only — the id-equi-join "fetch raw
    # vectors" step, never a scan of the probed cells
    verified = (
        F.broadcast(top)
        .join(q, "query_id")
        .join(vectors_df.select(F.col("vec_id").alias("neighbor_id"),
                                F.col("v")), "neighbor_id")
        .select("query_id", "neighbor_id",
                rnd(_cos_sim(F.col("q"), F.col("v"))).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_duplicates(emb: DataFrame, threshold: float = 0.25,
                              max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """Embedding-cosine near-dup detection, LSH-bucketed (the scale path):
    only pairs sharing a signed-hyperplane bucket are scored, so cost is
    sum of per-bucket n^2 instead of global n^2. Output: (vec_a, vec_b,
    cosine) for cosine >= threshold, vec_a < vec_b.

    ``max_bucket_size`` is the skew guard for degenerate buckets (e.g.
    millions of near-identical embeddings all hashing together): buckets
    above the cap are dropped before the n^2 join. Deployment default is
    DEFAULT_MAX_BUCKET_SIZE; when the guard trips, the dropped
    bucket/row counts are computed eagerly off a pinned projection (one
    small job at plan-build time) and logged. Pass None explicitly for
    exhaustive output (the oracle-compared registry entries do) — that
    also skips the eager sizing job."""
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        lsh_bucket(F.col("embedding")).alias("bucket"),
    )
    if max_bucket_size is not None:
        # pin so the eager sizing job and both self-join sides reuse one
        # materialization instead of re-deriving the projection 3x
        from tickdatapipeline_spark.functions.scale import cap_group_sizes
        from tickdatapipeline_spark.operators.globalorder import pin

        base = cap_group_sizes(pin(base), ["bucket"], max_bucket_size,
                               "embedding_near_duplicates", "max_bucket_size",
                               logger)
    a, b = base.alias("a"), base.alias("b")
    cos = rnd(
        _cos_sim(F.col("a.v"), F.col("b.v")), 6
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


OUTLIER_Q = 1 << 20


def embedding_outliers(emb: DataFrame, top_n: int = 50, q: int = OUTLIER_Q) -> DataFrame:
    """Corpus-centroid outlier detection: the top_n vectors by squared
    distance from the corpus mean embedding — the "flag corrupt /
    out-of-distribution embeddings" sweep of corpus curation.

    Output: (vec_id, dist_q) ordered (dist_q desc, vec_id), dist_q in
    Q20^2 integer units.

    Exactness: vectors quantize to Q20 integers (floor(x*q + 0.5), the
    same scheme as the k-means Q30 sums); the centroid is per-dim
    integer sum DIV n — order-independent integer math end to end, so
    DuckDB reproduces every distance bit-for-bit (float sums would be
    partition-order dependent). 64 dims x (2^21)^2 < 2^48: no overflow.

    Scale: one posexplode groupBy(dim) -> DIM aggregate rows collapsed
    to a single broadcast array row; the distance is a map-side
    zip_with fold; top-N plans TakeOrderedAndProject (per-partition
    partial top-k), never a global sort.
    """
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(
            _as_double(F.col("embedding")),
            lambda x: F.floor(x * q + F.lit(0.5)).cast("long"),
        ).alias("vq"),
    )
    cent = (
        base.select(F.posexplode("vq").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
        # sign-safe truncation toward zero: integer-division semantics
        # for negative sums differ between engines; abs() removes the
        # ambiguity so the oracle matches on any corpus
        .select("pos", F.expr("CASE WHEN sx < 0 THEN -(ABS(sx) DIV n) ELSE sx DIV n END").alias("c"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cent")
        )
    )
    dist = F.aggregate(
        F.zip_with("vq", "cent", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        base.crossJoin(F.broadcast(cent))
        .select("vec_id", dist.alias("dist_q"))
        .orderBy(F.col("dist_q").desc(), "vec_id")
        .limit(top_n)
    )


PCA_Q = 1 << 20  # fixed-point scale for power-iteration vectors


def power_iteration_top_component(emb: DataFrame, iters: int = 3,
                                  q: int = PCA_Q) -> DataFrame:
    """Leading principal direction of the (uncentered) embedding Gram
    matrix by fixed-iteration power method — the 'what single axis
    explains this corpus' probe behind anisotropy checks and cheap
    1-D projections. Fixed ``iters`` (convergence is not asserted;
    determinism is). Precondition: the input must contain a vec_id == 0
    row (the deterministic seed, like the IVF stand-in centroids);
    raises in-plan otherwise — the SQL twin would silently return 0
    rows, so the Spark side fails loudly instead.

    Per iteration: s_i = <x_i, v> as exact BIGINT dots (Q20 x Q20 x DIM
    < 2^46), rescaled to Q20 by sign-safe truncating division (DIV vs
    floor-div differ on negatives; abs() removes the ambiguity), then
    y_d = sum_i s~_i * x_i[d] as BIGINT per-dim sums (< 2^55) — ALL
    cross-row accumulation is integer, hence partition-order
    independent, the same reproducibility scheme as the Q30 k-means.
    The iterate renormalizes to Q20 through identical IEEE double ops
    on identical integers, so DuckDB replays the whole run bit-for-bit
    (oracle twin unrolls the iterations as CTEs).

    ONE plan, not ``iters`` driver-orchestrated jobs (like the SQL
    twin's unrolled CTEs): each iteration's DIM aggregate rows fold
    back into a 1-row array frame via sort_array(collect_list(...))
    — a DIM-row final aggregate, never corpus-sized — whose
    normalization replays the driver loop's exact IEEE sequence
    (pos-ordered left fold of y_d^2, then (y_d / nrm) * q per entry);
    the next iteration broadcasts that derived frame. The seed and
    zero-norm degeneracy checks ride the plan as raise_error
    expressions the optimizer cannot prune (they gate the arrays every
    downstream expression consumes).

    Scale: per iteration ONE broadcast of the DIM-entry iterate frame,
    one map-side dot, one posexplode groupBy(dim) -> DIM aggregate rows
    (like kmeans_train's k x DIM): nothing corpus-sized ever reaches a
    single partition, and the whole run is one action / one explain()
    tree (the corpus scan still executes once per iteration — the
    iterate genuinely depends on the previous pass; pin ``emb``
    upstream to trade memory for re-scans).

    Output: (pos, component_q, component) — DIM rows, pos 0-based.
    """
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(
            _as_double(F.col("embedding")),
            lambda x: F.floor(x * q + F.lit(0.5)).cast("long"),
        ).alias("vq"),
    )
    vdf = (
        base.where(F.col("vec_id") == 0)
        .agg(F.first("vq").alias("v0"), F.count(F.lit(1)).alias("c"))
        .select(
            F.when(F.col("c") > 0, F.col("v0"))
            .otherwise(F.raise_error(F.lit(
                "power_iteration_top_component seeds from the vec_id == 0 "
                "row; the input frame has none (re-id or pass a frame "
                "containing it)"
            )))
            .alias("v")
        )
    )
    for _ in range(iters):
        s = base.crossJoin(F.broadcast(vdf)).select(
            "vq",
            F.aggregate(
                F.zip_with("vq", "v", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("s"),
        ).withColumn(
            "st",
            F.expr(f"CASE WHEN s < 0 THEN -(ABS(s) DIV {q}) ELSE s DIV {q} END"),
        )
        y = (
            s.select("st", F.posexplode("vq").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.sum(F.col("st") * F.col("x")).alias("y"))
            # DIM rows -> one pos-ordered array row (final aggregate over
            # DIM rows only; sort_array on (pos, y) structs restores the
            # deterministic dimension order collect_list lacks)
            .agg(F.sort_array(F.collect_list(F.struct("pos", "y"))).alias("ys"))
            .select(F.transform("ys", lambda r: r["y"]).alias("y"))
        )
        # left fold of y_d^2 in pos order — the driver loop's exact
        # accumulation sequence (and list_reduce's, on the oracle side)
        nrm = F.sqrt(
            F.aggregate(
                "y",
                F.lit(0.0),
                lambda acc, yd: acc + yd.cast("double") * yd.cast("double"),
            )
        )
        vdf = y.select(
            F.when(
                nrm == 0.0,
                F.raise_error(F.lit(
                    "power iteration degenerated to the zero vector "
                    "(all-zero corpus or a seed orthogonal to every vector)"
                )),
            )
            .otherwise(
                F.transform(
                    "y",
                    lambda yd: F.floor(
                        yd.cast("double") / nrm * q + F.lit(0.5)
                    ).cast("long"),
                )
            )
            .alias("v")
        )
    return vdf.select(F.posexplode("v").alias("pos", "component_q")).select(
        F.col("pos").cast("long").alias("pos"),
        "component_q",
        (F.col("component_q").cast("double") / q).alias("component"),
    )


def label_centroid_cosine(emb: DataFrame, q: int = OUTLIER_Q) -> DataFrame:
    """Pairwise cosine similarity between per-label centroid embeddings
    — the 'how close are these groups in embedding space' map behind
    cluster audits, source-similarity dashboards and label-collapse
    checks.

    Exactness: vectors quantize to Q20 integers; per-(label, dim)
    INTEGER sums are order-independent, and cosine is scale-invariant,
    so the un-normalized sum vector stands in for the centroid exactly
    (the 1/n factors cancel) — no float accumulation ever crosses rows.
    The final cosine folds the two identical integer-sum arrays in a
    fixed left-to-right order (the shared _dot policy) and rounds.

    Scale: ONE posexplode groupBy on (label, dim) — |labels| x DIM
    aggregate rows — collapsed back to per-label arrays; the pairwise
    stage is a broadcast self-join over |labels| rows (groups, not
    vectors: |labels|^2 pairs is dashboard-sized at any corpus scale).

    Output: (label_a, label_b, n_a, n_b, cosine), label_a < label_b.
    """
    base = emb.select(
        F.col("label").cast("long").alias("label"),
        F.transform(
            _as_double(F.col("embedding")),
            lambda x: F.floor(x * q + F.lit(0.5)).cast("long"),
        ).alias("vq"),
    )
    sums = (
        base.select("label", F.posexplode("vq").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sx"))),
                lambda s: s["sx"].cast("double"),
            ).alias("s"),
            F.max("n").alias("n"),
        )
    )
    a = sums.select(
        F.col("label").alias("label_a"), F.col("s").alias("sa"), F.col("n").alias("n_a")
    )
    b = sums.select(
        F.col("label").alias("label_b"), F.col("s").alias("sb"), F.col("n").alias("n_b")
    )
    cos = rnd(
        _cos_sim(F.col("sa"), F.col("sb")), 6
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", "n_a", "n_b", cos.alias("cosine"))
    )


def ann_topk_lsh(emb: DataFrame, k: int = 5, query_mod: int = 50) -> DataFrame:
    """Bucket-restricted cosine top-k: same contract as cosine_topk but
    only neighbors sharing the query's LSH bucket are scored (recall<1,
    cost ~ 1/2^planes of brute force)."""
    from pyspark.sql import Window

    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        lsh_bucket(F.col("embedding")).alias("bucket"),
    )
    queries = base.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("bucket").alias("qb")
    )
    joined = base.join(
        F.broadcast(queries), (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id"))
    )
    cos = rnd(_cos_sim(F.col("q"), F.col("v")), 6)
    scored = joined.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ann_recall(ann: DataFrame, exact: DataFrame) -> DataFrame:
    """Recall@k evaluation of an ANN result against the brute-force
    ground truth — the standard quality gauge when tuning
    nprobe/n_cells/planes before a corpus-scale run.

    Both inputs use the (query_id, neighbor_id, rank, cosine) contract
    of cosine_topk / ann_topk_*. Output, one row per query:
    (query_id, n_exact, n_hit, recall) with recall = n_hit/n_exact
    rounded to 6; queries the ANN missed entirely still appear with
    n_hit = 0.

    Scale: two count aggregates on (query_id[, neighbor_id]) plus one
    equi-join over the top-k rows — O(queries x k) rows end to end,
    independent of corpus size (the expensive part is the two input
    plans, shaped per their own contracts).
    """
    tot = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hit = (
        exact.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return tot.join(hit, on="query_id", how="left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        rnd(F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact").cast("double")).alias("recall"),
    )


def ann_topk_ivf_kmeans(emb: DataFrame, k: int = 5, query_mod: int = 50,
                        n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE,
                        iters: int = 4) -> DataFrame:
    """IVF top-k with a k-means-trained coarse quantizer (kmeans_train):
    the deployment-shaped ANN path — train once, broadcast k centroids,
    probe nprobe cells. Oracle-gated: training uses Q30 fixed-point
    centroid sums, so DuckDB reproduces it exactly (plans/beyond.py::
    ivf_kmeans_sql)."""
    return ann_topk_ivf(emb, k, query_mod, n_cells, nprobe,
                        centroids=kmeans_train(emb, n_cells, iters))


def semantic_dedup(emb: DataFrame, threshold: float = 0.25,
                   n_cells: int = IVF_CELLS,
                   centroids: "list | None" = None,
                   max_cell_size: int | None = DEFAULT_MAX_BUCKET_SIZE) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings with a coarse quantizer, score cosine pairs ONLY within
    each cluster, and inside every near-duplicate pair keep the vector
    FARTHER from its cluster centroid (the paper's keep-rule: the
    extreme point carries more information than the prototypical one).

    Per vector: cell = argmax centroid cosine (rounded, ties to the
    lower cell — identical to ivf_assign); a vector is DROPPED when
    some same-cell partner at cosine >= threshold sits farther from
    the centroid (centroid_sim strictly lower, ties broken toward the
    lower vec_id surviving). The rule is pair-local, so the survivor
    set is order-independent and SQL-expressible — unlike the greedy
    sequential scan of the reference implementation, which this
    replaces (documented deviation; same fixed point when near-dup
    groups are cliques).

    Output: (vec_id, cell, centroid_sim, kept) for every input vector.

    Scale: centroids broadcast (n_cells rows); the quadratic step is
    cluster-restricted — sum of per-cell n^2, the SemDeDup cost model —
    with ``max_cell_size`` the same logged skew guard the LSH buckets
    use (None = exhaustive, what the oracle entry passes). With
    n_cells ~ sqrt(N) (the paper's regime) cells stay executor-sized;
    the default stand-in centroids (vec_id < n_cells) swap for
    kmeans_train output via ``centroids`` exactly as in ivf_assign.
    """
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(centroids, "cell long, c array<double>")
    else:
        cents = base.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("c")
        )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    assigned = (
        base.join(F.broadcast(cents))
        .select(
            "vec_id", "v", "cell",
            rnd(_cos_sim(F.col("v"), F.col("c"))).alias("sim"),
        )
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "v", "cell", F.col("sim").alias("centroid_sim"))
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    # three consumers (both pair-join sides + the kept-flag output) —
    # pinned so the broadcast centroid scoring runs once, not three times
    assigned = pin(assigned)
    if max_cell_size is not None:
        from tickdatapipeline_spark.functions.scale import cap_group_sizes

        assigned = cap_group_sizes(assigned, ["cell"], max_cell_size,
                                   "semantic_dedup", "max_cell_size", logger)
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = rnd(
        _cos_sim(F.col("a.v"), F.col("b.v")), 6
    )
    # b loses to a when a is farther from the centroid (or equally far
    # with the lower id) — every dropped vector names a surviving-side
    # witness, so "dropped" is a plain EXISTS over scored pairs
    beaten = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.vec_id") != F.col("b.vec_id")))
        .where(cos >= threshold)
        .where(
            (F.col("a.centroid_sim") < F.col("b.centroid_sim"))
            | ((F.col("a.centroid_sim") == F.col("b.centroid_sim"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(beaten.withColumn("hit", F.lit(1)), "vec_id", "left")
        .select("vec_id", "cell", "centroid_sim",
                F.col("hit").isNull().alias("kept"))
    )


DIVERSITY_M = 10


def diversity_sample(emb: DataFrame, m: int = DIVERSITY_M,
                     n_cells: int = IVF_CELLS,
                     centroids: "list | None" = None) -> DataFrame:
    """Cluster-stratified diversity (coverage-first) sampling: assign
    every vector to its nearest coarse-quantizer cell, then keep the
    ``m`` vectors per cell FARTHEST from their centroid — the boundary
    points that a prototype-biased sample (or SemDeDup's keep-rule
    applied corpus-wide) would never surface. The per-cell peripheral
    pick is the bucketed, order-independent stand-in for greedy
    k-center selection: greedy's sequential argmax doesn't distribute,
    per-cell peripheral ranking does, and with n_cells ~ sqrt(N) every
    cell's ranking stays executor-sized.

    Selection rule is exact and SQL-expressible: cell = argmax rounded
    centroid cosine (ties to the lower cell, identical to ivf_assign /
    semantic_dedup); within a cell, rank by centroid_sim ASC
    (farthest first), ties to the lower vec_id.

    Output: (cell, sel_rank, vec_id, centroid_sim) for the selected
    vectors only.

    Scale: centroids broadcast; ONE exchange on cell for the rank
    window, whose rnk <= m filter plans as WindowGroupLimit
    (Partial+Final) — no cell's membership list crosses the shuffle
    whole."""
    from pyspark.sql import Window

    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(centroids, "cell long, c array<double>")
    else:
        cents = base.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("c")
        )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    assigned = (
        base.join(F.broadcast(cents))
        .select(
            "vec_id", "cell",
            rnd(_cos_sim(F.col("v"), F.col("c"))).alias("sim"),
        )
        .withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") == 1)
        .select("vec_id", "cell", F.col("sim").alias("centroid_sim"))
    )
    wsel = Window.partitionBy("cell").orderBy(F.col("centroid_sim").asc(), "vec_id")
    return (
        assigned.withColumn("sel_rank", F.row_number().over(wsel).cast("long"))
        .where(F.col("sel_rank") <= m)
        .select("cell", "sel_rank", "vec_id", "centroid_sim")
        .orderBy("cell", "sel_rank")
    )


def cosine_topk_truncated(emb: DataFrame, trunc_dim: int, k: int = 5,
                          query_mod: int = 50) -> DataFrame:
    """Matryoshka-style dimension ablation (Kusupati et al. 2022):
    brute-force cosine top-k using only the FIRST ``trunc_dim``
    components of every embedding — the evaluation behind shipping a
    prefix-truncated index (4x less storage and FLOPs at dim/4) and,
    composed with ann_recall against the full-dimension ground truth,
    the measured answer to "how many neighbors does the cheap prefix
    keep". Same (query_id, neighbor_id, rank, cosine) contract and
    broadcast-probe scale shape as cosine_topk."""
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.slice(_as_double(F.col("embedding")), 1, trunc_dim).alias("v"),
    )
    return _brute_topk(base, k, query_mod)


def ann_topk_ivfpq(emb: DataFrame, k: int = 5, query_mod: int = 50,
                   n_cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE,
                   n_sub: int = PQ_M, k_codes: int = PQ_K,
                   centroids: "list | None" = None,
                   train_iters: int = PQ_ITERS) -> DataFrame:
    """IVF-PQ — the production composite (the FAISS IVFPQ shape):
    coarse cells prune the search to nprobe cells per query, and the
    cell members are stored as product-quantized RESIDUALS
    (v - centroid[cell]) instead of raw vectors. Residual PQ beats
    vector PQ at equal bits because residuals concentrate near zero
    once the coarse step removes the cell mean — the memory story is
    n_sub codes/vector + one cell id, the recall story is gauged with
    ann_recall like every other path.

    Scoring is ADC (asymmetric distance): the RAW query against the
    reconstruction centroid + dequantized(residual) — the deployment
    variant (symmetric scoring costs query-side quantization error for
    no storage win).

    Exactness: residual subtraction and reconstruction addition are
    single IEEE ops on identical operands; the PQ argmin reuses
    pq_dequantized's rounded fixed-order L2 fold; codebooks are
    k-means-TRAINED over the RESIDUAL subvectors (pq_dequantized's
    default training, seeded from the k_codes lowest vec_ids'
    residual subvectors — deterministic Q30 fixed-point Lloyd's, so
    the trained composite stays oracle-reproducible).

    Scale: centroids broadcast; residual + PQ stages are map-side plus
    the (vec_id, m) argmin window (n_sub rows per vector); the search
    join shuffles candidates on cell exactly like ann_topk_ivf."""
    from pyspark.sql import Window

    from tickdatapipeline_spark.operators.globalorder import pin

    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(centroids, "cell long, c array<double>")
    else:
        cents = base.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("c")
        )
    cents = pin(cents)  # residual, reconstruction, and assignment reuse
    assigned = pin(ivf_assign(emb, n_cells, nprobe, centroids=centroids))
    resid = assigned.join(F.broadcast(cents), "cell").select(
        "vec_id", "cell",
        F.zip_with("v", "c", lambda x, y: x - y).alias("embedding"),
    )
    resid = pin(resid)  # feeds both the PQ pass and the cell lookup
    pq_r = pq_dequantized(resid.select("vec_id", "embedding"), n_sub,
                          k_codes, train_iters=train_iters)
    recon = (
        pq_r.select("vec_id", F.col("v").alias("pr"))
        .join(resid.select("vec_id", "cell"), "vec_id")
        .join(F.broadcast(cents), "cell")
        .select("vec_id", "cell",
                F.zip_with("pr", "c", lambda x, y: x + y).alias("v"))
    )
    queries = assigned.where(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"),
        F.explode("probe_cells").alias("probe_cell"),
    )
    joined = recon.join(
        F.broadcast(queries),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = rnd(_cos_sim(F.col("q"), F.col("v")))
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_dedup_against_index(emb_shard: DataFrame, path: str,
                                  threshold: float = 0.96,
                                  nprobe: int = IVF_NPROBE,
                                  exclude_shard: str | None = None,
                                  exclude_prefix: str | None = None,
                                  use_adc: "bool | None" = None,
                                  rerank: int = PROBE_ADC_RERANK) -> DataFrame:
    """Near-dup-FILTER a new shard of embeddings against the persisted
    IVF index: the shard's surviving rows (every input column,
    unchanged) after dropping vectors whose best cosine against ANY
    indexed vector reaches ``threshold`` — the embedding half of the
    daily-delta dedup loop (text: `dedup.dedup_against_index`):
    intra-shard `semantic_dedup` first, then this shard-vs-corpus
    filter off the parquet index, then `append_ann_index` the keepers.

    Built on `ann_probe_against_index` (top-1 is enough), so the scan
    prunes to each probe's nprobe cells and corpus signatures are
    never recomputed. Approximation contract matches the ANN index
    itself: a near-dup hiding in an unprobed cell survives — raise
    ``nprobe`` (or rebuild with more cells) to trade cost for recall,
    exactly like the text loop's band count.

    ``exclude_shard`` drops one ``vectors/shard=<name>`` partition from
    the index read (partition-pruned) — the replay contract of the
    daily-delta loop, same as `dedup.dedup_against_index`: a re-run of
    day N after its own `append_ann_index` landed would otherwise find
    every shard vector at cosine 1.0 against itself and drop the whole
    shard. ``exclude_prefix`` drops every shard NAME starting with the
    prefix (also partition-pruned) — the streaming twin's contract,
    see the inline note.

    ``use_adc`` (r14): None auto-detects — an index carrying PQ
    artifacts (written with ``write_ann_index(pq=True)``) is probed
    through `ann_probe_against_index_adc` (codes-table cell scan +
    exact verify of the top-``rerank`` candidates); True forces it
    (raises at read if the tables are absent), False forces the
    exact-scan probe.

    Scale: O(shard) probe work against cell-pruned parquet; the final
    anti-join is on the shard's vec_id only."""
    spark = emb_shard.sparkSession

    def _excluded(df: DataFrame) -> DataFrame:
        if exclude_shard is not None:
            df = df.where(F.col("shard") != exclude_shard)
        if exclude_prefix is not None:
            # partition-pruned like exclude_shard (shard is a partition
            # column, so the startswith predicate resolves against
            # partition VALUES at planning) — the streaming-ingest twin
            # excludes every `<day>.b*` micro-batch subshard at once:
            # the batch loop has no intra-day embedding dedup, so the
            # live path must not let one micro-batch's vectors drop a
            # later one's
            df = df.where(~F.col("shard").startswith(exclude_prefix))
        return df

    vectors = _excluded(spark.read.parquet(f"{path}/vectors"))
    if use_adc is None:
        use_adc = _exists_path(spark, f"{path}/pq_codebooks")
    if use_adc:
        # ADC candidate scoring + exact verify (r13 verdict #4): the
        # probe reads the compact CODES table for the cell scan and
        # touches raw vectors only for the rerank candidates; the
        # keep/drop test still runs on EXACT cosines, so a drop is
        # always justified — what ADC can change is a missed borderline
        # dup whose reconstruction ranks below `rerank` (same
        # approximation contract as raising nprobe trades against)
        hits = ann_probe_against_index_adc(
            emb_shard,
            spark.read.parquet(f"{path}/centroids"),
            _excluded(spark.read.parquet(f"{path}/pq_codes")),
            spark.read.parquet(f"{path}/pq_codebooks"),
            vectors,
            k=1,
            nprobe=nprobe,
            rerank=rerank,
        )
    else:
        hits = ann_probe_against_index(
            emb_shard,
            spark.read.parquet(f"{path}/centroids"),
            vectors,
            k=1,
            nprobe=nprobe,
        )
    hits = hits.where(F.col("cosine") >= threshold).select(
        F.col("query_id").alias("vec_id")).distinct()
    return emb_shard.join(hits, "vec_id", "left_anti")
