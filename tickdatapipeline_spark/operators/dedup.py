"""Deduplication operators over the `documents` table.

Training-data-pipeline surface: exact dedup, MinHash+LSH banding,
n-gram Jaccard verification. All pure DataFrame ops; the hashing scheme
(md5 lower-60-bits, Mersenne-prime universal hashes) is chosen so the
DuckDB oracle can reproduce every intermediate exactly.

Scale design:
- exact dedup: one map-side-combinable groupBy on a 60-bit hash.
- MinHash: explode(shingles) x NUM_PERM hash lanes -> groupBy(doc, lane)
  min. Shuffle is O(docs x NUM_PERM); document length only affects the
  map side.
- LSH banding: band-signature equality join (shuffle on band keys) —
  the standard sub-quadratic candidate generation; the quadratic
  verification (Jaccard) runs only on candidates.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from tickdatapipeline_spark.functions.rounding import rnd
from tickdatapipeline_spark.functions.scale import cap_group_sizes, fan_out

from tickdatapipeline_spark.operators.text import h60, tokens

logger = logging.getLogger(__name__)

MERSENNE_P = 2147483647  # 2^31 - 1
NUM_PERM = 32
BAND_SIZE = 4  # 8 bands of 4 rows

# Deployment default for the LSH band-bucket skew guard: a bucket of m
# docs emits ~m^2/2 candidate rows in ONE join task, so the default caps
# the worst bucket at ~500K pairs. Pass None explicitly for exhaustive
# (oracle-compared / small-corpus) output.
DEFAULT_MAX_BAND_BUCKET = 1000


def perm_a(j: int) -> int:
    return 1 + 37 * j


def perm_b(j: int) -> int:
    return (911 * j) % MERSENNE_P


def _exploded_grams(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-grams, duplicates NOT yet removed."""
    t = tokens(F.col("text"))
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # a small single-file docs table arrives as ONE partition; the gram
    # explosion multiplies rows ~100x and must run on every core
    return fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(grams).alias("shingle")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams of the lowercased text."""
    return _exploded_grams(docs, n).distinct()


def hashed_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, g) distinct shingles keyed by their 60-bit hash — the
    join-side representation of the overlap/verification paths: every
    shingle-equality join shuffles 8-byte integers instead of ~25-byte
    gram strings (~16% faster at sf0.1, and a 3x+ shuffle-byte cut at
    corpus scale). Hashing happens AFTER the per-doc distinct, so row
    counts match shingles() exactly; a cross-doc collision (odds
    ~pairs/2^61) can overcount one intersection by one, and the SQL
    twins hash identically so the oracle gate is unaffected — the same
    convention ngram_overlap_contamination already uses."""
    return shingles(docs, n).select("doc_id", h60(F.col("shingle")).alias("g"))


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup on whitespace-normalized lowercase text: groups with
    multiplicity > 1 plus the keeper (min doc_id) — hash-groupBy, the
    100 TB-scale baseline."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), h60(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("dup_count") > 1)
    )


def _minhash_wide(docs: DataFrame, num_perm: int) -> DataFrame:
    """(doc_id, s0..s{P-1}): one row per doc, one MIN aggregate per lane.

    sig_j = min over shingles of ((1+37j) * (h60 % P) + 911j) % P with
    P = 2^31-1; products stay < 2^62 (no overflow). A single
    map-side-combinable groupBy — no lanes row explosion, shuffle volume
    O(docs x num_perm) packed into one row per doc.
    """
    # NO shingle-dedup pass: MIN over a multiset equals MIN over its
    # distinct set, so duplicate shingles cannot change any lane minimum,
    # and the groupBy's map-side combiner already collapses each
    # partition to one row per doc — a distinct() here would add a full
    # extra shuffle of the token stream for nothing.
    sh = _exploded_grams(docs).select(
        "doc_id", (h60(F.col("shingle")) % MERSENNE_P).alias("h")
    )
    aggs = [
        F.min((F.lit(perm_a(j)) * F.col("h") + F.lit(perm_b(j))) % MERSENNE_P).alias(f"s{j}")
        for j in range(num_perm)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, j, sig) minhash lanes (unpivoted from the wide form)."""
    wide = _minhash_wide(docs, num_perm)
    lanes = F.array(*[
        F.struct(F.lit(j).alias("j"), F.col(f"s{j}").alias("sig")) for j in range(num_perm)
    ])
    return wide.select("doc_id", F.explode(lanes).alias("r")).select(
        "doc_id", F.col("r.j").alias("j"), F.col("r.sig").alias("sig")
    )


def lsh_candidate_pairs(docs: DataFrame, num_perm: int = NUM_PERM, band_size: int = BAND_SIZE,
                        max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs sharing any band signature.

    Output: (doc_a, doc_b) with doc_a < doc_b, distinct. Band keys come
    straight off the wide signature row (no per-lane shuffle); the only
    shuffles are the shingle groupBy and the band-key equi-join.

    ``max_band_bucket`` is the 100 TB skew guard: a band bucket of m
    docs emits m^2/2 join rows, and on a real corpus a degenerate band
    key (boilerplate-heavy shards) can hold millions of docs. Buckets
    larger than the cap are dropped BEFORE the self-join (standard LSH
    practice — an oversized bucket is a low-information band whose
    members are still recalled by their other bands). The deployment
    default is DEFAULT_MAX_BAND_BUCKET; when the guard trips, the number
    of dropped buckets/rows is computed eagerly off the pinned band
    table (one cheap aggregation job at plan-build time) and logged —
    a silent quadratic blowup is worse than a logged cap. Pass None
    explicitly for exhaustive output (the oracle-compared registry
    entries do), which also skips the eager sizing job.
    """
    # the band table is pinned (see _band_table): the self-join below
    # would otherwise recompute the full shingle->minhash lineage for
    # BOTH sides. At deployment scale this is "write signatures to
    # parquet, then join"; in-session, localCheckpoint is the same cut.
    bands = _band_table(docs, num_perm, band_size)
    if max_band_bucket is not None:
        bands = cap_group_sizes(bands, ["band", "band_key"], max_band_bucket,
                                "lsh_candidate_pairs", "max_band_bucket", logger)
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  candidates: DataFrame | None = None,
                  max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """n-gram Jaccard verification over LSH candidate pairs only.
    Output: (doc_a, doc_b, inter_count, union_count, jaccard) for
    jaccard >= threshold; union = |A| + |B| - inter.

    ``max_band_bucket`` passes through to the default candidate
    generation (ignored when ``candidates`` is given); None = exhaustive.

    ``candidates`` defaults to lsh_candidate_pairs(docs). Restricting to
    candidates is the scale-critical property: an unrestricted
    shingle-equality self-join makes every hot shingle of multiplicity m
    produce m^2 join rows (stopword-heavy 3-grams on a real corpus).
    Here each candidate pair fans out only by its own shingle count —
    O(candidates x doc_len) — at the price of LSH recall, which is the
    standard MinHash-LSH contract.
    """
    overlap = _candidate_overlap(docs, candidates, max_band_bucket)
    out = (
        overlap
        .withColumn("union_count", F.col("n_a") + F.col("n_b") - F.col("inter_count"))
        .withColumn("jaccard", rnd(F.col("inter_count").cast("double") / F.col("union_count").cast("double"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter_count", "union_count", "jaccard")
    )
    return out


def _candidate_overlap(docs: DataFrame, candidates: DataFrame | None,
                       max_band_bucket: int | None) -> DataFrame:
    """(doc_a, doc_b, inter_count, n_a, n_b) shingle-overlap counts over
    LSH candidate pairs — the shared core of jaccard_pairs and
    containment_pairs (identical scale contract: candidate-restricted
    joins, semi-join-restricted size table).

    The shingle explosion itself is CANDIDATE-RESTRICTED: only docs that
    appear in a candidate pair can reach the output (both the size table
    and the intersection join key on them), so the corpus is semi-joined
    down to candidate docs BEFORE the gram explode + per-doc distinct.
    At natural dup density the candidate doc set is a small fraction of
    the corpus, and the corpus-wide exploded-gram distinct was the
    dominant cost of this sub-DAG at 1M docs (r7 probe: ~220 s, ~25x
    slower per doc than candidate generation) — Catalyst cannot push a
    semi-join below the distinct aggregate on its own, and the explode
    sat below it. Output is row-identical: non-candidate docs never
    contributed anything. The restricted shingle table is pinned (three
    consumers: sizes + both intersection sides), as is the candidate
    table (two consumers: the doc set and the intersection join)."""
    from tickdatapipeline_spark.operators.globalorder import pin

    if candidates is None:
        candidates = lsh_candidate_pairs(docs, max_band_bucket=max_band_bucket)
    candidates = pin(candidates)
    # at corpus scale `sizes` is one row per document (unbroadcastable),
    # but the candidate doc set is tiny, so the semi-join keeps the
    # downstream joins below AQE's broadcast threshold without a hint.
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = pin(hashed_shingles(
        docs.withColumn("doc_id", F.col("doc_id").cast("long"))
        .join(cand_docs, on="doc_id", how="left_semi")
    ))  # 8-byte join keys, not gram strings; candidate docs only
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        candidates.join(sh.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(
            sh.alias("b"),
            (F.col("doc_b") == F.col("b.doc_id")) & (F.col("a.g") == F.col("b.g")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_count"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b", "inter_count",
            F.col("sa.n_sh").alias("n_a"), F.col("sb.n_sh").alias("n_b"),
        )
    )


def containment_pairs(docs: DataFrame, threshold: float = 0.8,
                      candidates: DataFrame | None = None,
                      max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """Asymmetric near-duplicate detection: shingle CONTAINMENT
    inter / min(|A|, |B|) over LSH candidate pairs — catches a short
    document embedded verbatim in a longer one (quotes, boilerplate
    wrappers, syndicated articles with added chrome), which symmetric
    Jaccard misses whenever the size ratio is large (a fully contained
    doc 10x smaller scores jaccard ~0.1 but containment 1.0).

    Same candidate-restriction scale contract as jaccard_pairs; recall
    inherits MinHash-LSH's symmetric-similarity bias, the standard
    trade-off when containment candidates come from the same index.

    Output: (doc_a, doc_b, inter_count, min_count, containment) for
    containment >= threshold.
    """
    overlap = _candidate_overlap(docs, candidates, max_band_bucket)
    return (
        overlap
        .withColumn("min_count", F.least(F.col("n_a"), F.col("n_b")))
        .withColumn(
            "containment",
            rnd(F.col("inter_count").cast("double") / F.col("min_count").cast("double"), 6),
        )
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "inter_count", "min_count", "containment")
    )


def cross_corpus_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """Benchmark decontamination: training documents that near-duplicate
    any evaluation document — the "remove test-set overlap from the
    training corpus" operator of an LLM data pipeline.

    Output: (train_doc_id, eval_doc_id, inter_count, union_count,
    jaccard) for jaccard >= threshold.

    Scale design: MinHash signatures are per-document (independent of
    which corpus a doc sits in), so each side gets its own wide
    signature pass; candidates come from an LSH band-key equi-join
    BETWEEN the corpora — never a self-join, never a shingle-level
    join. The eval side is typically tiny (benchmarks: 10^3-10^5 docs
    vs 10^9 train docs), so its band table broadcasts and the train
    side streams map-side; Jaccard verification is candidate-restricted
    on both sides (semi-joined shingle tables), exactly like
    jaccard_pairs. ``max_band_bucket`` caps the TRAIN side's band
    buckets (a boilerplate band key shared by millions of train docs
    would otherwise fan every matching eval doc out by the bucket
    size); the eval side is left uncapped — dropping eval docs would
    silently un-decontaminate.
    """
    out = contamination_against_index(
        eval_docs,
        # single consumer inside contamination_against_index on both the
        # capped path (the touched semi-join, whose result is pinned) and
        # the uncapped path (the candidate join) — no reuse, no pin
        _band_table(train_docs, num_perm, band_size, pinned=False),
        corpus_shingles=None,  # computed candidate-restricted from train_docs
        corpus_docs=train_docs,
        threshold=threshold,
        num_perm=num_perm,
        band_size=band_size,
        max_band_bucket=max_band_bucket,
        guard_label="cross_corpus_contamination train-side",
    )
    return out.select(
        F.col("corpus_doc_id").alias("train_doc_id"),
        F.col("probe_doc_id").alias("eval_doc_id"),
        "inter_count", "union_count", "jaccard",
    )


def cross_corpus_contamination_split(
    docs: DataFrame,
    eval_mask,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """cross_corpus_contamination for the held-out-split case: train and
    eval are complementary row-subsets of ONE corpus, selected by
    ``eval_mask`` (a Column predicate over doc_id ONLY — it is re-applied
    to per-doc derived tables).

    Row-identical to
    ``cross_corpus_contamination(docs.where(~mask), docs.where(mask))``:
    MinHash signatures and band keys are per-doc values, so a doc_id
    filter commutes with the signature aggregation and with the band
    unpivot. The win is the corpus-scan-dominant term — ONE gram
    explode + ONE wide signature shuffle + ONE pinned band table over
    the whole corpus instead of two of each (the two sides' passes
    together scanned every doc anyway, but paid two scans, two
    shuffles, and two checkpoint materializations to do it).
    """
    docs = docs.withColumn("doc_id", F.col("doc_id").cast("long"))
    # deliberately NOT pinned: both filtered consumers sit inside the
    # one candidate-join subtree, where AQE's stage cache reuses the
    # single signature shuffle below them — a checkpoint here would add
    # a serial full-band-table disk write for the same reuse (measured
    # r14: equal wall/jobs, so the variant with no extra materialization
    # and no at-scale band-table write wins)
    bands = _bands_of(_minhash_wide(docs, num_perm), num_perm, band_size)
    out = contamination_against_index(
        docs.where(eval_mask),
        bands.where(~eval_mask),
        corpus_shingles=None,
        corpus_docs=docs.where(~eval_mask),
        threshold=threshold,
        num_perm=num_perm,
        band_size=band_size,
        max_band_bucket=max_band_bucket,
        guard_label="cross_corpus_contamination train-side",
        probe_bands=bands.where(eval_mask),
    )
    return out.select(
        F.col("corpus_doc_id").alias("train_doc_id"),
        F.col("probe_doc_id").alias("eval_doc_id"),
        "inter_count", "union_count", "jaccard",
    )


def ngram_overlap_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Exact verbatim n-gram decontamination (the GPT-3 §C / PaLM-style
    check, complementary to the MinHash path): a training document is
    contaminated to the degree its word n-grams appear VERBATIM in any
    evaluation document. Where cross_corpus_contamination finds fuzzy
    near-duplicates, this finds exact phrase overlap — the standard
    leakage filter for benchmark answers quoted inside training text.

    Output, one row per train doc with at least one hit:
    (train_doc_id, n_grams, n_hit, hit_frac) where n_grams is the
    doc's distinct n-gram count, n_hit how many of those occur in the
    eval corpus, hit_frac = n_hit/n_grams rounded to 6 places.
    Thresholding (e.g. drop when hit_frac > 0.1, or n_hit >= 1 for the
    strict GPT-3 rule) is the caller's policy.

    Scale design: both sides reduce to distinct 60-bit n-gram hashes
    before any join — shuffle volume is O(distinct grams x 8 bytes),
    never gram strings. The eval-side distinct gram set is tiny versus
    the train corpus (benchmarks vs a 10^9-doc crawl), so AQE
    broadcasts it and the train side streams map-side; the per-doc
    totals and hit counts are map-side-combinable groupBys on doc_id.
    The 2^-60 hash-collision odds trade an exact-string join's string
    shuffle for integer keys (same convention as the LSH path).
    """
    tg = shingles(train_docs, n).select(
        "doc_id", h60(F.col("shingle")).alias("gh")
    )
    eg = (
        shingles(eval_docs, n)
        .select(h60(F.col("shingle")).alias("gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass over the expensive train-side gram lineage: a left join
    # against the eval hashes marks hits, then a single groupBy counts
    # totals (all rows) and hits (non-null marker) together — the gram
    # explosion + distinct shuffle of the train corpus runs once, not
    # once per aggregate.
    return (
        tg.join(eg, on="gh", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hit"),
        )
        .where(F.col("n_hit") > 0)
        .select(
            F.col("doc_id").alias("train_doc_id"),
            "n_grams",
            "n_hit",
            rnd(F.col("n_hit").cast("double") / F.col("n_grams").cast("double"), 6).alias("hit_frac"),
        )
    )


def write_corpus_index(docs: DataFrame, path: str, num_perm: int = NUM_PERM,
                       band_size: int = BAND_SIZE,
                       max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> None:
    """Materialize the corpus's LSH decontamination index as parquet:
    the band table (``path``/bands) and shingle table (``path``/shingles)
    that ``contamination_against_index`` joins against. This is the
    deployment artifact for ingest-time checks — computed once per
    corpus build, refreshed when the corpus changes, NOT recomputed per
    micro-batch.

    The skew cap is applied HERE, at build time (oversized band buckets
    dropped once, logged), so per-batch probes pass
    ``max_band_bucket=None`` and pay no per-batch sizing work — the
    bucket sizes of a static index cannot change between batches.

    Pinning: with the cap active the band table is consumed three times
    (the guard's eager sizing job, the sizes side of its anti-filter
    join, and the parquet write), so it is pinned to avoid re-deriving
    the full shingle->minhash lineage per consumer. With the cap
    disabled the parquet write is the only consumer and the unpinned
    plan writes everything exactly once."""
    bands = _band_table(docs, num_perm, band_size,
                        pinned=max_band_bucket is not None)
    if max_band_bucket is not None:
        bands = cap_group_sizes(bands, ["band", "band_key"], max_band_bucket,
                                "write_corpus_index", "max_band_bucket", logger)
    # shard-partitioned layout (r10): the base build owns shard=base;
    # daily deltas land as their own shard partitions via
    # append_corpus_index. A full rebuild (this function) wipes every
    # shard first — the compaction path when incremental growth needs
    # the skew cap re-applied globally. Shard dirs are written as
    # explicit shard=<name> paths (not writer-side partitionBy): an
    # EMPTY build/delta then still lands a schema-bearing parquet file,
    # so the parent read never fails schema inference — partitionBy
    # with zero rows writes no files at all.
    spark = docs.sparkSession
    _wipe_path(spark, f"{path}/bands")
    _wipe_path(spark, f"{path}/shingles")
    bands.write.mode("overwrite").parquet(f"{path}/bands/shard=base")
    # hashed form: the on-disk shingle table is (doc_id, g) 8-byte pairs
    # — ~3x smaller than gram strings and the join-ready representation
    hashed_shingles(docs).write.mode("overwrite").parquet(
        f"{path}/shingles/shard=base")


def _wipe_path(spark, dir_path: str) -> None:
    """Recursively delete a filesystem path via the session's Hadoop
    FileSystem (no-op when absent) — full-rebuild hygiene so stale
    delta shards from `append_corpus_index` cannot survive a
    `write_corpus_index` compaction."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def append_corpus_index(docs_shard: DataFrame, path: str, shard: str,
                        num_perm: int = NUM_PERM, band_size: int = BAND_SIZE,
                        max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
                        ) -> None:
    """Idempotent incremental maintenance for the persisted LSH index:
    compute bands + hashed shingles for ONE new shard of documents and
    land them as that shard's partitions of the ``write_corpus_index``
    layout — the daily-delta shape a 100 TB corpus actually runs
    (recomputing corpus-wide signatures per delta is the thing this
    avoids; only the shard's own signatures are computed here).

    Replay-idempotent by the same partition contract as
    ``search.run_index_ingest``: the write overwrites exactly the
    ``shard=<shard>`` partition directories, so re-running a failed or
    duplicated delta job leaves the index equivalent instead of
    doubling the shard's rows. Probes via
    ``contamination_against_index`` / ``dedup_against_index`` read the
    union of all shards transparently (the discovered ``shard``
    partition column rides along and is ignored by the joins).

    Skew-cap contract: ``max_band_bucket`` bounds the NEW shard's band
    buckets at append time (same build-time guard as the base build),
    but a bucket can exceed the cap ACROSS shards while capped within
    each — per-batch probes that need the global bound pass
    ``max_band_bucket`` to `contamination_against_index` (its
    corpus-side probe-time cap), and a scheduled `write_corpus_index`
    rebuild re-applies the cap globally, exactly like
    ``search.compact_index`` for posting buckets."""
    # validate FIRST and never as a bare assert: under python -O an
    # invalid shard name ("base", or one smuggling '/' or '=' into the
    # partition path) would silently OVERWRITE another shard's
    # partition -- the base index most catastrophically; and raising
    # before _band_table avoids burning the full MinHash job on a
    # delta that was never going to land
    if not shard or shard == "base" or "/" in shard or "=" in shard:
        raise ValueError(
            f"invalid shard name {shard!r}: must be non-empty, not 'base', "
            "and contain no '/' or '='")
    bands = _band_table(docs_shard, num_perm, band_size,
                        pinned=max_band_bucket is not None)
    if max_band_bucket is not None:
        bands = cap_group_sizes(bands, ["band", "band_key"], max_band_bucket,
                                "append_corpus_index", "max_band_bucket",
                                logger)
    bands.write.mode("overwrite").parquet(f"{path}/bands/shard={shard}")
    hashed_shingles(docs_shard).write.mode("overwrite").parquet(
        f"{path}/shingles/shard={shard}")


def dedup_against_index(spark, probe_docs: DataFrame, path: str,
                        threshold: float = 0.5,
                        num_perm: int = NUM_PERM, band_size: int = BAND_SIZE,
                        max_band_bucket: int | None = None,
                        exclude_shard: str | None = None) -> DataFrame:
    """Near-dup-FILTER a new shard against the persisted corpus index:
    the shard's surviving rows (every input column, unchanged) after
    dropping docs whose verified Jaccard against ANY indexed corpus
    doc clears ``threshold``. The shard-vs-corpus half of incremental
    dedup — corpus signatures come off the parquet index
    (``write_corpus_index`` + ``append_corpus_index`` partitions), only
    the shard's own signatures are computed. Intra-shard duplicates are
    the in-session pass's job (`deduplicated_corpus` on the shard);
    run it first, then this, then `append_corpus_index` the keepers —
    the daily-delta loop.

    Row-identical to the full-recompute formulation
    (`contamination_against_index` with ``corpus_docs=`` the original
    corpus frame) because both run the identical candidate + verify
    algebra — pinned by tests/test_beyond.py::
    test_incremental_index_dedup_matches_full_recompute.

    ``exclude_shard`` drops one ``shard=<name>`` partition from the
    index read (partition-pruned at the scan — never a data filter):
    the REPLAY contract of the daily-delta loop. A re-run of day N
    after its own `append_corpus_index` landed would otherwise probe
    against the shard's own signatures and drop every doc as a
    self-duplicate — the runner (`delta_loop.run_daily_delta`) always
    excludes the day it is (re)ingesting.

    Scale: index side is a parquet scan shuffled on compact band keys;
    shard side follows the probe contract (small). The left_anti final
    join is on the shard's doc_id only — O(shard) rows."""
    bands = spark.read.parquet(f"{path}/bands")
    shingles = spark.read.parquet(f"{path}/shingles")
    if exclude_shard is not None:
        bands = bands.where(F.col("shard") != exclude_shard)
        shingles = shingles.where(F.col("shard") != exclude_shard)
    hits = contamination_against_index(
        probe_docs,
        bands,
        shingles.select("doc_id", "g"),
        threshold=threshold, num_perm=num_perm, band_size=band_size,
        max_band_bucket=max_band_bucket,
        guard_label="dedup_against_index corpus-side",
    )
    dropped = hits.select(
        F.col("probe_doc_id").cast("long").alias("doc_id")).distinct()
    return probe_docs.withColumn(
        "doc_id", F.col("doc_id").cast("long")
    ).join(dropped, on="doc_id", how="left_anti")


def contamination_against_index(
    probe_docs: DataFrame,
    corpus_bands: DataFrame,
    corpus_shingles: DataFrame | None,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
    guard_label: str = "contamination_against_index corpus-side",
    corpus_docs: DataFrame | None = None,
    probe_bands: DataFrame | None = None,
) -> DataFrame:
    """Probe documents that near-duplicate a corpus whose LSH index
    (band + HASHED-shingle tables — (doc_id, g) integer pairs, see
    ``write_corpus_index``) is precomputed.

    Output: (corpus_doc_id, probe_doc_id, inter_count, union_count,
    jaccard) for jaccard >= threshold.

    Scale posture: only the PROBE side (a micro-batch / an eval set —
    small) computes signatures here; the corpus side is an index lookup,
    shuffled on compact band keys. ``max_band_bucket`` caps the CORPUS
    side's band buckets only — dropping probe docs would silently skip
    checks.

    Shingle tables are CANDIDATE-RESTRICTED before the verification
    join (same argument as _candidate_overlap: only docs in a candidate
    pair can reach the output, so the semi-join is row-identical).
    Passing ``corpus_docs`` instead of a precomputed ``corpus_shingles``
    pushes that restriction BELOW the gram explode + per-doc distinct —
    the in-session path (see cross_corpus_contamination), where the
    corpus-wide distinct dominated the r7 1M-doc probe. With a parquet
    ``corpus_shingles`` index the semi-join restricts the scan instead.
    """
    from tickdatapipeline_spark.operators.globalorder import pin

    assert (corpus_shingles is None) != (corpus_docs is None), (
        "pass exactly one of corpus_shingles (precomputed index) or "
        "corpus_docs (in-session: shingles computed candidate-restricted)"
    )
    # the probe band table has TWO consumers only on the capped path
    # (the touched-bucket semi-join and the candidate join); uncapped it
    # feeds the candidate join alone, so a pin would add a checkpoint
    # materialization job for zero reuse. ``probe_bands`` (when given)
    # is the caller's precomputed/shared band table for probe_docs —
    # see cross_corpus_contamination's shared-corpus path.
    if probe_bands is None:
        probe_bands = _band_table(probe_docs, num_perm, band_size,
                                  pinned=max_band_bucket is not None)
    p_bands = probe_bands
    if max_band_bucket is not None:
        # Cap only the buckets the PROBE touches (r13): the cap's
        # decision per bucket depends only on that bucket's FULL corpus
        # row count, and a key-restriction keeps every row of a
        # surviving key — so first left-semi-joining the corpus bands
        # to the probe's band keys (broadcast: the probe side is small
        # by this function's contract) leaves per-key counts, and
        # therefore the kept/dropped-bucket decision and the final
        # output, BIT-IDENTICAL — while the sizing work (one eager
        # count job + a sizes join, 3 passes in cap_group_sizes) runs
        # over O(probe-touched buckets) instead of O(corpus index).
        # Before this, every micro-batch of the delta loop re-sized
        # the whole persisted index — the O(index)-shuffle-per-batch
        # cost write_corpus_index's build-time cap exists to avoid.
        touched = corpus_bands.join(
            F.broadcast(p_bands.select("band", "band_key").distinct()),
            on=["band", "band_key"], how="left_semi")
        corpus_bands = cap_group_sizes(pin(touched), ["band", "band_key"],
                                       max_band_bucket, guard_label,
                                       "max_band_bucket", logger)
    cand = pin(
        corpus_bands.alias("t")
        .join(
            p_bands.alias("e"),
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.band_key") == F.col("e.band_key")),
        )
        .select(
            F.col("t.doc_id").alias("corpus_doc_id"),
            F.col("e.doc_id").alias("probe_doc_id"),
        )
        .distinct()
    )
    # build sides of left-semi joins only: semi-join semantics dedup the
    # build side for free, so an explicit .distinct() here would buy
    # nothing and cost one exchange + aggregate each (guide §2.4)
    cand_corpus = cand.select(F.col("corpus_doc_id").alias("doc_id"))
    cand_probe = cand.select(F.col("probe_doc_id").alias("doc_id"))
    if corpus_docs is not None:
        corpus_shingles = hashed_shingles(
            corpus_docs.withColumn("doc_id", F.col("doc_id").cast("long"))
            .join(cand_corpus, on="doc_id", how="left_semi")
        )
    else:
        corpus_shingles = corpus_shingles.join(cand_corpus, on="doc_id",
                                               how="left_semi")
    corpus_shingles = pin(corpus_shingles)
    p_sh = pin(hashed_shingles(
        probe_docs.withColumn("doc_id", F.col("doc_id").cast("long"))
        .join(cand_probe, on="doc_id", how="left_semi")
    ))
    t_sizes = corpus_shingles.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"))
    p_sizes = p_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(corpus_shingles.alias("a"), F.col("corpus_doc_id") == F.col("a.doc_id"))
        .join(
            p_sh.alias("b"),
            (F.col("probe_doc_id") == F.col("b.doc_id"))
            & (F.col("a.g") == F.col("b.g")),
        )
        .groupBy("corpus_doc_id", "probe_doc_id")
        .agg(F.count(F.lit(1)).alias("inter_count"))
    )
    return (
        inter.join(t_sizes.alias("sa"), F.col("corpus_doc_id") == F.col("sa.doc_id"))
        .join(p_sizes.alias("sb"), F.col("probe_doc_id") == F.col("sb.doc_id"))
        .withColumn("union_count", F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter_count"))
        .withColumn("jaccard", rnd(F.col("inter_count").cast("double") / F.col("union_count").cast("double"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("corpus_doc_id", "probe_doc_id", "inter_count", "union_count", "jaccard")
    )


def _band_table(docs: DataFrame, num_perm: int, band_size: int,
                pinned: bool = True) -> DataFrame:
    """(doc_id, band, band_key) LSH band table off the wide signature
    row, pinned (default) so multiple consumers reuse one
    materialization; pass pinned=False for single-consumer paths like
    the index parquet write."""
    from tickdatapipeline_spark.operators.globalorder import pin

    bands = _bands_of(_minhash_wide(docs, num_perm), num_perm, band_size)
    return pin(bands) if pinned else bands


def _bands_of(wide: DataFrame, num_perm: int, band_size: int) -> DataFrame:
    """Unpivot a wide signature row into (doc_id, band, band_key)."""
    n_bands = num_perm // band_size
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(",", *[
                F.col(f"s{b * band_size + r}").cast("string") for r in range(band_size)
            ]).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    return wide.select("doc_id", F.explode(band_structs).alias("r")).select(
        "doc_id", F.col("r.band").alias("band"), F.col("r.band_key").alias("band_key")
    )


def _rowlocal_grams(text, n: int = 3):
    """Row-local token n-gram array (empty when the doc is too short
    to shingle) — THE single definition both rowlocal signature
    expressions share; a tokenization or gram tweak lands here once,
    or the batch and stream LSH keys silently diverge."""
    t = tokens(text)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _rowlocal_lane(hs, j: int):
    """Lane j's MinHash minimum over the row-local hashed grams —
    bit-identical to `_minhash_wide`'s s{j} column."""
    return F.array_min(F.transform(
        hs, lambda h: (F.lit(perm_a(j)) * h + F.lit(perm_b(j))) % MERSENNE_P
    ))


def rowlocal_bands_from_signature(sig, num_perm: int = NUM_PERM,
                                  band_size: int = BAND_SIZE):
    """Band key structs derived from an ALREADY-computed row-local
    signature COLUMN — the keys are pure string concatenations of
    signature slices, so deriving them from the materialized ``sig``
    instead of re-evaluating every lane halves the streaming ingest
    path's per-arrival hashing (the signature rides to the verify
    kernel anyway). element_at is 1-based and bounded by construction
    (a non-empty rowlocal signature always has ``num_perm`` lanes).
    Equality with `rowlocal_band_signature` over the same text is
    unit-pinned."""
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(",", *[
                F.element_at(sig, b * band_size + r + 1).cast("string")
                for r in range(band_size)
            ]).alias("band_key"),
        )
        for b in range(num_perm // band_size)
    ]
    return F.when(F.size(sig) >= 1, F.array(*structs)).otherwise(
        F.array().cast("array<struct<band:int,band_key:string>>")
    )


def rowlocal_band_signature(text, num_perm: int = NUM_PERM,
                            band_size: int = BAND_SIZE, n: int = 3):
    """``array<struct<band:int, band_key:string>>`` holding the SAME
    MinHash-LSH band keys ``_band_table`` computes, as one row-local
    column expression — no explode, no groupBy, no shuffle. Built for
    streaming ingest (the full text is on the row, so the per-doc
    aggregate the batch path shuffles for is just ``array_min``) and
    for map-side signature stamping.

    Exactness: lane j's minimum over the gram MULTISET equals the min
    over its distinct set (the `_minhash_wide` argument), and the key
    string is the identical comma-joined lane concatenation, so a
    stream-stamped signature joins against a batch-built band table
    key-for-key (unit-pinned by test_rowlocal_bands_match_band_table).
    Docs with fewer than ``n`` tokens have no shingles and return an
    EMPTY array — mirroring the batch path, where they vanish at the
    shingle groupBy; callers choose the fallback (the streaming dedup
    keys them by exact content digest instead)."""
    grams = _rowlocal_grams(text, n)
    hs = F.transform(grams, lambda g: h60(g) % MERSENNE_P)

    def lane(j: int):
        return _rowlocal_lane(hs, j)

    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(",", *[
                lane(b * band_size + r).cast("string") for r in range(band_size)
            ]).alias("band_key"),
        )
        for b in range(num_perm // band_size)
    ]
    return F.when(F.size(grams) >= 1, F.array(*structs)).otherwise(
        F.array().cast("array<struct<band:int,band_key:string>>")
    )


def rowlocal_minhash_signature(text, num_perm: int = NUM_PERM, n: int = 3):
    """``array<long>`` of ALL ``num_perm`` MinHash lane minima for one
    document, as a row-local column expression — the full signature
    whose banded prefix-concatenations `rowlocal_band_signature` emits
    as keys. Lane j here is bit-identical to `_minhash_wide`'s s{j}
    (same grams, same ``perm_a/perm_b`` Mersenne hashes), so the
    fraction of agreeing positions between two signatures is the
    standard unbiased MinHash estimate of their shingle-set Jaccard.

    Built for the streaming near-dup tier's LSH-then-VERIFY contract:
    the band key says "candidate", the stored signature says whether
    the estimated Jaccard actually clears the batch threshold — without
    it, a single band collision between NON-duplicates would drop a
    good document at ingest. Docs with fewer than ``n`` tokens return
    an EMPTY array (no shingles — the batch path's convention); callers
    fall back to exact-content keys for those."""
    grams = _rowlocal_grams(text, n)
    hs = F.transform(grams, lambda g: h60(g) % MERSENNE_P)
    return F.when(
        F.size(grams) >= 1,
        F.array(*[_rowlocal_lane(hs, j) for j in range(num_perm)]),
    ).otherwise(
        F.array().cast("array<bigint>")
    )


def simhash_near_dup_pairs(docs: DataFrame, bits: int = 32, n_bands: int = 4,
                           max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs: docs whose signatures differ in at
    most ``max_hamming`` bits, found via band pigeonholing — the
    signature splits into ``n_bands`` equal bit-bands, and any pair
    within ``max_hamming`` <= n_bands - 1 must share at least one intact
    band, so a band-key equi-join finds every such pair EXACTLY (no
    recall loss, unlike MinHash-LSH banding).

    Output: (doc_a, doc_b, hamming) with doc_a < doc_b.

    Scale: signatures are one row per doc; the join shuffles on
    (band, band_key) like LSH banding; verification is one bit_count per
    candidate pair. Degenerate bands (e.g. all-zero signatures of empty
    docs) would need the same max-bucket guard as LSH at corpus scale.
    """
    assert bits % n_bands == 0 and max_hamming <= n_bands - 1
    from tickdatapipeline_spark.operators.text import simhash

    width = bits // n_bands
    from tickdatapipeline_spark.operators.globalorder import pin

    sig = pin(simhash(docs, bits))  # reused by both join sides
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit((1 << width) - 1)).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    bands = sig.select("doc_id", "simhash", F.explode(band_structs).alias("r")).select(
        "doc_id", "simhash", F.col("r.band").alias("band"), F.col("r.band_key").alias("band_key")
    )
    pairs = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def duplicate_clusters(docs: DataFrame, threshold: float = 0.5,
                       max_iter: int = 20,
                       max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """Connected components over the near-duplicate graph: group every
    verified near-dup pair (jaccard_pairs) into clusters and elect the
    min-doc_id representative — the "keep one copy" step of corpus dedup.

    Output: (doc_id, cluster_id, cluster_size, is_representative) for
    every document in a cluster of size >= 2.

    Scale design: iterative min-label propagation — per round ONE
    shuffle join (edges x labels) plus a map-side-combinable min
    aggregation, converging in O(cluster diameter) rounds (near-dup
    clusters are shallow; bounded by ``max_iter``). Lineage is truncated
    every round (localCheckpoint), so plans stay flat no matter the
    iteration count. Equivalent of the reference-absent "dedup
    clustering" stage; deterministic, so DuckDB's recursive CTE can
    reproduce it exactly.
    """
    pairs = jaccard_pairs(
        docs, threshold, max_band_bucket=max_band_bucket
    ).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b", max_iter=max_iter,
                                id_col="doc_id")


def connected_components(pairs: DataFrame, a_col: str, b_col: str,
                         max_iter: int = 20, id_col: str = "node") -> DataFrame:
    """Generic undirected connected components over an edge list.

    Output: (id_col, cluster_id, cluster_size, is_representative) for
    every node appearing in an edge; cluster_id = min node id of the
    component. See duplicate_clusters for the scale rationale.

    Each round combines neighbor propagation with POINTER JUMPING
    (label <- label of my label — every label value is itself a node
    id), so convergence is O(log diameter) rounds, not O(diameter):
    max_iter=20 covers components with diameter up to ~2^20 — without
    the jump, a 30-deep near-dup CHAIN (pathological but real in
    boilerplate corpora) would exhaust 20 one-hop rounds and silently
    return split clusters. Non-convergence now raises instead of
    returning wrong labels.
    """
    edges = (
        pairs.select(F.col(a_col).alias("node"), F.col(b_col).alias("nbr"))
        .unionByName(pairs.select(F.col(b_col).alias("node"), F.col(a_col).alias("nbr")))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = edges.select("node").distinct().withColumn("label", F.col("node"))
    converged_early = False
    for _ in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("node", "nbr"), on="nbr"
        ).select("node", "label")
        jump = (
            labels.select(F.col("node").alias("_jn"), F.col("label").alias("_mid"))
            .join(
                labels.select(F.col("node").alias("_mid"), F.col("label").alias("_jl")),
                on="_mid",
            )
            .select(F.col("_jn").alias("node"), F.col("_jl").alias("label"))
        )
        new_labels = (
            labels.unionByName(prop).unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
        )
        # convergence probe: isEmpty short-circuits at the first changed
        # row (limit-1 scan), so a non-converged round costs O(first
        # partition with a change), not a full count
        converged = (
            new_labels.withColumnRenamed("label", "new")
            .join(labels, on="node")
            .where(F.col("new") != F.col("label"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            converged_early = True
            break
    if not converged_early:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter > ~2^{max_iter}); raise max_iter"
        )
    csizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(csizes, on="label")
        .select(
            F.col("node").alias(id_col),
            F.col("label").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col("node") == F.col("label")).cast("long").alias("is_representative"),
        )
    )


def deduplicated_corpus(docs: DataFrame, threshold: float = 0.5,
                        max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """The APPLY step of corpus dedup: drop every non-representative
    member of a near-dup cluster (duplicate_clusters) and keep the rest
    of the corpus untouched. Output: (doc_id, n_chars) of the surviving
    documents — what a training-data pipeline actually materializes.

    Scale: on a real web corpus the drop list can be 30-50 % of all
    documents — far beyond broadcast range — so the anti-join is left
    unhinted: AQE broadcasts it when it is small and shuffles on doc_id
    otherwise.
    """
    drop = (
        duplicate_clusters(docs, threshold, max_band_bucket=max_band_bucket)
        .where(F.col("is_representative") == 0)
        .select("doc_id")
    )
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.length("text").cast("long").alias("n_chars"))
        .join(drop, on="doc_id", how="left_anti")
    )


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word n-grams whose FIRST corpus occurrence (minimum doc_id
    over all documents containing the gram) is this document — the
    "how much genuinely new text does each doc contribute" score used
    to rank crawl increments and spot boilerplate-dominated sources
    (complementary to dedup: a doc can be nobody's near-duplicate yet
    still 95% previously-seen phrases).

    Grams are keyed by their 60-bit hash (compact shuffle keys; a
    collision merges two grams' first-occurrence attribution — odds
    ~m^2/2^61, and the SQL twin hashes identically so the gate is
    unaffected). Documents with fewer than ``n`` tokens have no grams
    and are absent from the output.

    Scale: shingle explosion is map-side; ONE groupBy on the gram hash
    builds the first-occurrence map, reuses its exchange for the join
    back (same key), then a map-side-combinable per-doc aggregate.
    Nothing quadratic, no windows over the corpus.

    Output: (doc_id, n_grams, n_novel, novelty).
    """
    sh = shingles(docs, n).select("doc_id", h60(F.col("shingle")).alias("g"))
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, on="g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id", "n_grams", "n_novel",
            rnd(
                F.col("n_novel").cast("double") / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )


def cross_source_dup_matrix(docs: DataFrame, threshold: float = 0.5,
                            max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
                            ) -> DataFrame:
    """Cross-source duplication matrix: for every unordered pair of
    sources, how many verified near-duplicate document pairs
    (jaccard_pairs at ``threshold``) straddle them — the corpus-curation
    dashboard that answers "which feeds are re-crawling each other"
    before mixture weights are trusted. Diagonal rows (source_a ==
    source_b) count within-source duplication.

    Aggregates are integer counts plus MIN/MAX jaccard (order-
    independent — a float MEAN across rows would not be reproducible
    across partitionings and is deliberately absent).

    Scale: the expensive part is the shared LSH+Jaccard sub-DAG, with
    its usual skew caps; the source labels join pairs (small relative
    to the corpus) against the compact (doc_id, source) projection, and
    the final aggregate is |sources|^2-bounded.

    Output: (source_a, source_b, n_pairs, min_jaccard, max_jaccard),
    source_a <= source_b.
    """
    pairs = jaccard_pairs(docs, threshold, max_band_bucket=max_band_bucket)
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "source")
    lab = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")),
            on="doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")),
            on="doc_b",
        )
    )
    return (
        lab.groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


WINNOW_K = 12   # char k-gram length
WINNOW_W = 6    # hashes per winnowing window
# any shared substring of length >= WINNOW_K + WINNOW_W - 1 (= 17
# normalized chars) is GUARANTEED to share at least one fingerprint


def winnowing_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                           w: int = WINNOW_W) -> DataFrame:
    """Local document fingerprints by winnowing (Schleimer, Wilkerson &
    Aiken 2003, "Winnowing: Local Algorithms for Document
    Fingerprinting" — the MOSS algorithm): hash every char k-gram of
    the whitespace-normalized lowercase text, slide a window of w
    consecutive hashes, and keep the minimum of each window. The
    selected set is position-independent: two documents sharing ANY
    substring of >= k+w-1 normalized chars share at least one
    fingerprint, whatever their alignment — the guarantee word-shingle
    LSH can't give for short verbatim runs (boilerplate lines, quoted
    passages, licence headers).

    Output: (doc_id, fp) distinct selected hashes per document.

    Cross-engine exactness: pure substring + h60 + window MIN integer
    ops. Scale: the k-gram explosion is O(total chars) behind fan_out;
    the winnowing MIN is a bounded ROWS window partitioned by doc_id
    (doc-sized partitions), then one distinct. No joins.
    """
    s = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    base = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"), s.alias("s")
    )
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than k chars must yield no grams explicitly
    positions = F.when(
        F.length("s") >= k, F.sequence(F.lit(1), F.length("s") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "doc_id", F.explode(positions).alias("p"), F.col("s")
    ).select("doc_id", "p", h60(F.expr(f"substring(s, p, {k})")).alias("gh"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.currentRow, w - 1)
    )
    n_win = Window.partitionBy("doc_id")
    return (
        grams.select(
            "doc_id", "p",
            F.min("gh").over(win).alias("fp"),
            F.count(F.lit(1)).over(n_win).alias("n_grams"),
        )
        # only COMPLETE windows select a fingerprint (the guarantee is
        # per full window; a short tail window would over-select)
        .where(F.col("p") <= F.col("n_grams") - (w - 1))
        .select("doc_id", "fp")
        .distinct()
    )


def substring_dup_pairs(docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W,
                        min_shared: int = 10,
                        max_fp_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """Exact-substring near-duplicate pairs via shared winnowing
    fingerprints — the alignment-free form of "these two documents
    contain the same verbatim run" (Lee et al. 2021's exact-substring
    dedup motivation, with winnowing standing in for the suffix array,
    which has no distributed formulation at this cost).

    Output: (doc_a, doc_b, n_shared_fp) for doc_a < doc_b with at
    least ``min_shared`` shared fingerprints, ordered by
    (n_shared_fp desc, doc_a, doc_b). On the synthetic corpus the
    shared-fp histogram is sharply bimodal — true near-dup pairs carry
    20-50 shared fingerprints, grid coincidences over the small
    synthetic vocabulary 1-9 — and the default threshold of 10 sits in
    the gap.

    Scale: the pair join is keyed on the fingerprint hash, so cost is
    sum of per-fp n^2 — and a corpus-wide boilerplate fingerprint
    (every doc sharing one licence line) would make one bucket
    quadratic in the corpus: ``max_fp_bucket`` is the same logged
    drop-guard the LSH band buckets use (None = exhaustive, what the
    oracle entry passes). The groupBy is map-side combinable.
    """
    from tickdatapipeline_spark.operators.globalorder import pin

    fps = winnowing_fingerprints(docs, k, w)
    if max_fp_bucket is not None:
        fps = cap_group_sizes(pin(fps), ["fp"], max_fp_bucket,
                              "substring_dup_pairs", "max_fp_bucket", logger)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .where(F.col("n_shared_fp") >= min_shared)
        .orderBy(F.desc("n_shared_fp"), "doc_a", "doc_b")
    )


def minhash_jaccard_calibration(docs: DataFrame, num_perm: int = NUM_PERM,
                                max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET
                                ) -> DataFrame:
    """Sketch-accuracy calibration: for every LSH candidate pair, the
    minhash ESTIMATE of Jaccard (matching-lane share, the statistic the
    sketch actually measures) next to the exact shingle Jaccard and the
    absolute estimation error — the per-pair evidence behind choosing
    NUM_PERM/BAND_SIZE, the sketch-side companion of
    ``dedup_threshold_sweep`` (which calibrates the THRESHOLD on exact
    similarities) and of the ANN family's recall@k queries.

    Exactness: n_match is a BIGINT lane count; the estimate divides by
    num_perm = 64 (a power of two — the division is exact in binary);
    the exact jaccard is the shared rnd'd ratio; the error is one
    correctly-rounded subtraction. Bit-identical cross-engine.

    Scale: rides the existing sub-DAGs — the wide-signature aggregate
    (one row per doc), the band-bucket candidate join (with the same
    ``max_band_bucket`` skew guard), and the hashed-shingle overlap
    count; the lane comparison joins one 64-slot array per side keyed
    on doc id, never exploding lanes into rows."""
    from tickdatapipeline_spark.operators.globalorder import pin

    cand = pin(lsh_candidate_pairs(docs, num_perm, BAND_SIZE, max_band_bucket))
    exact = jaccard_pairs(docs, 0.0, candidates=cand)
    arr = _minhash_wide(docs, num_perm).select(
        "doc_id", F.array(*[F.col(f"s{j}") for j in range(num_perm)]).alias("sig_arr")
    )
    m = (
        cand.join(arr.select(F.col("doc_id").alias("doc_a"),
                             F.col("sig_arr").alias("arr_a")), "doc_a")
        .join(arr.select(F.col("doc_id").alias("doc_b"),
                         F.col("sig_arr").alias("arr_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.aggregate(
                F.zip_with("arr_a", "arr_b",
                           lambda x, y: (x == y).cast("long")),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("n_match"),
        )
    )
    est = F.col("n_match").cast("double") / F.lit(float(num_perm))
    return (
        m.join(exact.select("doc_a", "doc_b", "jaccard"), ["doc_a", "doc_b"])
        .select(
            "doc_a", "doc_b", "n_match", est.alias("est_jaccard"), "jaccard",
            F.abs(est - F.col("jaccard")).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


def cluster_aware_split(docs: DataFrame, val_permille: int = 50,
                        test_permille: int = 50, threshold: float = 0.5,
                        salt: str = "split:",
                        max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET
                        ) -> DataFrame:
    """Group-aware train/val/test split: the split draw hashes the
    document's near-dup CLUSTER representative instead of the document
    itself, so a near-dup cluster can never straddle splits — the fix
    for exactly the leak ``docs_split_leakage`` audits (a per-doc
    random split scatters every cluster with probability ~1).
    Singletons hash their own id, so outside clusters this IS
    train_val_test_split: same salt, same bands, same stability
    contract (adding/removing docs never migrates an unrelated doc).

    Output: (doc_id, cluster_id, split) for every document.

    Scale: the expensive part is duplicate_clusters (already bounded:
    LSH candidates + min-label propagation); the split itself is one
    map-side hash on the cluster id after a left join of the corpus
    against the (small — dup members only) cluster table."""
    if min(val_permille, test_permille) < 0 or val_permille + test_permille >= 1000:
        raise ValueError(
            "val_permille and test_permille must be >= 0 and sum to < 1000"
        )
    members = duplicate_clusters(
        docs, threshold, max_band_bucket=max_band_bucket
    ).select("doc_id", "cluster_id")
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    labeled = base.join(members, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    draw = h60(F.concat(F.lit(salt), F.col("cluster_id").cast("string"))) % 1000
    return labeled.select(
        "doc_id", "cluster_id",
        F.when(draw < test_permille, F.lit("test"))
        .when(draw < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def weighted_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                           max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET
                           ) -> DataFrame:
    """IDF-weighted Jaccard verification: like jaccard_pairs, but every
    shingle counts with weight N_docs // df(shingle) — two documents
    sharing only boilerplate (shingles in half the corpus, weight ~2)
    score far lower than two sharing rare content (weight ~N), the
    standard fix for template-heavy corpora where plain Jaccard
    over-merges around shared headers/footers.

    Exactness: weights are BIGINT integer divisions; intersection and
    union masses are BIGINT sums; the score is ONE final division.
    Weight overflow is structural: sum of weights <= n_shingles * N
    <= 2^62 for any corpus this engine's int64 money/count conventions
    already assume.

    Output: (doc_a, doc_b, inter_w, union_w, wjaccard) for LSH
    candidates with wjaccard >= threshold.

    Scale: candidates come from the same capped LSH band join; df is
    one map-side-combinable groupBy on the hashed gram (the same g
    keys the verification join shuffles anyway — no broadcast of a
    vocabulary-sized table)."""
    from tickdatapipeline_spark.operators.globalorder import pin

    hsh = pin(hashed_shingles(docs))  # df aggregate + both join sides + sizes
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    dfreq = hsh.groupBy("g").agg(F.countDistinct("doc_id").alias("df"))
    wg = dfreq.join(F.broadcast(n_docs)).select(
        "g", F.expr("n DIV df").alias("w"))
    hw = hsh.join(wg, "g")  # (doc_id, g, w)
    sizes = hw.groupBy("doc_id").agg(F.sum("w").alias("w_mass"))
    cand = lsh_candidate_pairs(docs, max_band_bucket=max_band_bucket)
    a = hw.select(F.col("doc_id").alias("doc_a"), "g", "w")
    b = hw.select(F.col("doc_id").alias("b_doc"), F.col("g").alias("gb"))
    inter = (
        cand.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("b_doc")) & (F.col("g") == F.col("gb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("w").alias("inter_w"))
    )
    out = (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("w_mass").alias("wa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("w_mass").alias("wb")), "doc_b")
        .select(
            "doc_a", "doc_b", "inter_w",
            (F.col("wa") + F.col("wb") - F.col("inter_w")).alias("union_w"),
        )
        .withColumn("wjaccard",
                    rnd(F.col("inter_w").cast("double")
                        / F.col("union_w").cast("double"), 6))
        .where(F.col("wjaccard") >= threshold)
        .select("doc_a", "doc_b", "inter_w", "union_w", "wjaccard")
    )
    return out


def pagerank_scores(pairs: DataFrame, a_col: str, b_col: str,
                    iters: int = 5, scale: int = 10**12) -> DataFrame:
    """Integer-exact PageRank over an undirected pair list (damping
    0.85, ``iters`` fixed power iterations) — see
    plans/beyond.pagerank_fn for the full rationale. All arithmetic is
    scaled-integer with non-negative floor division, so the result is
    bit-reproducible across engines and partitionings (no float sum
    order anywhere). Output: (node, degree, pagerank_e12) for every
    node appearing in a pair.

    Same iteration hygiene as connected_components: edges/base
    materialize once and each iteration's rank frame localCheckpoints
    (DISK_ONLY), keeping every iteration's plan O(1) deep.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    deg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = (
        deg.join(F.broadcast(nn)).select(
            "node",
            "deg",
            F.expr(f"CAST({scale} AS BIGINT) DIV n_nodes").alias("r"),
            F.expr(f"(15 * CAST({scale} AS BIGINT)) DIV (100 * n_nodes)").alias("tele"),
        )
    ).localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    ranks = base
    for _ in range(iters):
        shares = ranks.select("node", F.expr("r DIV deg").alias("share"))
        contrib = (
            edges.join(shares, edges.src == shares.node)
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            base.select("node", "deg", "tele")
            .join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                "tele",
                F.expr("tele + ((85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100)").alias("r"),
            )
        ).localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    return ranks.select(
        "node",
        F.col("deg").alias("degree"),
        F.col("r").alias("pagerank_e12"),
    )


def lpa_communities(pairs: DataFrame, a_col: str, b_col: str,
                    iters: int = 4) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007) over an undirected pair list: every node starts labeled with
    its own id; each of ``iters`` fixed rounds relabels EVERY node to
    its neighbors' most frequent label, ties broken by SMALLEST label
    — all counting, no randomness, no floats, so the result is
    bit-reproducible across engines and partitionings (the classic
    algorithm's random visit order is the one thing dropped; fixed
    synchronous rounds + min-label ties are the standard deterministic
    variant). Unlike connected components (membership = reachability),
    LPA splits a connected blob into densely-linked COMMUNITIES — two
    template families bridged by one accidental candidate pair get
    different labels where components would merge them.

    Output: (node, community) for every node appearing in a pair.

    Scale: per round one equi-join (labels on edge src) + one
    combinable groupBy(dst, label) + a node-partitioned rank window
    over O(degree) label-count rows — never a global sort. Same
    iteration hygiene as pagerank_scores/connected_components: edges
    and each round's label frame localCheckpoint (DISK_ONLY), keeping
    every round's plan O(1) deep. Unit-pinned to a naive Python mirror
    (two cliques + bridge)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    for _ in range(iters):
        labels = _lpa_round(edges, labels).localCheckpoint(
            storageLevel=StorageLevel.DISK_ONLY)
    return labels.select("node", F.col("label").alias("community"))


def _lpa_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round: neighbor label votes -> per-node
    (count desc, label asc) rank-1. Split out so the plan-shape test
    asserts the ACTUAL round plan (the checkpointed loop's final plan
    is just a Scan ExistingRDD)."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
    nb = edges.join(
        labels.withColumnRenamed("node", "ln"), F.col("src") == F.col("ln")
    ).select(F.col("dst").alias("node"), "label")
    cnt = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("node", "label")
    )
