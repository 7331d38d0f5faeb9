"""Lexical (inverted-index) search — the exact-match complement of the
ANN family: token postings written once per corpus build, phrase
queries answered from partition-pruned posting fetches, never a corpus
rescan. Mirrors the write-once/probe-many pattern of
similarity.write_ann_index and the decontamination index."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickdatapipeline_spark.operators.text import h60, tokens

INDEX_BUCKETS = 64


BACKFILL_BATCH_ID = -1  # batch_id stamped on the bulk (non-streaming) build


def _postings(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, token, doc_id, pos) positional postings — the shared
    explode of the bulk build and the streaming ingest."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(tokens(F.col("text"))).alias("pos0", "token"),
    ).select(
        (h60(F.col("token")) % n_buckets).alias("bucket"),
        "token", "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"),
    )


def write_inverted_index(docs: DataFrame, path: str,
                         n_buckets: int = INDEX_BUCKETS) -> None:
    """Positional inverted index: one row per (token occurrence) =
    (bucket, token, doc_id, pos), written as parquet partitioned by
    ``bucket`` = h60(token) % n_buckets, then ``batch_id`` (the bulk
    build stamps BACKFILL_BATCH_ID; streaming micro-batches append
    their own partitions — see run_index_ingest).

    Scale: the build is ONE posexplode + a partitioned write (no
    shuffle beyond the write's own partitioning); bucketing by token
    hash means any query for a handful of tokens scans only those
    buckets' files — the partition-pruning contract
    phrase_search_indexed relies on, same as the ANN index's
    cell-partitioned vectors. ``bucket`` stays the FIRST partition key
    so adding batch provenance never weakens the pruning."""
    (
        _postings(docs, n_buckets)
        .withColumn("batch_id", F.lit(BACKFILL_BATCH_ID))
        .write.mode("overwrite").partitionBy("bucket", "batch_id").parquet(path)
    )


def run_index_ingest(spark: SparkSession, input_dir: str, index_path: str,
                     checkpoint_dir: str, n_buckets: int = INDEX_BUCKETS,
                     max_files_per_trigger: int = 1):
    """Live ingest for the inverted index: new documents stream in and
    each micro-batch APPENDS its postings to the existing index — no
    full rebuild — using the same (bucket, batch_id)-partitioned layout
    as the bulk build, so phrase_search_indexed sees backfill + all
    ingested batches through one read with bucket pruning intact.

    Idempotent under foreachBatch's at-least-once replay the same way
    the other streaming sinks are (streaming/eventtime.py:
    _write_batch_idempotent): the writer dynamically overwrites ONLY
    its own (bucket, batch_id=N) partitions, so a replayed batch
    rewrites the same files instead of appending duplicates.

    Deployment note: many small batches => many small files per bucket;
    compact by rewriting old batch partitions into the backfill
    partition during maintenance (same pattern as the hourly store's
    compaction in streaming/state.py) — reads stay correct throughout
    because the layout never changes."""
    raw = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        (
            _postings(batch_df, n_buckets)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "batch_id")
            .parquet(index_path)
        )

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


BM25_K1 = 1.25  # binary-exact (not the textbook 1.2: 2^-2 terms keep the
BM25_B = 0.75   # arithmetic bit-identical cross-engine; ranking-equivalent)


def bm25_topk(docs: DataFrame, terms: "list[str]", k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """BM25 ranked retrieval for a bag of query terms — the relevance
    scorer on top of the lexical index family (phrase_search gives
    exact match; this gives ranking).

    score(d) = sum_t idf_t * tf_norm_t with the rational idf variant
    idf_t = (N - df_t + 0.5) / (df_t + 0.5) (the log() of textbook BM25
    is a monotone per-term transform that is NOT bit-reproducible
    cross-engine; the raw ratio keeps the oracle exact and the ranking
    meaningful) and tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    k1/b default to binary-exact values so every double op is a
    correctly-rounded IEEE op on identical operands in both engines.

    Scale: ONE token explode serves doc lengths and term frequencies;
    tf is restricted to the query's terms before any shuffle (len(terms)
    conditional columns, no pivot shuffle); corpus stats and per-term
    dfs are a 1-row broadcast; top-k is TakeOrderedAndProject (never a
    global sort). Output: (doc_id, dl, score) — score rounded, ordering
    pinned by the UNROUNDED score then doc_id.
    """
    terms = list(dict.fromkeys(terms))
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        idf = (
            F.col("n_docs").cast("double") - F.col(f"df{i}").cast("double") + F.lit(0.5)
        ) / (F.col(f"df{i}").cast("double") + F.lit(0.5))
        tfn = (tf * F.lit(k1 + 1.0)) / (tf + norm)
        score = score + F.when(F.col(f"tf{i}") > 0, idf * tfn).otherwise(F.lit(0.0))
    from tickdatapipeline_spark.functions.rounding import rnd

    return (
        scored.withColumn("score_raw", score)
        .where(F.col("score_raw") > 0.0)
        .orderBy(F.desc("score_raw"), "doc_id")
        .limit(k)
        .select("doc_id", "dl", rnd(F.col("score_raw"), 6).alias("score"))
    )


def compact_index(spark: SparkSession, src_path: str, dst_path: str) -> None:
    """Maintenance compaction for a live-ingested index: fold the
    backfill partition plus every streamed batch partition into ONE
    backfill partition per bucket at ``dst_path`` — the answer to the
    many-small-files drift of per-micro-batch appends (the pattern
    noted in run_index_ingest). The caller swaps dst for src when the
    write completes (a rename at the catalog/path level), so readers
    never see a half-compacted index; reads stay correct throughout
    because both layouts are identical.

    Scale: repartition on bucket means each bucket's postings land in
    exactly one task => exactly one output file per bucket; no data
    transformation, just a layout rewrite."""
    idx = spark.read.parquet(src_path)
    (
        idx.select("bucket", "token", "doc_id", "pos")
        .repartition(F.col("bucket"))
        .withColumn("batch_id", F.lit(BACKFILL_BATCH_ID))
        .write.mode("overwrite").partitionBy("bucket", "batch_id").parquet(dst_path)
    )


def phrase_search_indexed(spark: SparkSession, index_path: str, phrase: str,
                          n_buckets: int = INDEX_BUCKETS) -> DataFrame:
    """Exact phrase search from the inverted index: adjacent-position
    postings intersection — word i must appear at pos = pos_1 + (i-1)
    in the same doc.

    Output: (doc_id, n_occurrences, first_pos), ascending doc_id —
    identical to the direct corpus-scan formulation
    (plans/beyond.py::phrase_search_fn), which is the oracle-gated
    twin; the index path exists so a 100 TB corpus answers phrase
    queries from a few bucket partitions instead of a full scan.

    Scale: the scan carries bucket IN (<=len(phrase) values) — a
    partition filter, so only the phrase's buckets are read; the
    adjacency joins are equi-joins on (doc_id, pos) over single-token
    postings."""
    words = phrase.lower().split()
    if not words:
        raise ValueError("empty phrase")
    idx = spark.read.parquet(index_path)
    import hashlib

    def bucket_of(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[17:], 16) % n_buckets

    buckets = sorted({bucket_of(w) for w in words})
    idx = idx.where(F.col("bucket").isin(buckets))
    first = (
        idx.where(F.col("token") == words[0])
        .select("doc_id", F.col("pos").alias("start_pos"))
    )
    cur = first
    for i, w in enumerate(words[1:], start=1):
        nxt = idx.where(F.col("token") == w).select(
            F.col("doc_id").alias("d"), F.col("pos").alias("p"))
        cur = cur.join(
            nxt,
            (F.col("doc_id") == F.col("d"))
            & (F.col("p") == F.col("start_pos") + i),
        ).select("doc_id", "start_pos")
    return (
        cur.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"),
             F.min("start_pos").alias("first_pos"))
        .orderBy("doc_id")
    )
