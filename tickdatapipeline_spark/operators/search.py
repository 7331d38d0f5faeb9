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


def write_inverted_index(docs: DataFrame, path: str,
                         n_buckets: int = INDEX_BUCKETS) -> None:
    """Positional inverted index: one row per (token occurrence) =
    (bucket, token, doc_id, pos), written as parquet partitioned by
    ``bucket`` = h60(token) % n_buckets.

    Scale: the build is ONE posexplode + a partitioned write (no
    shuffle beyond the write's own partitioning); bucketing by token
    hash means any query for a handful of tokens scans only those
    buckets' files — the partition-pruning contract
    phrase_search_indexed relies on, same as the ANN index's
    cell-partitioned vectors."""
    postings = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(tokens(F.col("text"))).alias("pos0", "token"),
    ).select(
        (h60(F.col("token")) % n_buckets).alias("bucket"),
        "token", "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"),
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)


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
