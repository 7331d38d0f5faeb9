"""Bounded-memory frequency sketches: Misra-Gries heavy hitters.

The reference has no sketch surface (its whole state is one
mutable struct per stream, `/root/reference/src/TickHotLoopF32.jl:53-83`);
this module is part of the beyond-reference large-corpus toolkit: the
"which keys dominate?" question a 100 TB event table answers BEFORE
shipping a user-keyed join (see `plans/beyond.key_skew_profile` for the
distribution-shape diagnostic; this one names the keys).

Why not just groupBy(key).count() and filter? At 100 TB with ~1e10
distinct keys the full count table is itself a shuffle of 1e10 rows —
99.99% of which are about keys that cannot possibly be heavy. The
classic two-pass answer (Misra & Gries 1982; mergeable-summaries
framing in Agarwal et al., PODS 2012):

  pass 1  per-partition Misra-Gries summaries of at most k counters
          (bounded memory, NO shuffle) -> candidate key set. Any key
          with GLOBAL count > n/(k+1) is locally heavy in at least one
          partition (sum(count_p) > sum(n_p)/(k+1) forces some
          count_p > n_p/(k+1)), and an MG summary with k counters
          retains every key with count_p > n_p/(k+1). So the candidate
          union is a SUPERSET of the true heavy hitters — tiny:
          at most k keys per partition.
  pass 2  broadcast the candidates and, in the SAME scan, count each
          candidate exactly while folding every non-candidate row into
          one null bucket — the exact total is the sum of the tiny
          grouped result, so no third full pass exists; filter
          count*(k+1) > n_total exactly.

The FINAL output is therefore exact and deterministic (integer compare
against the exact total) regardless of how batches land in partitions —
partitioning only changes which non-heavy candidates get counted and
then discarded. That is what makes the operator oracle-gateable while
the sketch itself stays approximate.

Candidate-set size is k PER INPUT PARTITION, not k: at ~1e5 scan
splits and k=100 the distinct union can reach ~1e7 keys, and the
broadcast in pass 2 carries all of them. Deployments at that split
count either coalesce the input before pass 1 (MG merges across
whatever partitioning it gets; fewer, larger partitions = strictly
smaller candidate unions at the same guarantee) or raise k only with
the broadcast budget in mind — the n/(k+1) superset guarantee is per
GLOBAL count either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (<= k per partition).

    Arrow-batched: each batch folds in as an EXACT value_counts (itself
    a trivially-valid MG summary), merged with the vectorized MG merge
    (add counts; if more than k survive, subtract the (k+1)-th largest
    count from all and drop the non-positive) — the mergeable-summaries
    operation that preserves the n_p/(k+1) error bound across batches.
    The per-batch work is two vectorized pandas ops; the cross-batch
    carry is the true recurrence that justifies the Python kernel.

    Input must be non-null (filter upstream); output is the candidate
    key column only, at most k rows per input partition.
    """
    schema = StructType([StructField(key_col, LongType(), False)])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            s = pdf[key_col].value_counts()
            acc = acc.add(s, fill_value=0)
            if len(acc) > k:
                kth = acc.nlargest(k + 1).iloc[-1]
                acc = acc[acc - kth > 0] - kth
        yield pd.DataFrame({key_col: acc.index.to_numpy(dtype="int64")})

    return df.select(key_col).mapInPandas(kernel, schema=schema)


def exact_heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact heavy hitters: every key with count > n_total/(k+1),
    found without ever shuffling the full per-key count table.

    Output: (key, n_events BIGINT, share_ppm BIGINT) — share_ppm is
    the exact integer-ppm share (count * 1e6 DIV n_total; non-negative
    DIV is floor in both Spark and DuckDB). Null keys are excluded
    (a null cannot be a nameable heavy key; the count histogram
    diagnostics handle null-rate separately).
    """
    keyed = df.where(F.col(key_col).isNotNull()).select(key_col)
    cands = misra_gries_candidates(keyed, key_col, k).distinct()
    # ONE counting scan for both the candidate counts AND the exact
    # total: a broadcast left join marks candidate rows, the groupBy
    # folds every non-candidate into a single null bucket (map-side
    # combinable), and the total is the sum of the tiny grouped
    # result — two full passes overall (MG + this), never three
    bucketed = (
        keyed.join(
            F.broadcast(cands.withColumn("_is_cand", F.lit(True))),
            key_col, "left")
        .groupBy(
            F.when(F.col("_is_cand"), F.col(key_col)).alias(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # the exact total = sum over the tiny grouped frame (candidates +
    # the one null bucket): an unpartitioned window over O(candidates)
    # rows, never a second pass over the input
    from pyspark.sql import Window

    n_total = F.sum("n_events").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        bucketed.withColumn("n_total", n_total)
        .where(F.col(key_col).isNotNull())
        .where(F.col("n_events") * (k + 1) > F.col("n_total"))
        .select(
            key_col,
            "n_events",
            F.expr("n_events * 1000000 DIV n_total").alias("share_ppm"),
        )
        .orderBy(key_col)
    )
