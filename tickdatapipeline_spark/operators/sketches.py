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
  pass 2  broadcast the candidates, semi-join + exact groupBy count of
          candidates only, filter count*(k+1) > n_total exactly.

The FINAL output is therefore exact and deterministic (integer compare
against the exact total) regardless of how batches land in partitions —
partitioning only changes which non-heavy candidates get counted and
then discarded. That is what makes the operator oracle-gateable while
the sketch itself stays approximate.
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
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    counts = (
        keyed.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        counts.join(F.broadcast(total))
        .where(F.col("n_events") * (k + 1) > F.col("n_total"))
        .select(
            key_col,
            "n_events",
            F.expr("n_events * 1000000 DIV n_total").alias("share_ppm"),
        )
        .orderBy(key_col)
    )
