"""Isolate the live-ingest EMBEDDING-PROBE term, exact vs ADC (r13
verdict #4): the lifecycle probe's ingest wall time mixes the probe
with the append side (with pq=True every append also pq_encodes the
keepers and writes codes into ~sqrt(N) cell partitions — hundreds of
small files at test scale), so an ingest-level A/B cannot attribute a
delta to the probe. This script builds ONE pq=True index, then times
ONLY `embedding_dedup_against_index` on a fixed 1k batch with
use_adc=False vs True, warmed min-of-3, same session, and asserts the
kept counts match.

Usage: python scripts_dev/adc_probe_ab.py [N] [dim]   (default
200000 64). Solo contract — no concurrent Spark session.
"""
from __future__ import annotations

import math
import shutil
import sys
import time

sys.path.insert(0, ".")

BATCH = 1_000
TMP = "/tmp/.adc_probe_ab"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.similarity import (
        embedding_dedup_against_index, write_ann_index)
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("adc_probe_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def emb(src):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.pmod(F.hash(src * 64 + d), F.lit(2001))
                       .cast("double") / F.lit(1000.0) - F.lit(1.0)))

    def vecs(lo, cnt, dup_base=None):
        d = spark.range(lo, lo + cnt).select(F.col("id").alias("vec_id"))
        src = F.col("vec_id")
        if dup_base:  # first 10% duplicate a base vector exactly
            src = F.when(F.col("vec_id") < lo + cnt // 10,
                         F.pmod(F.col("vec_id"), F.lit(dup_base))
                         ).otherwise(src)
        return d.select("vec_id", emb(src).alias("embedding"))

    shutil.rmtree(TMP, ignore_errors=True)
    t0 = time.time()
    write_ann_index(vecs(0, n), TMP, n_cells=max(8, math.isqrt(n)),
                    pq=True)
    print(f"index build (pq=True, n={n}, dim={dim}, "
          f"n_cells={max(8, math.isqrt(n))}): {time.time() - t0:.1f}s")

    batch = vecs(10_000_000, BATCH, dup_base=n)
    for arm in (False, True):
        kept = None
        best = math.inf
        for _ in range(3):
            t0 = time.time()
            kept = embedding_dedup_against_index(
                batch, TMP, use_adc=arm).count()
            best = min(best, time.time() - t0)
        print(f"probe use_adc={arm!s:5s}: {best:7.2f}s  "
              f"(kept {kept}/{BATCH})")
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
