"""Measure the streaming twin's corpus-LANDING modes in isolation
(r12): staged (O(batch) explicit-path write; one day-close fold) vs
per-batch upsert (reads back and rewrites the whole day partition).

A first version timed whole ingest_micro_batch calls and learned only
that DEDUP dominates at test scale (~7-8 s/batch either mode, landing
invisible) — so this probe times the LANDING STEP alone: land one
1000-doc batch into a day partition pre-grown to N rows, N swept
upward. upsert cost must grow with N (it rewrites the partition);
staged must stay flat (it never reads the partition).

Usage: python scripts_dev/ingest_mode_probe.py [Ns...]   (default
10_000 100_000 400_000). Solo contract — no concurrent Spark session.
"""
from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [10_000, 100_000, 400_000]

    from pyspark.sql import functions as F

    from tickdatapipeline_spark.functions.scale import upsert_partitioned
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("ingest_mode_probe")
    spark.sparkContext.setLogLevel("ERROR")
    DAY = "2024-01-02"

    def docs(lo: int, n: int):
        return (spark.range(lo, lo + n)
                .select(F.col("id").alias("doc_id"),
                        F.concat(F.lit("text body for doc "),
                                 F.col("id").cast("string"),
                                 F.lit(" " * 120)).alias("text")))

    batch = docs(10_000_000, 1000)
    print(f"{'day rows':>10s} {'staged_s':>9s} {'upsert_s':>9s} {'fold_s':>7s}")
    for n in ns:
        root = tempfile.mkdtemp(prefix="ingest_probe_")
        corpus = f"{root}/corpus"
        live = f"{root}/corpus_live"
        # pre-grow the canonical day partition to N rows
        upsert_partitioned(spark, corpus,
                           docs(0, n).withColumn("day", F.lit(DAY)),
                           key="doc_id", part_col="day")

        t0 = time.time()
        batch.write.mode("overwrite").parquet(f"{live}/day={DAY}/batch=7")
        staged_s = round(time.time() - t0, 2)

        t0 = time.time()
        upsert_partitioned(spark, corpus,
                           batch.withColumn("day", F.lit(DAY)),
                           key="doc_id", part_col="day")
        upsert_s = round(time.time() - t0, 2)

        # the staged mode's day-close fold (one upsert of the staging)
        from tickdatapipeline_spark.delta_loop import fold_live_corpus
        t0 = time.time()
        fold_live_corpus(spark, root, DAY)
        fold_s = round(time.time() - t0, 2)

        print(f"{n:10d} {staged_s:9.2f} {upsert_s:9.2f} {fold_s:7.2f}",
              flush=True)
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
