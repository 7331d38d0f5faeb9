"""Dedup-chain scale probe: LSH candidates -> containment -> decontam.

Replicates the sf0.1 documents table K times with per-copy token
perturbation (every token prefixed ``c<copy>``), so each copy keeps the
ORIGINAL corpus's natural near-dup structure but copies share no
shingles — corpus size scales Kx while dup density stays constant.
That isolates the scaling question the probe answers ("does the
band-join sub-DAG stay linear in corpus size?") from the separate
worst-case-dup-density question the round-2/round-4 probes measured
with straight replication.

The three stages run with the DEPLOYMENT defaults (finite band caps,
logging enabled) — exactly the 100 TB posture, unlike the exhaustive
(cap=None) oracle-gated entries. Replicas are materialized to parquet
first so timings measure the dedup chain, not the replication regex.

Usage: python scripts_dev/dedup_scale_probe.py [copies ...]  (default: 50 200)
"""

from __future__ import annotations

import logging
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
DOC_OFFSET = 10_000_000  # doc_id namespace per copy (sf0.1 has 5K docs)


def main() -> None:
    copies_list = [int(a) for a in sys.argv[1:]] or [50, 200]

    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.dedup import (
        containment_pairs,
        cross_corpus_contamination,
        lsh_candidate_pairs,
    )
    from tickdatapipeline_spark.plans.beyond import (
        CONTAINMENT_THRESHOLD,
        DECON_EVAL_MOD,
        JACCARD_THRESHOLD,
    )
    from tickdatapipeline_spark.session import get_spark

    logging.basicConfig(level=logging.WARNING)  # surface the skew-guard logs
    spark = get_spark("dedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    for copies in copies_list:
        work = tempfile.mkdtemp(prefix=f"dedup_probe_{copies}x_")
        rep = (
            base.crossJoin(F.broadcast(spark.range(copies).select(F.col("id").alias("copy"))))
            .select(
                (F.col("doc_id") + F.col("copy") * DOC_OFFSET).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"([A-Za-z0-9]+)",
                    F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("$1")),
                ).alias("text"),
                "lang", "source",
            )
        )
        rep.repartition(32).write.mode("overwrite").parquet(f"{work}/documents.parquet")
        docs = spark.read.parquet(f"{work}/documents.parquet")
        n = docs.count()
        print(f"\n=== {copies}x corpus: {n:,} docs (deployment-default caps) ===")

        stages = {
            "lsh_candidates": lambda d: lsh_candidate_pairs(d),
            "containment_pairs": lambda d: containment_pairs(d, CONTAINMENT_THRESHOLD),
            "decontaminate": lambda d: cross_corpus_contamination(
                d.where(F.col("doc_id") % DECON_EVAL_MOD != 0),
                d.where(F.col("doc_id") % DECON_EVAL_MOD == 0),
                JACCARD_THRESHOLD,
            ),
        }
        for tag, fn in stages.items():
            out = fn(docs)
            t0 = time.time()
            rows = out.count()
            dt = time.time() - t0
            plan = out._jdf.queryExecution().executedPlan().toString()
            single = plan.count("SinglePartition")
            print(f"{tag:<20} {dt:7.2f} s  {rows:>10,} rows  "
                  f"{n / dt / 1e3:6.1f} K docs/s  SinglePartition x{single}")
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
