"""PQ re-rank uplift at sf0.1 with an R-sweep (r11 verdict #6; re-run
r13 under the TRAINED 16x32 codebooks — r12 verdict #1).

The r11 sf0.01 measurement of the exact re-rank's recall@5 uplift
(0.08 -> 0.10, 4 -> 5 hits of 50 queries) was noise-level — too few
queries to justify the RERANK_R=15 default. This probe re-measures at
sf0.1 (10x the corpus, ~10x the query set at QUERY_MOD=50) for the raw
``pq`` arm and the ``pq_rerank`` arm at R in {5, 15, 50}, against the
brute-force exact top-5.

r13 note: the codebook-shape grid that chose PQ_M=16/PQ_K=32 and
default-on training is in PERF.md r13 (trained 16x32: raw 0.28,
rerank-50 0.735; the r12 untrained 4x8 shape capped at 0.140).

Usage: python scripts_dev/rerank_sweep.py [sf_dir]
Prints a COVERAGE.md-ready table; takes a few minutes (one exact
brute-force pass + 4 ANN passes, solo contract — do not run another
Spark session concurrently).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.globalorder import pin
    from tickdatapipeline_spark.operators.similarity import (
        ann_recall,
        ann_rerank,
        ann_topk_pq,
        ann_topk_pq_adc,
        cosine_topk,
    )
    from tickdatapipeline_spark.plans.beyond import QUERY_MOD, TOPK_K
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("rerank_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = pin(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    n = emb.count()
    exact = pin(cosine_topk(emb, TOPK_K, QUERY_MOD))
    n_q = exact.select("query_id").distinct().count()
    print(f"corpus {n} vectors, {n_q} queries (query_mod={QUERY_MOD}), "
          f"k={TOPK_K}")

    def measure(name, df):
        t0 = time.time()
        rec = ann_recall(pin(df), exact).agg(
            F.sum("n_hit").alias("h"), F.sum("n_exact").alias("e"),
            F.avg("recall").alias("r")).first()
        print(f"| {name:14s} | {rec['h']:5d}/{rec['e']:5d} "
              f"| {rec['r']:.4f} | {time.time() - t0:6.1f}s |")
        return rec["r"]

    print("\n| arm            | hits        | recall@5 | wall |")
    print("|---|---|---|---|")
    measure("pq", ann_topk_pq(emb, TOPK_K, QUERY_MOD))
    for r in (5, 15, 50):
        measure(f"pq_rerank R={r}",
                ann_rerank(ann_topk_pq(emb, r, QUERY_MOD), emb, TOPK_K))
    # r13: the deployment-best recipe — ADC candidates (raw query vs
    # reconstructed corpus) + exact re-rank of the top R
    measure("pq_adc", ann_topk_pq_adc(emb, TOPK_K, QUERY_MOD))
    for r in (15, 50):
        measure(f"adc_rerank R={r}",
                ann_rerank(ann_topk_pq_adc(emb, r, QUERY_MOD), emb, TOPK_K))


if __name__ == "__main__":
    main()
