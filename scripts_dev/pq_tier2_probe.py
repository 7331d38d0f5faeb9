"""Tier-2 growth factors for the trained-PQ surface (r13 verdict #5):
`pq_train` itself and the ADC panels (`ann_topk_pq_adc`, the composed
adc_rerank recipe) timed at sf0.1 AND at 10x vectors, with recall@5
against the exact brute-force top-k at each tier.

Claims under test:

- pq_train with the r14 deterministic sample bound (train_sample_mod:
  the per-iteration assignment scan caps at ~max(100*k, 1e5) rows) is
  ~FLAT in corpus size once past the cap — 10x vectors should not pay
  10x training.
- the ADC panels score query x corpus pairs against the reconstructed
  corpus; with the query set held at ~N_QUERIES by scaling query_mod,
  10x vectors costs ~10x pair work (linear, not quadratic).
- recall@5 at 10x stays in the band the sf0.1 rerank_sweep justified
  (codebook capacity is per-subspace, not per-corpus — more vectors
  per code cell degrades reconstruction slowly, not off a cliff).

Tier-2 data: bench_tier2's verbatim 10x embedding replication is
DEGENERATE for recall (each query's exact top-5 are its own identical
copies, which every arm finds — first run of this probe read 1.000
across the board), so this probe builds its own 10x set with a
deterministic +-5% per-copy perturbation (copies become near-dups,
not exact dups; the neighbor structure is non-trivial again) under
/tmp/spark_graft_tier2_pq, built once and reused.

Usage: python scripts_dev/pq_tier2_probe.py
Prints a PERF.md-ready table. Solo contract — no concurrent Spark
session (the exact brute-force pass at tier2 is the heavy step).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, str(Path(__file__).resolve().parent))

N_QUERIES = 40  # held FIXED across tiers (query_mod scales with the
# corpus): the factors then isolate corpus growth — 10x vectors with a
# fixed query set should cost the panels ~10x pair work — and the
# recall column stays sample-for-sample comparable to the r13
# rerank_sweep table (sf0.1, query_mod=50, 40 queries)


def main() -> None:
    from pyspark.sql import functions as F

    from bench_tier2 import SF_DIR
    from tickdatapipeline_spark.operators.globalorder import pin
    from tickdatapipeline_spark.operators.similarity import (
        ann_recall,
        ann_rerank,
        ann_topk_pq_adc,
        cosine_topk,
        pq_train,
    )
    from tickdatapipeline_spark.plans.beyond import TOPK_K
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("pq_tier2_probe")
    spark.sparkContext.setLogLevel("ERROR")

    tier2_pq = "/tmp/spark_graft_tier2_pq"
    if not Path(f"{tier2_pq}/_READY").exists():
        base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        n0 = base.count()
        copies = F.broadcast(
            spark.range(10).select(F.col("id").alias("copy")))
        # the perturbation hash MUST mix in the copy number (the
        # copy-offset id), or all 10 copies perturb identically and
        # stay exact dups
        new_id = F.col("vec_id") + F.col("copy") * 10_000_000
        (base.crossJoin(copies).select(
            new_id.alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x * (
                    F.lit(1.0)
                    + F.pmod(F.hash(new_id * 977 + i),
                             F.lit(101)).cast("double") / F.lit(1000.0)
                    - F.lit(0.05))).alias("embedding"))
         .repartition(32).write.mode("overwrite")
         .parquet(f"{tier2_pq}/embeddings.parquet"))
        assert spark.read.parquet(
            f"{tier2_pq}/embeddings.parquet").count() == 10 * n0
        Path(f"{tier2_pq}/_READY").touch()

    # warm codegen/JIT on the tiny sf so the sf01 train_s column times
    # the training, not first-call compilation (first run of this
    # probe read train 12.2 s at sf01 vs 6.6 s at tier2 — warmup, not
    # work)
    tiny = pin(spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"))
    pq_train(tiny)
    ann_rerank(ann_topk_pq_adc(tiny, 50, 50), tiny, TOPK_K).write \
        .format("noop").mode("overwrite").save()

    print("| tier | vectors | queries | train_s | adc_panel_s "
          "| adc_recall@5 | adc_rerank50_s | rerank50_recall@5 |")
    print("|---|---|---|---|---|---|---|---|")
    rows = {}
    for tier, d in (("sf01", SF_DIR), ("tier2", tier2_pq)):
        emb = pin(spark.read.parquet(f"{d}/embeddings.parquet"))
        n = emb.count()
        mod = max(50, n // N_QUERIES)
        t0 = time.time()
        pq_train(emb)
        t_train = time.time() - t0
        exact = pin(cosine_topk(emb, TOPK_K, mod))
        n_q = exact.select("query_id").distinct().count()

        def measure(df):
            t0 = time.time()
            r = ann_recall(pin(df), exact).agg(
                F.avg("recall").alias("r")).first()["r"]
            return time.time() - t0, r

        t_adc, r_adc = measure(ann_topk_pq_adc(emb, TOPK_K, mod))
        t_rr, r_rr = measure(
            ann_rerank(ann_topk_pq_adc(emb, 50, mod), emb, TOPK_K))
        rows[tier] = (n, t_train, t_adc, t_rr)
        print(f"| {tier} | {n} | {n_q} | {t_train:.1f} | {t_adc:.1f} "
              f"| {r_adc:.3f} | {t_rr:.1f} | {r_rr:.3f} |")
    f = [round(rows["tier2"][i] / rows["sf01"][i], 2) for i in (1, 2, 3)]
    print(f"10x factors: train {f[0]}x, adc_panel {f[1]}x, "
          f"adc_rerank50 {f[2]}x")


if __name__ == "__main__":
    main()
