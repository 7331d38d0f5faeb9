"""Tier-2 growth factors for the r12 lifecycle surface (r12 verdict
#5): `ingest_micro_batch` end-to-end, `fold_live_corpus`, and
`compact_warehouse` under 10x sweeps of their governing dimension.

Claims under test (delta_loop.py docstrings):

- ingest_micro_batch is O(batch): a FIXED batch against a 10x/100x
  larger indexed corpus should grow only with the index-probe I/O
  (columnar band/vector scans), never with corpus signature work;
  a 10x larger batch at fixed corpus pays ~10x (the batch-side
  minhash/probe work is linear).
- fold_live_corpus is O(day): folding a 10x larger staged day costs
  ~10x (one read + one partition upsert).
- compact_warehouse is O(corpus) BY DEFINITION (it rebuilds both
  indexes); the probe checks the factor stays ~linear — a
  super-linear term would mean an accidental self-join somewhere in
  the rebuild.

All data is built with DISTRIBUTED expressions (spark.range + token /
embedding arithmetic, 10% planted near-dups of base docs), never
driver-side lists, so the probe itself scales. Solo contract — no
concurrent Spark session.

Usage: python scripts_dev/lifecycle_scale_probe.py [base_sizes...]
(default 2000 20000 200000). Pass ``--sqrt-cells`` to bootstrap each
warehouse with n_cells ~ sqrt(N) instead of the IVF_CELLS toy default
— reproduces the r13 finding that the ANN probe's
probes x nprobe x N/n_cells pair count dominates ingest once the
corpus outgrows the default quantizer (PERF.md r13: 80 s -> 20 s at
N=200 K). Pass ``--pq`` (r14, r13 verdict #4) to bootstrap with
trained PQ codebooks so every ingest's embedding probe runs the ADC
path (codes-table candidate scoring + exact verify of the rerank
candidates) instead of exact cosine folds over the probed cells; run
the same bases with and without it and compare secs at what must be
IDENTICAL kept counts. Paste the table into PERF.md.
"""
from __future__ import annotations

import math
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

TMP = Path("/tmp/.lifecycle_probe")
BATCH = 1_000
DIM = 64  # --dim N overrides (the ADC-vs-exact crossover is dim-driven:
# the exact probe folds dim doubles per candidate pair, the ADC probe
# gcd(dim, PQ_M) map-gets — production text embeddings are 768-1536d)


def main() -> None:
    args = sys.argv[1:]
    sqrt_cells = "--sqrt-cells" in args
    use_pq = "--pq" in args
    # --ingest-only: just the corpus-axis ingest rows (the A/B arm a
    # --pq comparison needs) — fold/compact factors are unchanged by
    # the probe mode and already recorded in PERF.md
    ingest_only = "--ingest-only" in args
    global DIM
    for a in args:
        if a.startswith("--dim="):
            DIM = int(a.split("=", 1)[1])
    bases = [int(s) for s in args if not s.startswith("--")] \
        or [2_000, 20_000, 200_000]

    from pyspark.sql import functions as F

    from tickdatapipeline_spark.delta_loop import (
        compact_warehouse, fold_live_corpus, ingest_micro_batch,
        run_daily_delta)
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("lifecycle_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def _text(src):
        # 30 deterministic pseudo-random tokens from a 5000-word vocab
        return F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.concat(F.lit("w"), F.pmod(
                F.hash(src * 31 + j), F.lit(5000)).cast("string"))))

    def _emb(src):
        return F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (F.pmod(F.hash(src * 64 + d), F.lit(2001))
                       .cast("double") / F.lit(1000.0) - F.lit(1.0)))

    def docs_df(lo, n, dup_base=None):
        """n docs with ids [lo, lo+n); when dup_base is set, the first
        10% near-duplicate a base doc (same tokens, one appended)."""
        d = spark.range(lo, lo + n).select(F.col("id").alias("doc_id"))
        if dup_base:
            src = F.when(F.col("doc_id") < lo + n // 10,
                         F.pmod(F.col("doc_id"), F.lit(dup_base))
                         ).otherwise(F.col("doc_id"))
            txt = F.when(F.col("doc_id") < lo + n // 10,
                         F.concat(_text(src), F.lit(" MUT"))
                         ).otherwise(_text(src))
        else:
            txt = _text(F.col("doc_id"))
        return d.select("doc_id", txt.alias("text"),
                        _emb(F.col("doc_id")).alias("embedding"))

    print(f"{'axis':28s} {'size':>9s} {'secs':>8s} {'factor':>7s}")
    # ---------- corpus axis: fixed 1k batch vs 10x indexed corpus ----
    prev = None
    whs = {}
    for b in bases:
        wh = TMP / f"wh_{b}"
        shutil.rmtree(wh, ignore_errors=True)
        base = docs_df(0, b)
        kw = {"n_cells": max(8, int(math.isqrt(b)))} if sqrt_cells else {}
        if use_pq:
            kw["pq"] = True
        run_daily_delta(spark, base.drop("embedding"),
                        base.select(F.col("doc_id").alias("vec_id"),
                                    "embedding"),
                        str(wh), "2024-01-01", **kw)
        whs[b] = wh
        batch = docs_df(10_000_000, BATCH, dup_base=b)
        t0 = time.time()
        c = ingest_micro_batch(batch, 0, str(wh), "2024-01-02")
        dt = time.time() - t0
        f = f"{dt / prev:6.2f}x" if prev else "      -"
        prev = dt
        axis = "ingest_1k_vs_corpus" + ("_adc" if use_pq else "") \
            + (f"_d{DIM}" if DIM != 64 else "")
        print(f"{axis:28s} {b:9d} {dt:8.2f} {f}"
              f"   (kept {c['n_kept']}/{BATCH})")
    if ingest_only:
        for wh in whs.values():
            shutil.rmtree(wh, ignore_errors=True)
        return

    # ---------- day axis: 10x batch at fixed mid corpus --------------
    # distinct batch_ids + disjoint doc_id ranges per measurement: the
    # same (batch_id, range) twice would overwrite the first run's
    # subshard and re-ingest already-indexed docs, distorting the 10x
    # factor with duplicate drops (ADVICE r13)
    prev = None
    for bi, n in enumerate((BATCH, 10 * BATCH), start=1):
        wh = whs[bases[min(1, len(bases) - 1)]]
        batch = docs_df(20_000_000 + bi * 20 * BATCH, n, dup_base=bases[0])
        t0 = time.time()
        c = ingest_micro_batch(batch, bi, str(wh), "2024-01-02")
        dt = time.time() - t0
        f = f"{dt / prev:6.2f}x" if prev else "      -"
        prev = dt
        print(f"{'ingest_vs_batch_size':28s} {n:9d} {dt:8.2f} {f}"
              f"   (kept {c['n_kept']}/{n})")

    # ---------- fold: 10x staged day ----------------------------------
    prev = None
    for n in (10_000, 100_000, 1_000_000):
        root = TMP / f"fold_{n}"
        shutil.rmtree(root, ignore_errors=True)
        per = n // 10
        for bi in range(10):  # a day of 10 staged micro-batches
            (spark.range(bi * per, bi * per + per)
             .select(F.col("id").alias("doc_id"),
                     _text(F.col("id")).alias("text"))
             .write.mode("overwrite")
             .parquet(f"{root}/corpus_live/day=2024-01-02/batch={bi}"))
        t0 = time.time()
        folded = fold_live_corpus(spark, str(root), "2024-01-02")
        dt = time.time() - t0
        f = f"{dt / prev:6.2f}x" if prev else "      -"
        prev = dt
        print(f"{'fold_live_corpus':28s} {n:9d} {dt:8.2f} {f}"
              f"   (folded {folded})")
        shutil.rmtree(root, ignore_errors=True)

    # ---------- compact: 10x corpus (reusing the ingest warehouses) --
    prev = None
    for b in bases:
        wh = whs[b]
        fold_live_corpus(spark, str(wh), "2024-01-02")  # guard: fold first
        t0 = time.time()
        r = compact_warehouse(spark, str(wh))
        dt = time.time() - t0
        f = f"{dt / prev:6.2f}x" if prev else "      -"
        prev = dt
        print(f"{'compact_warehouse':28s} {b:9d} {dt:8.2f} {f}"
              f"   (docs {r['n_docs']}, vecs {r['n_vectors']}, "
              f"retrained {r['retrained']})")
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
