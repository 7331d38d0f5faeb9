"""Second bench tier: the heaviest headline queries at ~10x sf0.1.

Every plan constant (grid sizes, broadcast thresholds, cache pins,
window-vs-twopass crossovers) is normally validated at sf0.1 (~600 K
rows); this tier re-times the heavy queries at 10x that, catching
constants that only bite past the toy scale — the DISK_ONLY-OOM class
of bug. Recorded in PERF.md each round next to the sf0.1 numbers with
the per-query scaling factor (wall_10x / wall_1x; linear work with
amortized overhead keeps it <= ~10, comfortably <= ~13 = "1.3x
linear" per the round-6 verdict gate).

Data: /tmp/spark_graft_tier2 — 10x-replicated sf0.1 with semantics
preserved: events keep contiguous 0-based event_ids (copy-offset by the
exact base count, so the closed-form per-stream line_no still holds);
documents get per-copy token perturbation (copies share no shingles, so
the exhaustive gated LSH stays linear-density instead of quadratic
worst-case — the worst-case-density probe is scripts_dev/
dedup_scale_probe.py); embeddings copy-offset their ids. Built once,
reused across runs (delete the dir to rebuild).

Runs each query min-of-2 at BOTH tiers in one session and prints one
JSON line {"queries": {name: {"sf01": s, "tier2": s, "factor": x}}}.

Usage: python scripts_dev/bench_tier2.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
TIER2 = "/tmp/spark_graft_tier2"
COPIES = 10
DOC_OFFSET = 10_000_000
EMB_OFFSET = 10_000_000

DEFAULT_QUERIES = [
    "tick_pipeline_derivative",
    "tick_pipeline_derivative_twopass",
    "tick_pipeline_multistream_twopass",
    "tick_pipeline_cpm",
    "bars_fir",
    "dedup_lsh_candidates",
    "sim_cosine_topk",
    "dedup_pair_measures",
    "sim_top_component",
]


def build_tier2(spark) -> None:
    from pyspark.sql import functions as F

    out = Path(TIER2)
    if (out / "_READY").exists():
        return
    copies = F.broadcast(spark.range(COPIES).select(F.col("id").alias("copy")))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * n_events).alias("event_id"),
        *[c for c in ev.columns if c != "event_id"],
    ).repartition(32).write.mode("overwrite").parquet(f"{TIER2}/events.parquet")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * DOC_OFFSET).alias("doc_id"),
        F.regexp_replace(
            F.col("text"), r"([A-Za-z0-9]+)",
            F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("$1")),
        ).alias("text"),
        "lang", "source", "n_chars",  # seed column for the media fixture
    ).repartition(32).write.mode("overwrite").parquet(f"{TIER2}/documents.parquet")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idc = "emb_id" if "emb_id" in emb.columns else emb.columns[0]
    emb.crossJoin(copies).select(
        (F.col(idc) + F.col("copy") * EMB_OFFSET).alias(idc),
        *[c for c in emb.columns if c != idc],
    ).repartition(32).write.mode("overwrite").parquet(f"{TIER2}/embeddings.parquet")
    (out / "_READY").touch()


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES

    import __spark_entry__ as E
    from tickdatapipeline_spark.plans.common import set_ticks_cache
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("bench-tier2")
    spark.sparkContext.setLogLevel("ERROR")
    build_tier2(spark)
    qs = E.queries()
    set_ticks_cache(False)  # true end-to-end chain cost at both tiers

    # warm codegen/JIT per query shape on the tiny sf
    for n in names:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for tier, d in (("sf01", SF_DIR), ("tier2", TIER2)):
        for _pass in range(2):
            for n in names:
                t0 = time.time()
                qs[n](spark, d).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                cur = results.setdefault(n, {})
                cur[tier] = min(dt, cur.get(tier, dt))
    for n, r in results.items():
        r["factor"] = round(r["tier2"] / r["sf01"], 2)
    print(json.dumps({"metric": "tier2_scaling", "copies": COPIES,
                      "queries": results}))
    set_ticks_cache(True)
    spark.stop()


if __name__ == "__main__":
    main()
