"""Driver bench: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric", "value", "unit", "queries", "sf", "calibration"}.

Each query is forced end-to-end with a noop-sink write (full plan
execution, no driver collect). The headline set covers the reference
pipeline (all stateful stages + two encoders), count-based bars (boxcar
and 1087-tap FIR), the analysis-query surface, and the beyond-reference
dedup/similarity/text/search/relational operators.

The JSON also carries a per-run CALIBRATION block so each BENCH_r*.json
records its own box-contention estimate (r08: three same-code
measurements spread 20.5 / 24.87 / 28.41 s — the headline number alone
cannot distinguish a plan regression from a noisy neighbor):

* ``spark_fixed_sec`` — a warmed repeat of the fixed sf0.001 pass over
  every headline plan: tiny data, codegen already cached, so the wall
  time is almost pure scheduler/JVM overhead. Same work every round.
* ``cpu_fixed_sec`` — a fixed single-core Python loop, no Spark at all.

Compare ratios: a headline total that moved with both probes flat is a
plan regression; a total that moved together with the probes is the box.

r10 sharpens calibration into a NORMALIZER (r9 verdict #6: the r9
once-per-pass probe proved drift was box noise but under-corrected —
probe-time and query-time contention diverge when sampled apart): a
short FIXED Spark probe (sum over a 20M range, ~0.13 s quiet,
codegen-cached, scheduler+CPU bound like the queries) now runs
BETWEEN headline queries, inside every pass, so the probe samples the
same contention the adjacent queries saw. The emitted
``corrected_total`` / ``corrected_legacy15`` divide the raw totals by
``probe_ratio`` = max(1, median(interleaved probes) / PROBE_REF_SEC)
— one box-invariant number for the driver gate. The ratio is CLAMPED
at 1: contention only ever inflates timings, so correction only ever
deflates; on a quiet box (median at or below the pin — observed
quiet-run medians spread 0.060-0.070 from scheduler jitter) the
corrected numbers equal the raw ones instead of jittering upward.
PROBE_REF_SEC is pinned from interleaved quiet-box runs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "tick_pipeline_derivative",
    "tick_pipeline_multistream",
    "tick_pipeline_cpm",
    "bars_boxcar",
    "bars_fir",
    "q1_delta_stats",
    "q6_sigma_buckets",
    "q10_bar_audit",
    "text_token_stats",
    "text_simhash",
    "dedup_lsh_candidates",
    "sim_cosine_topk",
    "asof_join_events",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    # round 9 additions: the surface users actually hit hardest — the
    # reworked containment chain, retrieval scoring, the interval sweep,
    # and feature-space media dedup in its DEPLOYMENT posture (planes
    # sized to the corpus + skew cap armed; the gated registry entry is
    # the deliberately exhaustive oracle config instead)
    "dedup_decontaminate",
    "docs_bm25_topk",
    "events_session_concurrency",
    "media_dedup_features_deploy",
    # round 14 (r13 verdict #6): the 100x-scale tick plan — chunked
    # two-pass derivative instead of the single-partition global-order
    # window — benched so a regression in the scale path is visible
    # round-over-round, not just correctness-gated
    "tick_pipeline_derivative_twopass",
]

N_PASSES = 3  # per-query MIN over three well-separated passes

# fixed interleaved-probe unit cost on a QUIET box. Pinned from the
# probe's own median INSIDE full bench runs (r10 builder box, 57
# interleaved samples per run, raw legacy15 18.8-19.7 s = quiet-band
# evidence; two quiet runs read medians 0.0597 and 0.0696) — NOT from
# a standalone session: the same job reads ~2x slower in a
# freshly-started session (scheduler/codegen warmup state), which
# would deflate every ratio. The probe job below must not change
# without re-pinning this the same way.
PROBE_REF_SEC = 0.065


def _media_dedup_features_deploy(spark, sf_dir):
    """media_dedup_features in deployment posture: 16 planes (2^16
    buckets — sized ~log2(n/bucket) per the operator contract) and the
    max_bucket_size skew cap armed, vs the gated entry's exhaustive
    8-plane/uncapped oracle config."""
    from tickdatapipeline_spark.operators.multimodal import (
        media_near_duplicates,
        synth_media_from_documents,
    )
    from tickdatapipeline_spark.plans.beyond import (
        MEDIA_DEDUP_DIM,
        MEDIA_DEDUP_THRESHOLD,
        _docs,
    )

    return media_near_duplicates(
        synth_media_from_documents(_docs(spark, sf_dir)),
        threshold=MEDIA_DEDUP_THRESHOLD,
        planes=16,
        dim=MEDIA_DEDUP_DIM,
        max_bucket_size=256,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")

    import __spark_entry__ as E
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(E.queries())
    qs["media_dedup_features_deploy"] = _media_dedup_features_deploy

    def tiny_pass() -> float:
        """Every headline plan once at sf0.001; returns wall seconds."""
        t0 = time.time()
        for name in HEADLINE:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        return time.time() - t0

    # warm the JVM on the tiny sf — every headline query shape runs once
    # at sf0.001 so headline timings measure the plans, not first-call
    # codegen/JIT costs (worth 1-2 s per distinct encoder shape)...
    tiny_pass()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # ...then repeat the IDENTICAL tiny pass warmed: fixed work, cached
    # codegen, negligible data -> a per-run box-contention probe
    calib_spark = round(tiny_pass(), 3)
    t0 = time.time()
    acc = 0
    for i in range(20_000_000):
        acc += i
    calib_cpu = round(time.time() - t0, 3)

    # the flagship tick_pipeline_* queries are measured with the shared
    # ticks materialization DISABLED — their number is the true
    # end-to-end chain cost (parse -> expand -> hot loop -> encode). The
    # analytics/bar suite is then measured against a staged ticks_out
    # (warmed below), the deployment shape where it is a written table.
    #
    # Each query is timed over THREE full passes of the headline list
    # (back-to-back) and reported as the per-query MIN: a single-shot
    # timing is hostage to whatever else the host is running (the r05
    # driver bench read individual queries 4-7x their solo cost purely
    # from box contention), while the min of three well-separated runs
    # tracks the plan cost.
    from tickdatapipeline_spark.plans.common import set_ticks_cache

    def probe() -> float:
        """Fixed scheduler+CPU-bound Spark job (~0.13 s quiet):
        interleaved between headline queries so it samples the SAME
        contention window the adjacent query timings saw."""
        t0 = time.time()
        spark.range(20_000_000, numPartitions=8).selectExpr(
            "sum(id * 3) as s").collect()
        return time.time() - t0

    probe()  # warm the probe's own codegen before any timed use
    probes: list[float] = []
    staging_secs: list[float] = []

    def run_pass(timings: dict[str, float]) -> None:
        staged = False
        for name in HEADLINE:
            # ticks-cache is toggled PER NAME (r14): tick_pipeline_*
            # entries measure the true uncached chain wherever they sit
            # in the list (the twopass entry rides at the end so
            # legacy15 = HEADLINE[:15] stays cross-round comparable)
            if name.startswith("tick_pipeline"):
                set_ticks_cache(False)
            else:
                set_ticks_cache(True)
                if not staged:
                    # r15 (r14 verdict #9): the analytics/bar suite is
                    # measured against this session-scoped ticks
                    # materialization (the staged-table deployment
                    # posture); its cost is TIMED and reported as its
                    # own field below so the suite's numbers cannot be
                    # misread as end-to-end cost. Untimed-region
                    # semantics of every `queries` entry are unchanged.
                    t_st = time.time()
                    qs["q1_delta_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
                    staging_secs.append(round(time.time() - t_st, 3))
                    staged = True
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(dt, timings.get(name, dt))
            probes.append(probe())
        set_ticks_cache(True)

    timings: dict[str, float] = {}
    for _ in range(N_PASSES):
        run_pass(timings)

    total = round(sum(timings.values()), 3)
    legacy = round(sum(v for k, v in timings.items() if k in HEADLINE[:15]), 3)
    # fixed I/O probe: a full warm scan of a fixed sf0.1 parquet file.
    # Recorded for ATTRIBUTION only (the r12 A/B showed cross-round
    # drift is host-side; this lets a future drift be split CPU-vs-IO
    # without re-running the A/B harness) — it does not enter the
    # correction ratio.
    t0 = time.time()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "count(l_orderkey)").collect()
    calib_io = round(time.time() - t0, 3)
    probe_median = sorted(probes)[len(probes) // 2]
    # clamped at 1: contention only inflates timings, so correction
    # only deflates — a quiet box reports its raw numbers unchanged
    probe_ratio = round(max(1.0, probe_median / PROBE_REF_SEC), 4)
    print(json.dumps({
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # continuity with BENCH_r01-r08 (their 15-query headline set)
        "legacy15_total": legacy,
        # box-invariant gate numbers: raw totals divided by how much
        # slower the interleaved fixed probe ran vs the quiet-box pin
        "corrected_total": round(total / probe_ratio, 3),
        "corrected_legacy15": round(legacy / probe_ratio, 3),
        # r15: per-pass cost of staging the shared ticks materialization
        # the analytics/bar suite is measured against (first entry pays
        # the pipeline + persist; later passes are cache-hot) — reported
        # so the staged-table posture is explicit in every BENCH
        # artifact; no `queries` entry changes meaning
        "analytics_staging_sec_per_pass": staging_secs,
        "calibration": {
            "spark_fixed_sec": calib_spark,
            "cpu_fixed_sec": calib_cpu,
            "io_fixed_sec": calib_io,
            "passes": N_PASSES,
            "probe_ref_sec": PROBE_REF_SEC,
            "probe_median_sec": round(probe_median, 4),
            "probe_ratio": probe_ratio,
            "n_probes": len(probes),
        },
    }))


if __name__ == "__main__":
    main()
