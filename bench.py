"""Driver bench: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop-sink write (full plan
execution, no driver collect). The headline set covers the reference
pipeline (all stateful stages + two encoders), count-based bars (boxcar
and 1087-tap FIR), the analysis-query surface, and the beyond-reference
dedup/similarity/text/relational operators.
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")

    import __spark_entry__ as E
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # warm the JVM on the tiny sf — every headline query shape runs once
    # at sf0.001 so headline timings measure the plans, not first-call
    # codegen/JIT costs (worth 1-2 s per distinct encoder shape)
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # the flagship tick_pipeline_* queries are measured with the shared
    # ticks materialization DISABLED — their number is the true
    # end-to-end chain cost (parse -> expand -> hot loop -> encode). The
    # analytics/bar suite is then measured against a staged ticks_out
    # (warmed below), the deployment shape where it is a written table.
    #
    # Each query is timed over TWO full passes of the headline list
    # (back-to-back) and reported as the per-query MIN: a single-shot
    # timing is hostage to whatever else the host is running (the r05
    # driver bench read individual queries 4-7x their solo cost purely
    # from box contention), while the min of two well-separated runs
    # tracks the plan cost. ~30 s extra at sf0.1 buys a signal that can
    # tell a real regression from a noisy neighbor.
    from tickdatapipeline_spark.plans.common import set_ticks_cache

    def run_pass(timings: dict[str, float]) -> None:
        staged = False
        for name in HEADLINE:
            if not name.startswith("tick_pipeline") and not staged:
                set_ticks_cache(True)
                qs["q1_delta_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
                staged = True
            if not staged:
                set_ticks_cache(False)
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(dt, timings.get(name, dt))
        set_ticks_cache(True)

    timings: dict[str, float] = {}
    run_pass(timings)
    run_pass(timings)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
