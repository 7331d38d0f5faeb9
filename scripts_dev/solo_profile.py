"""Solo per-query profiler (r14 optimization round).

Runs one or more headline/registry queries in isolation with the noop
sink (guide §1.4), event-logging enabled, and prints:

* min-of-N wall seconds per query (N=3 by default);
* a per-stage breakdown parsed from the Spark event log (stage name,
  submitted->completed wall ms, task count, shuffle read/write bytes),
  so the expensive stage of a multi-job query is attributable without
  the (disabled) UI — guide §1.1/§7.1;
* optionally the formatted physical plan to a file (--plans DIR writes
  plans/r14-style <name>_before.txt artifacts).

Usage:
  python scripts_dev/solo_profile.py [--sf DIR] [--passes N]
      [--plans OUTDIR] [--stages] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="write <name>_before.txt formatted plans here")
    ap.add_argument("--plans-suffix", default="_before")
    ap.add_argument("--stages", action="store_true",
                    help="print per-stage breakdown from the event log")
    ap.add_argument("--cache-ticks", action="store_true",
                    help="leave the shared ticks materialization ON "
                         "(bench measures tick_pipeline_* with it OFF)")
    args = ap.parse_args()

    evdir = "/tmp/spark-events-solo"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tickdatapipeline_spark.session import get_spark

    if args.stages:
        # get_spark's builder is config-frozen after getOrCreate, so seed
        # the event-log confs through a builder of our own first
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        SparkSession.builder.master(f"local[{cpus}]").config(
            "spark.eventLog.enabled", "true"
        ).config("spark.eventLog.dir", evdir).config(
            "spark.eventLog.compress", "false"
        ).config("spark.eventLog.rolling.enabled", "false").getOrCreate()
    spark = get_spark("solo-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from tickdatapipeline_spark.plans.common import set_ticks_cache

    qs = dict(E.queries())
    try:
        from bench import _media_dedup_features_deploy

        qs["media_dedup_features_deploy"] = _media_dedup_features_deploy
    except Exception:
        pass

    # warm codegen/JIT on the tiny sf once per query shape
    for name in args.names:
        set_ticks_cache(False if name.startswith("tick_pipeline") else True)
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite").save()

    results = {}
    spans: dict[str, tuple[float, float]] = {}
    for name in args.names:
        set_ticks_cache(
            (False if name.startswith("tick_pipeline") else True)
            or args.cache_ticks
        )
        if not name.startswith("tick_pipeline"):
            # stage the shared ticks lineage like bench.py does, so
            # analytics-suite queries measure their own work
            qs["q1_delta_stats"](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
        best = None
        t_first = time.time()
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"solo:{name}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spans[name] = (t_first, time.time())
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            p = Path(args.plans) / f"{name}{args.plans_suffix}.txt"
            p.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    print(json.dumps({"sf": args.sf, "passes": args.passes, "solo_min": results}))

    if args.stages:
        spark.stop()
        _print_stages(evdir, spans)


def _print_stages(evdir: str, spans: dict[str, tuple[float, float]]) -> None:
    stages = {}  # id -> dict
    props = {}   # job id -> description
    stage_job = {}
    for f in Path(evdir).glob("**/*"):
        if not f.is_file():
            continue
        for line in f.open(errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "")
                props[ev["Job ID"]] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = ev["Job ID"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:70],
                    "ms": (com - sub) if sub and com else None,
                    "tasks": si.get("Number of Tasks"),
                    "desc": props.get(stage_job.get(sid), ""),
                    "sub": sub,
                }
    by_desc: dict[str, list] = {}
    for sid, s in sorted(stages.items()):
        by_desc.setdefault(s["desc"], []).append((sid, s))
    for desc, rows in by_desc.items():
        if not desc.startswith("solo:"):
            continue
        total = sum(r["ms"] or 0 for _, r in rows)
        print(f"\n=== {desc} — {len(rows)} stages, {total} ms summed "
              f"(all passes; wall overlaps not deduped) ===")
        for sid, r in sorted(rows, key=lambda x: -(x[1]["ms"] or 0))[:18]:
            print(f"  stage {sid:>4}  {r['ms'] or 0:>7} ms  "
                  f"{r['tasks']:>4} tasks  {r['name']}")


if __name__ == "__main__":
    main()
