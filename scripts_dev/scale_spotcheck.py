"""Larger-SF scaling spot-check for the chunked paths (r14 verdict #7).

At sf0.1 every headline query is scheduler/plan-overhead-bound: the
driver's 8-vs-32-core ratios all read ~1.0, so wall clock cannot confirm
(or deny) the §2 parallelism work. This probe synthesizes a 10x events
table (1M contiguous event_ids — the invariant the chunked sources
guard) and a 10x documents table (replica texts perturbed with a
replica-specific token so near-dup structure does not blow up
quadratically), then solo-times

  * tick_pipeline_derivative_twopass  (the chunked tick chain)
  * dedup_decontaminate               (the shared-MinHash split)

at 32 and at 8 cores (separate subprocesses via SPARK_GRAFT_CPUS, same
methodology as bench.py: noop sink, min of N passes) and reports the
32-core speedup ratio plus the max concurrent task count observed per
query from the Spark event log — the direct evidence that the chunked
plans actually fan out when the data is big enough to amortize stage
overhead.

Usage: python scripts_dev/scale_spotcheck.py [factor=10] [out.json]
Writes the JSON to stdout and (optionally) the given path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, ".")

BIG_DIR = "/tmp/sf_spotcheck"
NAMES = ["tick_pipeline_derivative_twopass", "dedup_decontaminate"]


def build_fixture(factor: int) -> None:
    import duckdb

    Path(BIG_DIR).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    n_ev = con.sql(
        f"SELECT count(*) FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    n_doc = con.sql(
        f"SELECT count(*) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    # events: event_id stays contiguous 0-based (the density contract);
    # every other column replicates with a deterministic shift
    con.sql(f"""
        COPY (
          SELECT e.event_id + r.k * {n_ev} AS event_id,
                 e.ts + INTERVAL (r.k) DAY AS ts,
                 e.user_id + r.k * 1000000 AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{src}/events.parquet') e,
               (SELECT unnest(range({factor})) AS k) r
          ORDER BY event_id
        ) TO '{BIG_DIR}/events.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
        COPY (
          SELECT d.doc_id + r.k * {n_doc} AS doc_id,
                 CASE WHEN r.k = 0 THEN d.text
                      ELSE d.text || ' replica' || r.k END AS text,
                 d.lang, d.source,
                 CAST(length(CASE WHEN r.k = 0 THEN d.text
                      ELSE d.text || ' replica' || r.k END) AS BIGINT)
                     AS n_chars
          FROM read_parquet('{src}/documents.parquet') d,
               (SELECT unnest(range({factor})) AS k) r
          ORDER BY doc_id
        ) TO '{BIG_DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    # tables the registry helpers may touch while building these queries
    for t in ("region", "nation"):
        con.sql(f"""
            COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
            TO '{BIG_DIR}/{t}.parquet' (FORMAT PARQUET)
        """)


RUNNER = r"""
import json, os, sys, time, shutil
from pathlib import Path
sys.path.insert(0, ".")
evdir = sys.argv[3]
shutil.rmtree(evdir, ignore_errors=True); os.makedirs(evdir)
from pyspark.sql import SparkSession
cpus = os.environ["SPARK_GRAFT_CPUS"]
SparkSession.builder.master(f"local[{cpus}]").config(
    "spark.eventLog.enabled", "true").config(
    "spark.eventLog.dir", evdir).getOrCreate()
import __spark_entry__ as E
from tickdatapipeline_spark.session import get_spark
from tickdatapipeline_spark.plans.common import set_ticks_cache
spark = get_spark("spotcheck")
spark.sparkContext.setLogLevel("ERROR")
qs = dict(E.queries())
name, sf_dir = sys.argv[1], sys.argv[2]
set_ticks_cache(False)
qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
best = None
for _ in range(2):
    t0 = time.time()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = min(best or 9e9, time.time() - t0)
print(json.dumps({"name": name, "cpus": cpus, "sec": round(best, 3)}))
spark.stop()
"""


def _event_lines(f: Path):
    if f.name.endswith(".zstd"):
        import subprocess as sp

        out = sp.run(["zstd", "-dc", str(f)], capture_output=True, text=True)
        yield from out.stdout.splitlines()
    else:
        yield from open(f, errors="replace")


def max_concurrency(evdir: str) -> int:
    """Max number of simultaneously running tasks across the app."""
    points = []
    for f in Path(evdir).glob("**/*"):
        if not f.is_file():
            continue
        for line in _event_lines(f):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            if ev.get("Event") == "SparkListenerTaskStart":
                ti = ev["Task Info"]
                points.append((ti["Launch Time"], 1))
            elif ev.get("Event") == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                points.append((ti["Finish Time"], -1))
    cur = peak = 0
    for _, d in sorted(points):
        cur += d
        peak = max(peak, cur)
    return peak


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    if not Path(f"{BIG_DIR}/events.parquet").exists():
        build_fixture(factor)
    results: dict = {"factor": factor, "base_sf": 0.1, "queries": {}}
    for name in NAMES:
        entry: dict = {}
        for cpus in ("32", "8"):
            evdir = f"/tmp/spotcheck-ev-{name}-{cpus}"
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            p = subprocess.run(
                [sys.executable, "-c", RUNNER, name, BIG_DIR, evdir],
                capture_output=True, text=True, env=env,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            d = json.loads(line)
            entry[f"sec_c{cpus}"] = d["sec"]
            entry[f"max_concurrent_tasks_c{cpus}"] = max_concurrency(evdir)
        entry["speedup_32_over_8"] = round(
            entry["sec_c8"] / entry["sec_c32"], 3)
        results["queries"][name] = entry
        print(json.dumps({name: entry}), flush=True)
    print(json.dumps(results))
    if out_path:
        Path(out_path).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
